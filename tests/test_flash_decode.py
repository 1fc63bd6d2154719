"""Fused flash-decode attention kernel parity (interpret mode on CPU;
the real lowering is exercised on hardware by bench.py's decode lines)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssak_tpu.models import layers as L
from ssak_tpu.ops.flash_decode import flash_decode_attention


def _rand_qkv(rng, B, H, Dh, T):
    q = jnp.asarray(rng.randn(B, 1, H, Dh).astype(np.float32)) * 0.5
    kT = jnp.asarray(rng.randn(B, H, Dh, T).astype(np.float32)) * 0.5
    vT = jnp.asarray(rng.randn(B, H, Dh, T).astype(np.float32)) * 0.5
    return q, kT, vT


def test_kernel_matches_xla_bf16():
    rng = np.random.RandomState(0)
    B, H, Dh, T = 2, 3, 64, 160
    q, kT, vT = _rand_qkv(rng, B, H, Dh, T)
    lo = jnp.asarray([0, 5], jnp.int32)
    hi = jnp.asarray([T - 1, 100], jnp.int32)
    scale = Dh ** -0.5
    t = jnp.arange(T)
    mask = ((t[None, :] >= lo[:, None]) & (t[None, :] <= hi[:, None]))[:, None, None, :]
    ref = L.decode_attention(q, kT.astype(jnp.bfloat16), vT.astype(jnp.bfloat16), mask=mask, dtype=jnp.bfloat16)
    got = flash_decode_attention(
        q[:, 0].astype(jnp.bfloat16) * jnp.bfloat16(scale),
        kT.astype(jnp.bfloat16), vT.astype(jnp.bfloat16), lo, hi, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref[:, 0], np.float32), atol=2e-2)


def test_kernel_matches_xla_int8():
    rng = np.random.RandomState(1)
    B, H, Dh, T = 2, 2, 64, 128
    q, kT, vT = _rand_qkv(rng, B, H, Dh, T)
    kv8 = L.quantize_decode_kv(kT, vT)
    lo = jnp.asarray([0, 0], jnp.int32)
    hi = jnp.asarray([T - 1, 64], jnp.int32)
    scale = Dh ** -0.5
    t = jnp.arange(T)
    mask = ((t[None, :] >= lo[:, None]) & (t[None, :] <= hi[:, None]))[:, None, None, :]
    ref = L.self_attention_int8(q, kv8, mask=mask, dtype=jnp.float32)
    got = flash_decode_attention(
        q[:, 0].astype(jnp.bfloat16) * jnp.bfloat16(scale),
        kv8["k8"], kv8["v8"], lo, hi, kv8["ks"], kv8["vs"], interpret=True,
    )
    # int8 reference quantizes q AND probs; the kernel keeps both exact —
    # compare against the FULL-precision oracle at int8 noise tolerance
    full = L.decode_attention(q, kT, vT, mask=mask, dtype=jnp.float32)
    err_kernel = float(jnp.max(jnp.abs(got - full[:, 0])))
    err_ref = float(jnp.max(jnp.abs(ref - full)))
    assert err_kernel < 0.05 * float(jnp.max(jnp.abs(full))) + 1e-3
    assert err_kernel <= err_ref + 1e-3  # kernel is at least as accurate


def test_bounded_router_matches_mask_paths():
    """decode_attention_bounded (XLA fallback on CPU) == explicit-mask
    attention for both bf16 and int8 KV."""
    rng = np.random.RandomState(2)
    B, H, Dh, T = 3, 2, 32, 48
    q, kT, vT = _rand_qkv(rng, B, H, Dh, T)
    lo = jnp.asarray([0, 3, 10], jnp.int32)
    hi = jnp.asarray([T - 1, 30, 20], jnp.int32)
    t = jnp.arange(T)
    mask = ((t[None, :] >= lo[:, None]) & (t[None, :] <= hi[:, None]))[:, None, None, :]
    ref = L.decode_attention(q, kT, vT, mask=mask, dtype=jnp.float32)
    got = L.decode_attention_bounded(q, {"k": kT, "v": vT}, lo, hi, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    kv8 = L.quantize_decode_kv(kT, vT)
    ref8 = L.self_attention_int8(q, kv8, mask=mask, dtype=jnp.float32)
    got8 = L.decode_attention_bounded(q, kv8, lo, hi, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got8), np.asarray(ref8), atol=1e-5)


def test_scalar_bounds_broadcast():
    """Scalar lo/hi (the greedy pos bound) broadcast across the batch."""
    rng = np.random.RandomState(3)
    B, H, Dh, T = 2, 2, 16, 24
    q, kT, vT = _rand_qkv(rng, B, H, Dh, T)
    got = L.decode_attention_bounded(q, {"k": kT, "v": vT}, 0, 10, dtype=jnp.float32)
    mask = (jnp.arange(T) <= 10)[None, None, None, :]
    ref = L.decode_attention(q, kT, vT, mask=mask, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
