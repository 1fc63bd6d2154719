"""Pallas CTC kernel numerics: interpret mode vs the scan reference (exact)
— the TPU-compiled path is exercised by bench.py on hardware."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssak_tpu.ops.ctc import ctc_loss
from ssak_tpu.ops.ctc_pallas import _fwd_impl


def _case(seed, B=3, T=24, V=7, U=6):
    rng = np.random.RandomState(seed)
    lp = jax.nn.log_softmax(jnp.asarray(rng.randn(B, T, V).astype(np.float32)), -1)
    labels = jnp.asarray(rng.randint(1, V, (B, U)), jnp.int32)
    lab_len = jnp.asarray(rng.randint(1, U + 1, (B,)), jnp.int32)
    ll = jnp.asarray(rng.randint(U + 4, T + 1, (B,)), jnp.int32)
    return lp, ll, labels, lab_len


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_interpret_matches_scan(seed):
    lp, ll, labels, lab_len = _case(seed)
    loss, grad = _fwd_impl(lp, ll, labels, lab_len, 0, True, interpret=True)
    ref = ctc_loss(lp, ll, labels, lab_len, reduction="none")
    np.testing.assert_allclose(np.asarray(loss), np.asarray(ref), atol=1e-4)
    g_ref = jax.grad(lambda x: ctc_loss(x, ll, labels, lab_len, reduction="sum"))(lp)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(g_ref), atol=1e-4)


def test_infeasible_zeroed():
    lp = jax.nn.log_softmax(jnp.zeros((1, 3, 5)), -1)
    loss, grad = _fwd_impl(lp, jnp.asarray([3]), jnp.asarray([[1, 2, 3, 4]]), jnp.asarray([4]), 0, True, interpret=True)
    assert float(loss[0]) == 0.0
    assert float(jnp.abs(grad).sum()) == 0.0


def test_fast_dispatch_cpu_falls_back():
    from ssak_tpu.ops.ctc_pallas import ctc_loss_fast

    lp, ll, labels, lab_len = _case(3)
    a = float(ctc_loss_fast(lp, ll, labels, lab_len, reduction="sum"))
    b = float(ctc_loss(lp, ll, labels, lab_len, reduction="sum"))
    assert abs(a - b) < 1e-4


def test_int8_matmul_interpret_parity():
    """Fused dequant-matmul kernel (ops.int8_matmul) vs XLA dequant, incl.
    the M-pad path and an uneven final N block."""
    from ssak_tpu.models.quant import dequantize_kernel, quantize_kernel
    from ssak_tpu.ops.int8_matmul import matmul_int8

    rng = np.random.RandomState(0)
    for (M, K, N) in [(24, 256, 256), (4, 256, 640), (17, 512, 300)]:
        w = rng.randn(K, N).astype(np.float32) * 0.05
        qd = quantize_kernel(w, bits=8)
        x = (rng.randn(M, K) * 0.3).astype(np.float32)
        y = matmul_int8(jnp.asarray(x), jnp.asarray(qd["q8"]), jnp.asarray(qd["scale"]), interpret=True)
        wq = dequantize_kernel({k: jnp.asarray(v) for k, v in qd.items()}, jnp.bfloat16)
        ref = jnp.matmul(jnp.asarray(x).astype(jnp.bfloat16), wq, preferred_element_type=jnp.float32)
        err = float(jnp.max(jnp.abs(y - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
        assert err < 2e-2, ((M, K, N), err)


def test_int4_matmul_interpret_parity():
    """Fused int4 unpack-dequantize-matmul (ops.int8_matmul.matmul_int4) vs
    the XLA dequantize_kernel path: identical blockwise-scale semantics,
    including M padding and an uneven final N block."""
    from ssak_tpu.models.quant import dequantize_kernel, quantize_kernel
    from ssak_tpu.ops.int8_matmul import matmul_int4

    rng = np.random.RandomState(1)
    for (M, K, N) in [(24, 256, 256), (4, 1280, 640), (17, 512, 300)]:
        w = rng.randn(K, N).astype(np.float32) * 0.05
        qd = quantize_kernel(w, bits=4)
        assert "q4" in qd, (K, N)
        x = (rng.randn(M, K) * 0.3).astype(np.float32)
        y = matmul_int4(jnp.asarray(x), jnp.asarray(qd["q4"]), jnp.asarray(qd["scale"]), interpret=True)
        wq = dequantize_kernel({k: jnp.asarray(v) for k, v in qd.items()}, jnp.bfloat16)
        ref = jnp.matmul(jnp.asarray(x).astype(jnp.bfloat16), wq, preferred_element_type=jnp.float32)
        err = float(jnp.max(jnp.abs(y - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
        assert err < 2e-2, ((M, K, N), err)
