"""Shared neural net layers: pure functions over param pytrees.

ssak_tpu models are plain pytrees of jnp arrays + pure apply functions —
no Module framework. This keeps the whole model jit/pjit-transparent, makes
HF checkpoint import a pure key-mapping problem, and lets sharding rules be
written as regexes over param paths (ssak_tpu.parallel.sharding).

Conventions: activations (B, T, D); attention heads folded as (B, T, H, Dh);
matmuls run in `dtype` (bfloat16 on TPU) with float32 accumulation
(preferred_element_type) so the MXU is used at full rate.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np


def layer_norm(x, params, eps: float = 1e-5):
    """Statistics and affine in float32, output in the input dtype — the
    residual stream stays bf16 (half the HBM traffic) without bf16 LN
    statistics."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * params["scale"] + params["bias"]).astype(x.dtype)


def group_norm(x, params, num_groups: int, eps: float = 1e-5):
    """x: (B, T, C). GroupNorm with torch semantics: statistics are taken
    over each channel group AND the time axis (all non-batch dims).
    Float32 statistics, output in the input dtype."""
    B, T, C = x.shape
    g = x.reshape(B, T, num_groups, C // num_groups).astype(jnp.float32)
    mu = jnp.mean(g, axis=(1, 3), keepdims=True)
    var = jnp.var(g, axis=(1, 3), keepdims=True)
    g = (g - mu) * jax.lax.rsqrt(var + eps)
    return (g.reshape(x.shape) * params["scale"] + params["bias"]).astype(x.dtype)


def dense(x, params, dtype=None):
    """Linear layer; transparently applies a LoRA adapter when the param
    dict carries lora_A/lora_B (y += scale * (x @ A) @ B) — the PEFT-path
    capability of reference whisper_train.py:374-407 without a separate
    module system.

    When dtype is given, the matmul runs AND returns in that dtype
    (f32 MXU accumulation via preferred_element_type); activations between
    ops stay bf16 — matmul-output round-trips through f32 would double the
    HBM traffic of every layer. Cast to f32 explicitly at numerically
    sensitive points (logits before softmax/log_softmax)."""
    w = params["kernel"]
    y = None
    if isinstance(w, dict):  # int8/int4 weight-only quantized (models.quant)
        from ssak_tpu.ops.int8_matmul import (
            int4_dense_supported,
            int8_dense_supported,
            matmul_int4,
            matmul_int8,
        )

        if "q8" in w and int8_dense_supported(x, w["q8"]):
            # decode-shaped activation on TPU: fused dequant-matmul Pallas
            # kernel streams int8 weights (the XLA dequant would be hoisted
            # out of the decode scan as a full bf16 copy — PERF.md)
            if dtype is not None:
                x = x.astype(dtype)
            xq = x.reshape(-1, x.shape[-1])
            y = matmul_int8(xq, w["q8"], w["scale"]).reshape(*x.shape[:-1], -1)
        elif "q4" in w and int4_dense_supported(x, w["q4"]):
            # int4 decode path: same streaming argument at 0.5 byte/param
            if dtype is not None:
                x = x.astype(dtype)
            xq = x.reshape(-1, x.shape[-1])
            y = matmul_int4(xq, w["q4"], w["scale"]).reshape(*x.shape[:-1], -1)
        else:
            from ssak_tpu.models.quant import dequantize_kernel

            w = dequantize_kernel(w, dtype if dtype is not None else x.dtype)
    if y is None:
        if dtype is not None:
            x = x.astype(dtype)
            w = w.astype(dtype)
        y = jnp.matmul(x, w, preferred_element_type=jnp.float32)
    out_dtype = x.dtype
    if "lora_A" in params:
        a = params["lora_A"].astype(x.dtype)
        b = params["lora_B"].astype(x.dtype)
        scale = params.get("lora_scale", 1.0)
        y = y + scale * jnp.matmul(jnp.matmul(x, a, preferred_element_type=jnp.float32), b, preferred_element_type=jnp.float32)
    if "bias" in params and params["bias"] is not None:
        y = y + params["bias"]
    return y.astype(out_dtype)


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


def sinusoid_position_embedding(length: int, channels: int, max_timescale: float = 10000.0) -> np.ndarray:
    """Whisper-style sinusoids (length, channels): [sin | cos] halves."""
    assert channels % 2 == 0
    log_timescale_increment = math.log(max_timescale) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1).astype(np.float32)


def split_heads(x, n_heads: int):
    B, T, D = x.shape
    return x.reshape(B, T, n_heads, D // n_heads)


def merge_heads(x):
    B, T, H, Dh = x.shape
    return x.reshape(B, T, H * Dh)


def attention(
    q, k, v,
    mask=None,
    dtype=jnp.bfloat16,
    scale=None,
):
    """q: (B, Tq, H, Dh), k/v: (B, Tk, H, Dh). mask: broadcastable to
    (B, H, Tq, Tk), True = attend. Softmax in float32."""
    Dh = q.shape[-1]
    scale = scale if scale is not None else Dh ** -0.5
    qh = (q.astype(dtype) * jnp.asarray(scale, dtype))
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, k.astype(dtype), preferred_element_type=jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)  # f32 (matmul accumulation dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(dtype), v.astype(dtype), preferred_element_type=jnp.float32)
    return out.astype(dtype)


def decode_attention(q, kT, vT, mask=None, dtype=jnp.bfloat16, scale=None):
    """Attention against DECODE-CACHE-layout K/V.

    q: (B, Tq, H, Dh); kT/vT: (B, H, Dh, Tk) — heads split, time minor.
    mask: broadcastable to (B, H, Tq, Tk), True = attend.

    Why this layout: a persistent (B, T, H, Dh) cache tiles its (H, Dh)
    minor dims to (8k, 128k) — 2.4x HBM padding at whisper-large's
    (20, 64) — and a merged (B, T, D) cache is pad-free but must be
    reshaped to heads EVERY decode step, which XLA materializes as a
    padded copy (measured ~86 ms/step of pure copy traffic at B=32
    large-v3). (B, H, Dh, Tk) pads only Tk to the 128-lane tile (~2%)
    and is already the dot operand layout for both einsums below
    (QK^T contracts Dh = second-minor; PV contracts Tk = minor), so the
    cache streams straight into the MXU with no per-step copy."""
    Dh = q.shape[-1]
    scale = scale if scale is not None else Dh ** -0.5
    qh = q.astype(dtype) * jnp.asarray(scale, dtype)
    logits = jnp.einsum("bqhd,bhdt->bhqt", qh, kT.astype(dtype), preferred_element_type=jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqt,bhdt->bqhd", probs.astype(dtype), vT.astype(dtype), preferred_element_type=jnp.float32)
    return out.astype(dtype)


def to_decode_kv(x, n_heads: int):
    """(B, T, D) merged K or V -> (B, H, Dh, T) decode-cache layout."""
    return jnp.transpose(split_heads(x, n_heads), (0, 2, 3, 1))


def quantize_decode_kv(kT, vT):
    """Decode-layout K/V (B, H, Dh, T) -> int8 dict with PER-POSITION
    scales — the ONE int8 KV format (same as the self-attention decode
    cache, update_int8_cache), so cross and self int8 attention share one
    algebra and one fused kernel (ops/flash_decode).

    Autoregressive decode re-reads the ENTIRE cross-attention K/V every
    token step (large-v3 at B=24: 5.9 GB/step — the dominant HBM term,
    bigger than the 1.6 GB weight read; PERF.md). Storing it int8 halves
    that. Per-position (b, h, t) scales fold exactly: ks_t into logits,
    vs_t into the probs before the PV contraction (which sums over t)."""
    k8, ks = _quant_per_position(kT)
    v8, vs = _quant_per_position(vT)
    return {"k8": k8, "ks": ks, "v8": v8, "vs": vs}


def _quant_per_position(x):
    """(B, H, Dh, T) -> int8 values + per-(b, h, t) scales. Scales are
    stored bf16: at large-v3 B=48 the f32 (B, H, 1, T) scale planes cost
    ~0.7 GB across 32 layers — the difference between fitting double the
    decode batch and OOM — and a bf16 scale adds ~0.4% relative error on
    top of int8's ~0.8%."""
    s = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=2, keepdims=True), 1e-8) / 127.0
    x8 = jnp.clip(jnp.rint(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return x8, s.astype(jnp.bfloat16)


def decode_attention_int8(q, kv8, mask=None, dtype=jnp.bfloat16, scale=None):
    """decode_attention against int8 K/V with per-position scales
    (quantize_decode_kv / init_int8_cache format). Identical math to
    self_attention_int8 — kept as the named cross-attention entry."""
    return self_attention_int8(q, kv8, mask=mask, dtype=dtype, scale=scale)


def init_int8_cache(batch: int, n_heads: int, head_dim: int, length: int):
    """Empty int8 self-attention decode cache with PER-POSITION scales
    (each step's k/v get their own (batch, head) scale at write time —
    the only scale axis that keeps both attention contractions exact)."""
    return {
        "k8": jnp.zeros((batch, n_heads, head_dim, length), jnp.int8),
        "ks": jnp.zeros((batch, n_heads, 1, length), jnp.bfloat16),
        "v8": jnp.zeros((batch, n_heads, head_dim, length), jnp.int8),
        "vs": jnp.zeros((batch, n_heads, 1, length), jnp.bfloat16),
    }


def update_int8_cache(cache, kT_new, vT_new, index):
    """Quantize this step's k/v (B, H, Dh, Tnew) per (batch, head) and
    write values + scales at time position `index`."""
    k8n, ksn = _quant_per_position(kT_new)
    v8n, vsn = _quant_per_position(vT_new)
    at = (0, 0, 0, index)
    return {
        "k8": jax.lax.dynamic_update_slice(cache["k8"], k8n, at),
        "ks": jax.lax.dynamic_update_slice(cache["ks"], ksn, at),
        "v8": jax.lax.dynamic_update_slice(cache["v8"], v8n, at),
        "vs": jax.lax.dynamic_update_slice(cache["vs"], vsn, at),
    }


def self_attention_int8(q, cache, mask=None, dtype=jnp.bfloat16, scale=None):
    """Decode self-attention over an int8 cache with per-position scales.

    logits_t = attn_scale * qs * ks_t * (q8 . k8_t)    (ks_t factors per t)
    out_d    = ps * sum_t p8_t v8_td                   (vs_t folded into
    the probs BEFORE their quantization — it cannot factor out of the
    contraction over t, but probs*vs is still a per-(b,h,t) elementwise)."""
    Dh = q.shape[-1]
    scale = scale if scale is not None else Dh ** -0.5
    qf = q.astype(jnp.float32)
    qs = jnp.maximum(jnp.max(jnp.abs(qf), axis=-1, keepdims=True), 1e-8) / 127.0  # (B,Tq,H,1)
    q8 = jnp.clip(jnp.rint(qf / qs), -127, 127).astype(jnp.int8)
    dots = jnp.einsum("bqhd,bhdt->bhqt", q8, cache["k8"], preferred_element_type=jnp.int32)
    mult = (scale * qs.transpose(0, 2, 1, 3)) * cache["ks"]  # (B,H,Tq,1)x(B,H,1,T)
    logits = dots.astype(jnp.float32) * mult
    if mask is not None:
        logits = jnp.where(mask, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    pv = probs * cache["vs"]  # fold per-position V scale
    ps = jnp.maximum(jnp.max(pv, axis=-1, keepdims=True), 1e-12) / 127.0
    p8 = jnp.clip(jnp.rint(pv / ps), 0, 127).astype(jnp.int8)
    acc = jnp.einsum("bhqt,bhdt->bqhd", p8, cache["v8"], preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * ps.transpose(0, 2, 1, 3)
    return out.astype(dtype)


def decode_attention_bounded(q, kv, lo, hi, dtype=jnp.bfloat16, scale=None, interpret=False):
    """Single-query decode attention with an index-range mask, routed to
    the fused flash-decode Pallas kernel on TPU (ops/flash_decode: one
    kernel per (b, h) site instead of ~8 small ops — the decode loop is
    per-op-latency-bound, PERF.md) and to the XLA mask paths elsewhere.

    q: (B, 1, H, Dh). kv: {"k","v"} bf16 decode layout OR the int8 dict
    ({"k8","ks","v8","vs"}, per-position scales). lo/hi: (B,) int32
    INCLUSIVE valid key positions — every decode mask is a range (t<=pos;
    pad_len<=t<=slot; full cross window), never an arbitrary tensor.
    Returns (B, 1, H, Dh)."""
    from ssak_tpu.ops.flash_decode import flash_decode_attention, flash_decode_supported

    B, Tq, H, Dh = q.shape
    scale = scale if scale is not None else Dh ** -0.5
    is_int8 = "k8" in kv
    T = (kv["k8"] if is_int8 else kv["k"]).shape[-1]
    lo = jnp.broadcast_to(jnp.asarray(lo, jnp.int32), (B,))
    hi = jnp.broadcast_to(jnp.asarray(hi, jnp.int32), (B,))
    if Tq == 1 and not interpret and flash_decode_supported(Dh, T):
        qs = q[:, 0].astype(jnp.bfloat16) * jnp.bfloat16(scale)  # (B, H, Dh)
        if is_int8:
            o = flash_decode_attention(qs, kv["k8"], kv["v8"], lo, hi, kv["ks"], kv["vs"])
        else:
            o = flash_decode_attention(qs, kv["k"], kv["v"], lo, hi)
        return o[:, None].astype(dtype)
    t = jnp.arange(T)
    mask = ((t[None, :] >= lo[:, None]) & (t[None, :] <= hi[:, None]))[:, None, None, :]
    if is_int8:
        return self_attention_int8(q, kv, mask=mask, dtype=dtype, scale=scale)
    return decode_attention(q, kv["k"], kv["v"], mask=mask, dtype=dtype, scale=scale)


def flash_self_attention(q, k, v, lengths=None, scale=None):
    """Fused TPU self-attention (Pallas flash kernel, custom VJP): never
    materializes the (B, H, T, T) logits/probs in HBM — the dominant
    memory traffic of the unfused path at encoder sequence lengths.

    q/k/v: (B, T, H, Dh) bf16. lengths: optional (B,) valid lengths;
    padding is expressed as flash segment ids (pad tokens form their own
    segment so valid queries never attend to them). T is padded to a
    multiple of 128 lanes for the kernel and sliced back."""
    from jax.experimental.pallas.ops.tpu.flash_attention import SegmentIds, flash_attention

    B, T, H, Dh = q.shape
    scale = scale if scale is not None else Dh ** -0.5
    Tp = ((T + 127) // 128) * 128
    pad = Tp - T
    if pad:
        q, k, v = (jnp.pad(a, ((0, 0), (0, pad), (0, 0), (0, 0))) for a in (q, k, v))
    if lengths is None and pad == 0:
        seg = None  # full attention, no mask work in the kernel
    else:
        if lengths is None:
            lengths = jnp.full((B,), T, jnp.int32)
        valid = (jnp.arange(Tp)[None, :] < lengths[:, None]).astype(jnp.int32)
        seg = SegmentIds(q=valid, kv=valid)
    out = flash_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
        segment_ids=seg, sm_scale=scale, causal=False,
    )
    return out.transpose(0, 2, 1, 3)[:, :T]


# Pallas flash attention is available (flash_self_attention) but measured
# SLOWER than XLA's unfused path on TPU v5e at ASR sequence lengths
# (wav2vec2 T=499 b32: 280 vs 191 ms/step; whisper-base encoder T=1500 b16:
# 233 vs 113 ms fwd+bwd) — XLA's fused softmax-matmul pipeline wins until
# the (B,H,T,T) buffers stop fitting. Kept behind this threshold for
# long-context use; tune via layers.FLASH_MIN_SEQ.
FLASH_MIN_SEQ = 4096


def _can_flash(q, dtype):
    return (
        jax.default_backend() == "tpu"
        and dtype == jnp.bfloat16
        and q.shape[-1] in (64, 128, 256)
        and q.shape[1] >= FLASH_MIN_SEQ
    )


def mha(
    x, params, n_heads: int,
    kv_x=None,
    mask=None,
    cache=None,
    cache_index=None,
    dtype=jnp.bfloat16,
    lengths=None,
    attn_bounds=None,
):
    """Multi-head attention with optional cross-attention inputs and KV cache.

    params: {query, key, value, out} each {kernel, [bias]}.
    cache: optional dict {k: (B, H, Dh, L), v: ...} in the decode-cache
    layout (see decode_attention for why); when given with cache_index,
    new k/v are written at that time position and attention runs over the
    full cache (decode step). attn_bounds=(lo, hi) ((B,) inclusive index
    range, instead of mask) routes the decode step through the fused
    flash-decode kernel on TPU (decode_attention_bounded).
    Returns (y, new_cache).
    """
    src = x if kv_x is None else kv_x
    if kv_x is None and "qkv" in params:
        # pre-fused projection (see fuse_qkv_params): ONE (D, 3D) matmul
        # instead of three — the fused kernel is built at LOAD time, not
        # concatenated inside the program (an in-scan concat measured
        # slower: XLA re-materialized it per token step, PERF.md)
        qkv = dense(x, params["qkv"], dtype)
        D = qkv.shape[-1] // 3
        q = split_heads(qkv[..., :D], n_heads)
        km, vm = qkv[..., D : 2 * D], qkv[..., 2 * D :]
    else:
        q = split_heads(dense(x, params["query"], dtype), n_heads)
        km = dense(src, params["key"], dtype)
        vm = dense(src, params["value"], dtype)
    if cache is not None:
        kT = to_decode_kv(km, n_heads)
        vT = to_decode_kv(vm, n_heads)
        if "k8" in cache:  # int8 decode cache (init_int8_cache)
            # the int8 cache is preallocated-only: writing at an implicit
            # slot 0 and attending over the whole buffer (where unwritten
            # slots have k=0 -> logit 0, NOT -inf) would silently leak
            # softmax mass — unlike the bf16 branch, which replaces the
            # cache wholesale when cache_index is None
            assert cache_index is not None, "int8 KV cache requires cache_index (decode-step use only)"
            new_cache = update_int8_cache(cache, kT, vT, cache_index)
            if attn_bounds is not None:
                y = decode_attention_bounded(q, new_cache, attn_bounds[0], attn_bounds[1], dtype=dtype)
            else:
                if mask is None and lengths is not None:
                    mask = (jnp.arange(new_cache["k8"].shape[-1])[None, :] < lengths[:, None])[:, None, None, :]
                y = self_attention_int8(q, new_cache, mask=mask, dtype=dtype)
            return dense(merge_heads(y), params["out"], dtype), new_cache
        if cache_index is not None:
            kT = jax.lax.dynamic_update_slice(cache["k"], kT.astype(cache["k"].dtype), (0, 0, 0, cache_index))
            vT = jax.lax.dynamic_update_slice(cache["v"], vT.astype(cache["v"].dtype), (0, 0, 0, cache_index))
        new_cache = {"k": kT, "v": vT}
        if attn_bounds is not None:
            y = decode_attention_bounded(q, new_cache, attn_bounds[0], attn_bounds[1], dtype=dtype)
        else:
            if mask is None and lengths is not None:
                mask = (jnp.arange(kT.shape[-1])[None, :] < lengths[:, None])[:, None, None, :]
            y = decode_attention(q, kT, vT, mask=mask, dtype=dtype)
        return dense(merge_heads(y), params["out"], dtype), new_cache
    k = split_heads(km, n_heads)
    v = split_heads(vm, n_heads)
    # full-sequence self-attention with only a padding mask -> fused kernel
    if kv_x is None and mask is None and _can_flash(q, dtype):
        y = flash_self_attention(q, k, v, lengths=lengths)
    else:
        if mask is None and lengths is not None:
            mask = (jnp.arange(k.shape[1])[None, :] < lengths[:, None])[:, None, None, :]
        y = attention(q, k, v, mask=mask, dtype=dtype)
    return dense(merge_heads(y), params["out"], dtype), None


def fuse_qkv_params(attn):
    """Return a copy of one attention param dict with query/key/value
    kernels concatenated into a single 'qkv' entry ((D, 3D) kernel +
    bias, zeros where a projection had none). A LOAD-TIME transform for
    decode models (mha picks the fused path when 'qkv' is present);
    skipped when any projection is quantized or carries LoRA. The
    originals are dropped from the copy to reclaim HBM — callers that
    still need them (cross-attention precompute) must not fuse those
    dicts."""
    for n in ("query", "key", "value"):
        p = attn[n]
        if isinstance(p.get("kernel"), dict) or "lora_A" in p:
            return attn
    kernels = [attn[n]["kernel"] for n in ("query", "key", "value")]
    D = kernels[0].shape[1]
    biases = [
        attn[n].get("bias") if attn[n].get("bias") is not None else jnp.zeros((D,), kernels[0].dtype)
        for n in ("query", "key", "value")
    ]
    out = {k: v for k, v in attn.items() if k not in ("query", "key", "value")}
    out["qkv"] = {"kernel": jnp.concatenate(kernels, axis=1), "bias": jnp.concatenate(biases)}
    return out


def mlp(x, params, dtype=jnp.bfloat16, activation=gelu):
    return dense(activation(dense(x, params["fc1"], dtype)), params["fc2"], dtype)


def causal_mask(Tq: int, Tk: int, offset: int = 0):
    """(1, 1, Tq, Tk) boolean lower-triangular mask; offset shifts query
    positions (for cached decode)."""
    q = jnp.arange(Tq)[:, None] + offset
    k = jnp.arange(Tk)[None, :]
    return (k <= q)[None, None]


def conv1d(x, params, stride: int = 1, padding="SAME", groups: int = 1, dtype=jnp.bfloat16):
    """x: (B, T, Cin); kernel: (K, Cin/groups, Cout)."""
    w = params["kernel"]
    # NOTE: no preferred_element_type here — its conv VJP rule builds a
    # transposed conv mixing f32 cotangents with bf16 weights (jax 0.9 bug);
    # XLA:TPU accumulates bf16 convs in f32 internally anyway.
    y = jax.lax.conv_general_dilated(
        x.astype(dtype),
        w.astype(dtype),
        window_strides=(stride,),
        padding=padding if isinstance(padding, str) else [padding],
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
    )
    if "bias" in params and params["bias"] is not None:
        y = y + params["bias"].astype(y.dtype)
    return y


# --- initializers ---------------------------------------------------------


def linear_init(key, d_in, d_out, bias=True, scale=None):
    k1, _ = jax.random.split(key)
    std = scale if scale is not None else (1.0 / math.sqrt(d_in))
    p = {"kernel": jax.random.normal(k1, (d_in, d_out), jnp.float32) * std}
    if bias:
        p["bias"] = jnp.zeros((d_out,), jnp.float32)
    return p


def ln_init(d):
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def conv_init(key, k, c_in, c_out, bias=True, groups: int = 1):
    std = 1.0 / math.sqrt(k * c_in / groups)
    p = {"kernel": jax.random.normal(key, (k, c_in // groups, c_out), jnp.float32) * std}
    if bias:
        p["bias"] = jnp.zeros((c_out,), jnp.float32)
    return p
