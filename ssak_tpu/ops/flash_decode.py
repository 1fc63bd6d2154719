"""Fused single-query decode attention (flash-decode) Pallas kernel.

Why: each autoregressive Whisper token step runs 64 attention sites
(32 self + 32 cross) and the XLA formulation of each is ~8 small ops
(two dots, mask, 4-op softmax, scale) over (B, H, 1, T) tensors — the
decode loop is per-op-latency-bound, not FLOP-bound (PERF.md "int8
decode, measured"). This kernel fuses one whole attention site into ONE
Pallas program per (batch, head): stream K/V once HBM->VMEM, dot, mask,
softmax, dot, normalize — no (B, H, 1, T) intermediates ever touch HBM.

int8 K/V (the --load_in_8bit cache, layers.quantize_decode_kv /
update_int8_cache) is streamed as int8 — 1 byte/element of HBM traffic —
and widened to bf16 *in VMEM* for the dots. That removes the separate
q/probs quantization ops the unfused int8 path needed (and their
accuracy cost: here only K/V are quantized, q and probs stay exact).
Per-position scales fold exactly: logits_t *= ks_t, p_t *= vs_t before
the PV contraction (which sums over t).

Masking is an index range [lo, hi] per batch row (scalar-prefetched):
decode masks are always position bounds — `t <= pos` (greedy cache),
`pad_len <= t <= slot` (right-aligned long-form prompts), full range
(cross attention) — never arbitrary boolean tensors.

Capability counterpart: the reference leans on torch SDPA/openai-whisper
CUDA kernels for the same sites (ssak/infer/whisper_infer.py decode).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _make_kernel_plain(Hb):
    def kernel(lo_ref, hi_ref, q_ref, k_ref, v_ref, o_ref):
        b = pl.program_id(0)
        lo, hi = lo_ref[b], hi_ref[b]
        for j in range(Hb):  # heads per instance: amortizes grid overhead
            q = q_ref[0, j].astype(jnp.bfloat16)  # (1, Dh)
            k = k_ref[0, j].astype(jnp.bfloat16)  # (Dh, T)
            logits = jax.lax.dot_general(q, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            t = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where((t >= lo) & (t <= hi), logits, _NEG)
            m = jnp.max(logits, axis=1, keepdims=True)
            p = jnp.exp(logits - m)
            s = jnp.sum(p, axis=1, keepdims=True)
            v = v_ref[0, j].astype(jnp.bfloat16)  # (Dh, T)
            o = jax.lax.dot_general(p.astype(jnp.bfloat16), v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            o_ref[0, j] = o / s  # (1, Dh)

    return kernel


def _make_kernel_int8(Hb):
    def kernel(lo_ref, hi_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref):
        b = pl.program_id(0)
        lo, hi = lo_ref[b], hi_ref[b]
        for j in range(Hb):
            q = q_ref[0, j].astype(jnp.bfloat16)  # (1, Dh)
            k = k_ref[0, j].astype(jnp.bfloat16)  # (Dh, T) widened in VMEM
            logits = jax.lax.dot_general(q, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            logits = logits * ks_ref[0, j].astype(jnp.float32)  # per-position K scales (exact)
            t = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where((t >= lo) & (t <= hi), logits, _NEG)
            m = jnp.max(logits, axis=1, keepdims=True)
            p = jnp.exp(logits - m)
            s = jnp.sum(p, axis=1, keepdims=True)
            pv = (p * vs_ref[0, j].astype(jnp.float32)).astype(jnp.bfloat16)  # fold per-position V scales
            v = v_ref[0, j].astype(jnp.bfloat16)
            o = jax.lax.dot_general(pv, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            o_ref[0, j] = o / s

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "head_block"))
def flash_decode_attention(q, kT, vT, lo, hi, k_scales=None, v_scales=None, interpret: bool = False, head_block: int = None):
    """q: (B, H, Dh) PRE-SCALED query (multiply by Dh**-0.5 before calling);
    kT/vT: (B, H, Dh, T) bf16 — or int8 with k_scales/v_scales (B, H, 1, T)
    per-position scales (f32 or bf16). lo/hi: (B,) int32 inclusive valid
    key range per row. head_block: heads per grid instance (divisor of H) —
    per-instance work is tiny, so fewer/larger instances amortize grid
    overhead. Returns (B, H, Dh) f32."""
    B, H, Dh = q.shape
    T = kT.shape[-1]
    quant = k_scales is not None
    if head_block is None:
        # largest divisor of H whose double-buffered K+V blocks stay well
        # under VMEM (~16 MB)
        per_head = Dh * T * (1 if quant else 2) * 2
        head_block = 1
        for hb in range(H, 0, -1):
            if H % hb == 0 and hb * per_head * 2 <= 6 * 1024 * 1024:
                head_block = hb
                break
    Hb = head_block
    kern = _make_kernel_int8(Hb) if quant else _make_kernel_plain(Hb)
    # q/o carried 4-D with an explicit singleton: TPU lowering requires the
    # block's last two dims divisible by (8, 128) OR equal to the array
    # dims — (1, Dh) as full trailing dims satisfies that
    in_specs = [
        pl.BlockSpec((1, Hb, 1, Dh), lambda b, h, *_: (b, h, 0, 0)),
        pl.BlockSpec((1, Hb, Dh, T), lambda b, h, *_: (b, h, 0, 0)),
    ]
    args = [q[:, :, None, :], kT]
    if quant:
        in_specs.append(pl.BlockSpec((1, Hb, 1, T), lambda b, h, *_: (b, h, 0, 0)))
        args.append(k_scales)
    in_specs.append(pl.BlockSpec((1, Hb, Dh, T), lambda b, h, *_: (b, h, 0, 0)))
    args.append(vT)
    if quant:
        in_specs.append(pl.BlockSpec((1, Hb, 1, T), lambda b, h, *_: (b, h, 0, 0)))
        args.append(v_scales)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, H // Hb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Hb, 1, Dh), lambda b, h, *_: (b, h, 0, 0)),
    )
    bytes_kv = Dh * T * (1 if quant else 2) * 2 + (2 * 4 * T if quant else 0)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, 1, Dh), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * Dh * T,
            bytes_accessed=B * H * (bytes_kv + Dh * (2 + 4)),
            transcendentals=B * H * T,
        ),
        interpret=interpret,
    )(lo.astype(jnp.int32), hi.astype(jnp.int32), *args)
    return out[:, :, 0]


def flash_decode_supported(Dh: int, T: int) -> bool:
    """Gate for routing decode attention through this kernel.

    OPT-IN (SSAK_FLASH_DECODE=1): measured on the current remote-runtime
    chip, every attention-site formulation bottoms out at a ~0.4 ms fixed
    per-site latency regardless of bytes moved (XLA bf16 T=1500: 557 us vs
    225 us DMA floor; int8 T=448: 414 us vs 34 us floor), and the fused
    kernel only ties XLA once the q-reshape/cast glue is counted
    (PERF.md "flash-decode investigation"). On a runtime without that
    per-op overhead the kernel's fewer-launches + int8 streaming should
    win; flip the env var and re-measure there."""
    import os

    if os.environ.get("SSAK_FLASH_DECODE") != "1":
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    return Dh % 8 == 0 and Dh * T * 2 <= 4 * 1024 * 1024
