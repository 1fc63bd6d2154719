"""Fused int8-weight dequantize-matmul Pallas kernel for the decode loop.

Why this exists: autoregressive decode (Whisper large) is HBM-bandwidth
bound — every token step re-reads the full decoder weights. Weight-only
int8 (models.quant) halves those bytes, BUT the plain XLA formulation
`x @ (q8.f32 * scale).bf16` gets the dequantize hoisted out of the decode
`lax.scan` as a loop-invariant, re-materializing the full bf16 weight
matrix in HBM (measured: OOM at B=32 on large-v3, zero win at B=8 — see
PERF.md "Whisper decode"). Inside a `pallas_call` nothing can be hoisted:
the kernel streams int8 blocks HBM->VMEM, feeds the MXU, and applies the
per-output-channel scale to the (tiny) accumulator tile, so the weight
traffic truly is 1 byte/param.

The win is int8 HBM STREAMING, not int8 MXU rate: the kernel widens the
int8 weight block to bf16 in VMEM before the dot (activations are bf16;
an s8xs8 dot would require quantizing x per call for no bandwidth gain —
the op is HBM-bound, so halving the weight bytes is the whole prize).

Layout notes (capability counterpart of the reference's bitsandbytes
load_in_8bit decode path, ssak/train/transformers/whisper_train.py:374):
  - symmetric per-output-channel scales commute with the contraction:
    x @ (q8 * s) == (x @ q8) * s, so dequant costs O(M*N), not O(K*N).
  - grid over N blocks only; K stays whole per block (decode K<=5120 →
    int8 block <= 1.3 MB, double-buffered by the pipeline).
  - M (batch*1 token) is padded to the bf16 sublane tile (16).

No autodiff rule: the decode loop never differentiates. Training with
quantized bases (QLoRA) keeps the XLA dequant path in layers.dense, where
fusion into the big (B*T, K) matmul is what you want.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# N-block: 256 divides every whisper/wav2vec2 projection width (1280, 5120,
# 1024, 4096); uneven tails (vocab proj) are handled by Pallas block padding.
_BN = 256
_M_TILE = 16  # bf16 sublane tile


def _kernel(x_ref, w_ref, s_ref, o_ref):
    acc = jax.lax.dot_general(
        x_ref[:],
        w_ref[:].astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = acc * s_ref[:]


def _pick_block_n(K: int, N: int) -> int:
    """Measured on v5e (decode shapes, distinct weights streamed from HBM
    each step): a handful of large blocks pipelines best — whole-N for
    narrow projections, ~1K lanes for wide ones. Tiny blocks pay per-block
    overhead; whole-N at K*N ~ 6.5 MB starves the double buffer."""
    if N <= 1536:
        return N
    if N % 1024 == 0:
        return 1024
    return max(256, (-(-N // 4) + 127) // 128 * 128)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def matmul_int8(x, q8, scale, block_n: int = None, interpret: bool = False):
    """x: (M, K) float/bf16, q8: (K, N) int8, scale: (1, N) f32 ->
    (M, N) f32. Fused dequantize-matmul; per-output-channel scales."""
    M, K = x.shape
    Kw, N = q8.shape
    assert K == Kw, (x.shape, q8.shape)
    if block_n is None:
        block_n = _pick_block_n(K, N)
    Mp = max(_M_TILE, -(-M // _M_TILE) * _M_TILE)
    xp = x.astype(jnp.bfloat16)
    if Mp != M:
        xp = jnp.pad(xp, ((0, Mp - M), (0, 0)))
    grid = (-(-N // block_n),)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Mp, K), lambda j: (0, 0)),
            pl.BlockSpec((K, block_n), lambda j: (0, j)),
            pl.BlockSpec((1, block_n), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((Mp, block_n), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N, bytes_accessed=K * N + Mp * K * 2 + Mp * N * 4, transcendentals=0
        ),
        interpret=interpret,
    )(xp, q8, scale.astype(jnp.float32))
    return out[:M] if Mp != M else out


# --- int4: fused unpack-dequantize-matmul ---------------------------------
#
# Same HBM-streaming argument as int8, at 0.5 byte/param: the plain XLA
# formulation hoists dequantize_kernel out of the decode scan as a full
# bf16 weight copy, forfeiting the capacity win that is int4's whole point
# (PERF.md "int8 decode" measured the identical failure for int8).
#
# models.quant packs two int4 values per byte ROW-INTERLEAVED (orig row 2r
# in the low nibble of packed row r, row 2r+1 in the high nibble) with
# blockwise scales over INT4_BLOCK=64 original rows. The kernel never
# de-interleaves the weights: the ACTIVATIONS are split even/odd outside
# the kernel (x[:, 0::2], x[:, 1::2] — a tiny (M, K) strided slice), and
# the contraction becomes xe @ w_low + xo @ w_high. Scales broadcast to
# per-packed-row inside the kernel (32 packed rows per quant block).

_INT4_SUB = 32  # packed rows per quant block (models.quant INT4_BLOCK // 2)


def _kernel4(xe_ref, xo_ref, p_ref, s_ref, o_ref, *, cdt):
    p = p_ref[:]  # (K2, bn) int8, two nibbles per byte
    s = s_ref[:]  # (nb, bn) f32 blockwise scales
    K2 = p.shape[0]
    # per-packed-row scale: each block scale broadcast over its 32 packed
    # rows (broadcast+collapse, not jnp.repeat — repeat lowers to scatter,
    # which Pallas TPU does not implement)
    nb = s.shape[0]
    sfull = jnp.broadcast_to(s[:, None, :], (nb, _INT4_SUB, s.shape[1])).reshape(K2, s.shape[1])
    # nibble extraction on i32 (Mosaic has no i8 vector shifts): low nibble
    # sign-extends via <<28 >>28, high via the arithmetic >>4
    p32 = p.astype(jnp.int32)
    low = jnp.right_shift(jnp.left_shift(p32, 28), 28)
    high = jnp.right_shift(p32, 4)
    wl = (low.astype(jnp.float32) * sfull).astype(cdt)
    wh = (high.astype(jnp.float32) * sfull).astype(cdt)
    acc = jax.lax.dot_general(xe_ref[:], wl, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(xo_ref[:], wh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def matmul_int4(x, q4, scale, block_n: int = None, interpret: bool = False):
    """x: (M, K) float/bf16, q4: (K//2, N) packed int4 (models.quant
    layout), scale: (nb, 1, N) or (nb, N) f32 blockwise -> (M, N) f32.
    Fused unpack-dequantize-matmul; weight HBM traffic 0.5 byte/param."""
    M, K = x.shape
    K2, N = q4.shape
    assert K == 2 * K2, (x.shape, q4.shape)
    if scale.ndim == 3:
        scale = scale.reshape(scale.shape[0], scale.shape[2])
    nb = scale.shape[0]
    assert K2 % nb == 0 and K2 // nb == _INT4_SUB, (K2, nb)
    if block_n is None:
        # w_low + w_high are materialized bf16 in VMEM: cap the tile
        block_n = _pick_block_n(K, N) if K2 * _pick_block_n(K, N) * 4 < 4 << 20 else 256
    Mp = max(_M_TILE, -(-M // _M_TILE) * _M_TILE)
    # interpret mode (tests) runs on backends without a bf16 dot thunk
    cdt = jnp.float32 if interpret else jnp.bfloat16
    xp = x.astype(cdt)
    if Mp != M:
        xp = jnp.pad(xp, ((0, Mp - M), (0, 0)))
    xe = xp[:, 0::2]
    xo = xp[:, 1::2]
    grid = (-(-N // block_n),)
    out = pl.pallas_call(
        functools.partial(_kernel4, cdt=cdt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Mp, K2), lambda j: (0, 0)),
            pl.BlockSpec((Mp, K2), lambda j: (0, 0)),
            pl.BlockSpec((K2, block_n), lambda j: (0, j)),
            pl.BlockSpec((nb, block_n), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((Mp, block_n), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * Mp * K2 * N, bytes_accessed=K2 * N + 2 * Mp * K2 * 2 + Mp * N * 4, transcendentals=0
        ),
        interpret=interpret,
    )(xe, xo, q4, scale.astype(jnp.float32))
    return out[:M] if Mp != M else out


def int4_dense_supported(x, q4) -> bool:
    """Decode-shaped activations over lane-aligned int4 contractions (same
    gate as int8_dense_supported; K2 = K//2 must be lane-aligned)."""
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    K2, N = q4.shape
    if K2 % 128 or N % 128 or K2 % _INT4_SUB:
        return False
    if x.ndim == 2:
        return x.shape[0] <= 64
    return x.ndim == 3 and x.shape[1] == 1 and x.shape[0] <= 64


def int8_dense_supported(x, q8) -> bool:
    """Shapes the kernel handles well: decode-shaped activations (one
    token per sequence) over lane-aligned contractions.

    Platform gate: checked against the DEFAULT backend at trace time (the
    Pallas TPU kernel only lowers for TPU). A CPU-placed jit inside a
    TPU-default process would mis-route here; quantized dense therefore
    requires default-backend placement — every ssak_tpu decode entry point
    satisfies this (CLIs pin the platform process-wide via
    utils.env.apply_platform_env before any trace)."""
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    K, N = q8.shape
    if K % 128 or N % 128:
        return False
    if x.ndim == 2:
        return x.shape[0] <= 64
    return x.ndim == 3 and x.shape[1] == 1 and x.shape[0] <= 64
