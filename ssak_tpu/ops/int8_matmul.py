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
