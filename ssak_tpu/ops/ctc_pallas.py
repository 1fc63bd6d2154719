"""Pallas TPU kernel: CTC loss forward-backward with fused gradient.

The scan-based ctc_loss (ssak_tpu.ops.ctc) differentiates by replaying the
alpha recursion under autodiff — 2x the HBM traffic and big residuals. This
kernel runs the classic forward-backward instead: one grid program per
batch element keeps alpha(T,S) in VMEM, runs the beta recursion backwards
while accumulating dL/dlog_probs analytically, and emits (loss, grad) in a
single pass. Exposed through jax.custom_vjp so training code calls it like
any loss. All state rows are 2-D (1, S) with pltpu.roll shifts (TPU lane
layout); emission gathers and gradient scatters are (1,V)x(V,S) matmuls on
the MXU.

Gradient identity (log domain), beta excluding the emission at t:
  gamma[t,s] = alpha[t,s] + beta[t,s];  ll = logsumexp over final states
  dL/dlogp[t,v] = -sum_{s: ext[s]=v} exp(gamma[t,s] - ll)
validated against torch ctc_loss in tests/test_ops_pallas.py.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp

NEG = -1e30


def _ctc_kernel(len_ref, lablen_ref, ext_ref, skip_ref, lp_ref, loss_ref, grad_ref, alpha_ref):
    """One batch element per grid program.

    len_ref/lablen_ref: (B,) scalar-prefetch arrays (indexed by program id);
    ext_ref: (1, 1, S) int32 extended labels; skip_ref: (1, 1, S) int32 (1
    where the s-2 transition is allowed); lp_ref: (1, T, V) log-probs;
    outputs loss (1, 1, 1), grad (1, T, V); alpha_ref: VMEM scratch (T, S).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    T = lp_ref.shape[1]
    S = ext_ref.shape[2]
    V = lp_ref.shape[2]
    t_len = len_ref[b]
    lab_len = lablen_ref[b]

    ext = ext_ref[0, :, :]  # (1, S)
    allow = skip_ref[0, :, :].astype(jnp.float32)  # (1, S)
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)  # (1, S)
    valid = (s_idx < 2 * lab_len + 1).astype(jnp.float32)

    # one-hot (V, S): column s is e_{ext[s]} — emission gather and gradient
    # scatter both become matmuls against this matrix
    v_iota = jax.lax.broadcasted_iota(jnp.int32, (V, S), 0)
    onehot = (v_iota == ext).astype(jnp.float32)  # (V, S)

    def emit(t):
        lp_t = lp_ref[0, pl.ds(t, 1), :]  # (1, V)
        return jnp.dot(lp_t, onehot, preferred_element_type=jnp.float32)  # (1, S)

    def shift_right(x, n):
        rolled = pltpu.roll(x, n, 1)
        return jnp.where(s_idx < n, NEG, rolled)

    # --- forward alpha ----------------------------------------------------
    a0 = jnp.where(s_idx < 2, emit(0), NEG)
    a0 = jnp.where(valid > 0, a0, NEG)
    alpha_ref[pl.ds(0, 1), :] = a0

    def fwd_body(t, prev):
        p1 = shift_right(prev, 1)
        p2 = jnp.where(allow > 0, shift_right(prev, 2), NEG)
        m = jnp.maximum(prev, jnp.maximum(p1, p2))
        merged = m + jnp.log(jnp.exp(prev - m) + jnp.exp(p1 - m) + jnp.exp(p2 - m))
        merged = jnp.where(m <= NEG / 2, NEG, merged)
        new = merged + emit(t)
        new = jnp.where(valid > 0, new, NEG)
        new = jnp.where(t < t_len, new, prev)
        alpha_ref[pl.ds(t, 1), :] = new
        return new

    last_alpha = jax.lax.fori_loop(1, T, fwd_body, a0)

    # --- total log-likelihood --------------------------------------------
    end1 = 2 * lab_len
    end2 = jnp.maximum(2 * lab_len - 1, 0)
    a_end1 = jnp.sum(jnp.where(s_idx == end1, last_alpha, 0.0))
    a_end2 = jnp.sum(jnp.where(s_idx == end2, last_alpha, 0.0))
    m = jnp.maximum(a_end1, a_end2)
    ll = m + jnp.log(jnp.exp(a_end1 - m) + jnp.exp(a_end2 - m))
    loss_ref[0, :, :] = jnp.full((1, 1), -ll, jnp.float32)

    # --- backward beta + gradient ----------------------------------------
    b_T = jnp.where((s_idx == end1) | (s_idx == end2), 0.0, NEG)
    b_T = jnp.where(valid > 0, b_T, NEG)
    # left shift by n == roll right by S-n (pltpu.roll wants shift >= 0)
    allow_n2 = jnp.where(s_idx < S - 2, pltpu.roll(allow, S - 2, 1), 0.0)

    def shift_left(x, n):
        rolled = pltpu.roll(x, S - n, 1)
        return jnp.where(s_idx >= S - n, NEG, rolled)

    def bwd_body(i, beta):
        t = T - 1 - i
        gamma = alpha_ref[pl.ds(t, 1), :] + beta  # (1, S)
        contrib = jnp.where(t < t_len, -jnp.exp(gamma - ll), 0.0)
        grad_ref[0, pl.ds(t, 1), :] = jnp.dot(contrib, onehot.T, preferred_element_type=jnp.float32)

        be = beta + emit(t)
        n1 = shift_left(be, 1)
        n2 = jnp.where(allow_n2 > 0, shift_left(be, 2), NEG)
        mm = jnp.maximum(be, jnp.maximum(n1, n2))
        merged = mm + jnp.log(jnp.exp(be - mm) + jnp.exp(n1 - mm) + jnp.exp(n2 - mm))
        merged = jnp.where(mm <= NEG / 2, NEG, merged)
        merged = jnp.where(valid > 0, merged, NEG)
        return jnp.where(t - 1 < t_len - 1, merged, beta)

    jax.lax.fori_loop(0, T, bwd_body, b_T)


def _run_kernel(log_probs, ext, allow_skip, logit_lengths, label_lengths, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, V = log_probs.shape
    S = ext.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, S), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, 1, S), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, T, V), lambda b, *_: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, T, V), lambda b, *_: (b, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((T, S), jnp.float32)],
    )
    loss, grad = pl.pallas_call(
        _ctc_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, T, V), jnp.float32),
        ],
        interpret=interpret,
    )(
        logit_lengths.astype(jnp.int32),
        label_lengths.astype(jnp.int32),
        ext.reshape(B, 1, S),
        allow_skip.reshape(B, 1, S),
        log_probs,
    )
    return loss[:, 0, 0], grad


def _prepare(labels, label_lengths, blank_id):
    B, U = labels.shape
    S = 2 * U + 1
    ext = jnp.full((B, S), blank_id, labels.dtype).at[:, 1::2].set(labels)
    ext_shift2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=blank_id)[:, :S]
    allow = ((ext != blank_id) & (ext != ext_shift2)).astype(jnp.int32)
    return ext.astype(jnp.int32), allow


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def ctc_loss_pallas(log_probs, logit_lengths, labels, label_lengths, blank_id: int = 0, zero_infinity: bool = True):
    """Per-sample CTC negative log-likelihood (B,) via the Pallas kernel."""
    loss, _grad = _fwd_impl(log_probs, logit_lengths, labels, label_lengths, blank_id, zero_infinity)
    return loss


def _fwd_impl(log_probs, logit_lengths, labels, label_lengths, blank_id, zero_infinity, interpret=False):
    ext, allow = _prepare(labels, label_lengths, blank_id)
    loss, grad = _run_kernel(
        log_probs.astype(jnp.float32), ext, allow,
        logit_lengths.astype(jnp.int32), label_lengths.astype(jnp.int32),
        interpret=interpret,
    )
    if zero_infinity:
        feasible = (logit_lengths >= label_lengths) & (label_lengths > 0)
        ok = feasible & jnp.isfinite(loss) & (loss < -NEG / 2)
        loss = jnp.where(ok, loss, 0.0)
        grad = jnp.where(ok[:, None, None], grad, 0.0)
    return loss, grad


def _vjp_fwd(log_probs, logit_lengths, labels, label_lengths, blank_id, zero_infinity):
    loss, grad = _fwd_impl(log_probs, logit_lengths, labels, label_lengths, blank_id, zero_infinity)
    return loss, grad


def _vjp_bwd(blank_id, zero_infinity, grad_res, g):
    return (grad_res * g[:, None, None], None, None, None)


ctc_loss_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def ctc_loss_fast(log_probs, logit_lengths, labels, label_lengths, blank_id: int = 0, zero_infinity: bool = True, reduction: str = "mean"):
    """Drop-in for ssak_tpu.ops.ctc.ctc_loss using the Pallas kernel when on
    TPU, falling back to the scan implementation elsewhere."""
    backend = jax.default_backend()
    if backend in ("tpu", "axon"):
        nll = ctc_loss_pallas(log_probs, logit_lengths, labels, label_lengths, blank_id, zero_infinity)
    else:
        from ssak_tpu.ops.ctc import ctc_loss

        return ctc_loss(log_probs, logit_lengths, labels, label_lengths, blank_id=blank_id, zero_infinity=zero_infinity, reduction=reduction)
    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    return jnp.mean(nll / jnp.maximum(1, label_lengths))
