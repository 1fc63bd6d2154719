"""CTC: loss, greedy decode, and alignment trellis — pure JAX, jit/pjit-safe.

Replaces torch ctc_loss (used by reference HF Wav2Vec2ForCTC and
SpeechBrain's ctc_cost) with a log-domain forward recursion expressed as a
single lax.scan over time, vectorized over (batch, 2U+1) states — XLA maps
the per-step state update onto the VPU; gradients flow through the scan via
autodiff (checkpointed).  Semantics match torch.nn.functional.ctc_loss with
zero_infinity (reference wav2vec_train.py:325 ctc_zero_infinity=True):
infeasible sequences (T < U) contribute zero loss and zero gradient.
"""

import jax
import jax.numpy as jnp

LOG_EPS = -1e30


def _interleave_blanks(labels, blank_id):
    """(B, U) -> (B, 2U+1) extended label sequence with blanks."""
    B, U = labels.shape
    ext = jnp.full((B, 2 * U + 1), blank_id, dtype=labels.dtype)
    return ext.at[:, 1::2].set(labels)


def ctc_loss(
    log_probs,
    logit_lengths,
    labels,
    label_lengths,
    blank_id: int = 0,
    zero_infinity: bool = True,
    reduction: str = "mean",
):
    """CTC negative log-likelihood.

    log_probs: (B, T, V) log-softmax outputs.
    logit_lengths: (B,) valid frames.  labels: (B, U) padded targets.
    label_lengths: (B,) valid target lengths.
    reduction: 'mean' (per-target-token mean, torch default), 'sum', 'none'.
    """
    B, T, V = log_probs.shape
    U = labels.shape[1]
    S = 2 * U + 1
    ext = _interleave_blanks(labels, blank_id)  # (B, S)

    # transition mask: allow skip from s-2 when ext[s] != blank and != ext[s-2]
    ext_shift2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=blank_id)[:, :S]
    allow_skip = (ext != blank_id) & (ext != ext_shift2)  # (B, S)

    # emission log-probs per state: (B, T, S)
    emit = jnp.take_along_axis(log_probs, ext[:, None, :].repeat(T, axis=1), axis=2)

    s_idx = jnp.arange(S)[None, :]  # (1, S)
    alpha0 = jnp.where(s_idx < 2, emit[:, 0, :], LOG_EPS)
    # states beyond 2*label_len are invalid
    valid_state = s_idx < (2 * label_lengths[:, None] + 1)
    alpha0 = jnp.where(valid_state, alpha0, LOG_EPS)

    def step(alpha, t):
        prev1 = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=LOG_EPS)[:, :S]
        prev2 = jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=LOG_EPS)[:, :S]
        prev2 = jnp.where(allow_skip, prev2, LOG_EPS)
        stacked = jnp.stack([alpha, prev1, prev2], axis=0)
        m = jnp.max(stacked, axis=0)
        merged = m + jnp.log(jnp.sum(jnp.exp(stacked - m[None]), axis=0))
        merged = jnp.where(m <= LOG_EPS / 2, LOG_EPS, merged)
        new_alpha = merged + emit[:, t, :]
        new_alpha = jnp.where(valid_state, new_alpha, LOG_EPS)
        # freeze alpha past the end of each sequence
        active = (t < logit_lengths)[:, None]
        new_alpha = jnp.where(active, new_alpha, alpha)
        return new_alpha, None

    alpha, _ = jax.lax.scan(step, alpha0, jnp.arange(1, T))

    # final states: S_b-1 (last label) and S_b-2... indices 2*len-1 and 2*len
    last = 2 * label_lengths  # blank after last label
    idx1 = jnp.clip(last, 0, S - 1)
    idx2 = jnp.clip(last - 1, 0, S - 1)
    a1 = jnp.take_along_axis(alpha, idx1[:, None], axis=1)[:, 0]
    a2 = jnp.take_along_axis(alpha, idx2[:, None], axis=1)[:, 0]
    m = jnp.maximum(a1, a2)
    ll = m + jnp.log(jnp.exp(a1 - m) + jnp.exp(a2 - m))
    nll = -ll

    if zero_infinity:
        feasible = (logit_lengths >= label_lengths) & (label_lengths > 0)
        nll = jnp.where(feasible & jnp.isfinite(nll) & (nll < -LOG_EPS / 2), nll, 0.0)

    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    # torch 'mean': per-sample division by target length, then batch mean
    return jnp.mean(nll / jnp.maximum(1, label_lengths))


def ctc_greedy_decode(log_probs, logit_lengths, blank_id: int = 0):
    """Greedy CTC: argmax, collapse repeats, drop blanks.

    Returns (tokens (B, T) padded with -1, lengths (B,)) — jit-safe static
    shapes; host code trims with lengths.
    """
    B, T, V = log_probs.shape
    best = jnp.argmax(log_probs, axis=-1)  # (B, T)
    t_idx = jnp.arange(T)[None, :]
    in_range = t_idx < logit_lengths[:, None]
    prev = jnp.pad(best, ((0, 0), (1, 0)), constant_values=blank_id)[:, :T]
    keep = (best != blank_id) & (best != prev) & in_range
    # stable compaction: positions of kept tokens
    order = jnp.where(keep, t_idx, T + t_idx)  # kept first, stable
    perm = jnp.argsort(order, axis=1)
    tokens = jnp.take_along_axis(jnp.where(keep, best, -1), perm, axis=1)
    lengths = keep.sum(axis=1)
    return tokens, lengths


def ctc_alignment_trellis(log_probs, tokens, blank_id: int = 0, use_max: bool = True):
    """Forced-alignment trellis + backpointers for one utterance.

    log_probs: (T, V); tokens: (U,) target token ids.
    Returns (trellis (T, 2U+1), path (T,) state indices) — the Viterbi path
    through the extended CTC graph.  Vectorized scan replacement for the
    reference's Python DP loop (align_transcriptions.py get_trellis:27,
    backtrack:79).
    """
    T, V = log_probs.shape
    U = tokens.shape[0]
    S = 2 * U + 1
    ext = _interleave_blanks(tokens[None], blank_id)[0]  # (S,)
    ext_shift2 = jnp.pad(ext, (2, 0), constant_values=blank_id)[:S]
    allow_skip = (ext != blank_id) & (ext != ext_shift2)
    emit = log_probs[:, ext]  # (T, S)

    s_idx = jnp.arange(S)
    alpha0 = jnp.where(s_idx < 2, emit[0], LOG_EPS)

    def step(alpha, t):
        prev1 = jnp.pad(alpha, (1, 0), constant_values=LOG_EPS)[:S]
        prev2 = jnp.where(allow_skip, jnp.pad(alpha, (2, 0), constant_values=LOG_EPS)[:S], LOG_EPS)
        stacked = jnp.stack([alpha, prev1, prev2])  # (3, S)
        if use_max:
            best = jnp.max(stacked, axis=0)
            arg = jnp.argmax(stacked, axis=0)
        else:
            m = jnp.max(stacked, axis=0)
            best = m + jnp.log(jnp.sum(jnp.exp(stacked - m[None]), axis=0))
            arg = jnp.argmax(stacked, axis=0)
        new_alpha = best + emit[t]
        return new_alpha, (new_alpha, arg)

    _, (trellis, argp) = jax.lax.scan(step, alpha0, jnp.arange(1, T))
    trellis = jnp.concatenate([alpha0[None], trellis], axis=0)  # (T, S)
    argp = jnp.concatenate([jnp.zeros((1, S), argp.dtype), argp], axis=0)

    # backtrack from the better of the two final states
    end_state = jnp.where(trellis[-1, S - 1] >= trellis[-1, S - 2], S - 1, S - 2)

    def back(state, t):
        a = argp[t, state]
        prev_state = state - a
        return prev_state, state

    _, path_rev = jax.lax.scan(back, end_state, jnp.arange(T - 1, -1, -1))
    path = path_rev[::-1]
    return trellis, path
