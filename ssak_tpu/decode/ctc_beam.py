"""CTC beam search with optional n-gram LM shallow fusion.

Two engines with one semantics:

* `ctc_prefix_beam_search` — exact host prefix beam (pyctcdecode-equivalent
  capability: word-level LM scored at word boundaries with alpha/beta
  weights; reference transformers_infer.py:272-289). Used for parity and
  word-LM decoding.

* `ctc_beam_search_device` — batched ON-DEVICE beam as a lax.scan: beams
  carry (prefix rolling hash, last token, log p_blank, log p_nonblank);
  duplicate prefixes are merged by sorting on the hash and segment-
  logsumexp; char-level LM fusion is a dense-table gather (no host
  callbacks — the reference does all of this on CPU in C++). Backpointers
  stream to the host for text reconstruction.
"""

import math
from collections import defaultdict

import numpy as np

LOG0 = -1e30
LOG10 = math.log(10.0)


def _logsumexp2(a, b):
    m = max(a, b)
    if m <= LOG0 / 2:
        return LOG0
    return m + math.log(math.exp(a - m) + math.exp(b - m))


def ctc_prefix_beam_search(
    log_probs,
    vocab,
    blank_id: int = 0,
    beam_width: int = 25,
    lm=None,
    alpha: float = 0.5,
    beta: float = 1.5,
    word_delimiter: str = "|",
    prune_logp: float = -10.0,
):
    """Exact CTC prefix beam search over one utterance.

    log_probs: (T, V) natural-log probabilities (numpy). vocab: id->token
    list. lm: ArpaLM over WORDS (scored when a word completes), fused as
    alpha * ln10 * log10(P_lm) + beta per word (pyctcdecode semantics).
    Returns list of (text, score) best-first.
    """
    T, V = log_probs.shape
    # beams: prefix tuple -> (p_b, p_nb, lm_state)
    # lm_state: (context_words_tuple, partial_word)
    init_ctx = ("<s>",) if lm is not None else ()
    beams = {(): (0.0, LOG0, (init_ctx, ""))}

    for t in range(T):
        frame = log_probs[t]
        candidates = np.where(frame >= frame.max() + prune_logp)[0]
        new_beams = {}

        def add(prefix, p_b, p_nb, state):
            if prefix in new_beams:
                ob, onb, ostate = new_beams[prefix]
                new_beams[prefix] = (_logsumexp2(ob, p_b), _logsumexp2(onb, p_nb), ostate)
            else:
                new_beams[prefix] = (p_b, p_nb, state)

        for prefix, (p_b, p_nb, state) in beams.items():
            p_tot = _logsumexp2(p_b, p_nb)
            last = prefix[-1] if prefix else None
            for c in candidates:
                p = float(frame[c])
                if c == blank_id:
                    add(prefix, p_tot + p, LOG0, state)
                elif c == last:
                    # repeat collapses into same prefix (from p_nb)...
                    add(prefix, LOG0, p_nb + p, state)
                    # ...or extends after a blank (new symbol occurrence)
                    np_, state2 = _extend_state(state, vocab[c], lm, alpha, beta, word_delimiter)
                    add(prefix + (c,), LOG0, p_b + p + np_, state2)
                else:
                    np_, state2 = _extend_state(state, vocab[c], lm, alpha, beta, word_delimiter)
                    add(prefix + (c,), LOG0, p_tot + p + np_, state2)

        scored = sorted(new_beams.items(), key=lambda kv: -_logsumexp2(kv[1][0], kv[1][1]))
        beams = dict(scored[:beam_width])

    results = []
    for prefix, (p_b, p_nb, state) in beams.items():
        score = _logsumexp2(p_b, p_nb)
        # score the trailing partial word at end of sequence
        if lm is not None and state[1]:
            score += alpha * LOG10 * lm.score(state[1], state[0]) + beta
        text = "".join(vocab[c] for c in prefix).replace(word_delimiter, " ").strip()
        results.append((text, score))
    results.sort(key=lambda x: -x[1])
    return results


def _extend_state(state, token, lm, alpha, beta, word_delimiter):
    """Returns (lm_score_increment, new_state) for appending `token`."""
    if lm is None:
        return 0.0, state
    ctx, partial = state
    if token == word_delimiter or token == " ":
        if partial:
            inc = alpha * LOG10 * lm.score(partial, ctx) + beta
            new_ctx = (ctx + (partial,))[-(lm.order - 1):] if lm.order > 1 else ()
            return inc, (new_ctx, "")
        return 0.0, state
    return 0.0, (ctx, partial + token)


# --- on-device batched beam search ---------------------------------------


def ctc_beam_search_device(
    log_probs,
    frame_lengths,
    beam_width: int = 16,
    blank_id: int = 0,
    lm_table=None,
    lm_alpha: float = 0.5,
):
    """Batched beam search on device.

    log_probs: (B, T, V) jax array of log-softmax outputs.
    lm_table: optional dense char-LM (V_lm,)*order numpy table in log10
    (see ssak_tpu.decode.lm.char_lm_table); fused per extension.

    Returns (tokens (B, T) int32 padded -1, lengths (B,)) for the best beam,
    reconstructed on host from streamed backpointers.
    """
    import jax
    import jax.numpy as jnp

    B, T, V = log_probs.shape
    K = beam_width
    HASH_P = jnp.uint32(1000003)

    use_lm = lm_table is not None
    if use_lm:
        lm_tab = jnp.asarray(lm_table) * jnp.float32(LOG10) * lm_alpha  # natural log, weighted
        order = lm_table.ndim
    else:
        lm_tab = None
        order = 1

    def step(carry, t):
        hashes, last, p_b, p_nb, ctx = carry
        frame = log_probs[:, t]  # (B, V)
        active = (t < frame_lengths)[:, None, None]  # (B, 1, 1)

        p_tot = jnp.logaddexp(p_b, p_nb)  # (B, K)

        # --- candidate scores: (B, K, V) extensions + stay options
        ext_base = jnp.where(
            (jnp.arange(V)[None, None, :] == last[..., None]), p_b[..., None], p_tot[..., None]
        )  # extending with same token only allowed from p_b
        lm_inc = 0.0
        if use_lm:
            # ctx: (B, K, order-1) previous tokens (clipped to LM vocab)
            idx = tuple(ctx[..., i] for i in range(order - 1))
            lm_row = lm_tab[idx]  # (B, K, V_lm)
            V_lm = lm_row.shape[-1]
            pad = jnp.zeros((B, K, V - V_lm), lm_row.dtype) if V > V_lm else None
            lm_inc = jnp.concatenate([lm_row, pad], axis=-1) if pad is not None else lm_row[..., :V]
        ext_scores = ext_base + frame[:, None, :] + (lm_inc if use_lm else 0.0)  # (B, K, V)
        ext_scores = jnp.where(jnp.arange(V)[None, None, :] == blank_id, LOG0, ext_scores)

        # staying in the same prefix: blank from anywhere, repeat from p_nb
        stay_b = p_tot + frame[:, None, blank_id]  # (B, K)
        rep = jnp.take_along_axis(frame[:, None, :].repeat(K, 1), last[..., None], axis=2)[..., 0]
        stay_nb = p_nb + jnp.where(last >= 0, rep, LOG0)

        # --- flatten: K stay-candidates + K*V extend-candidates
        ext_hash = hashes[..., None] * HASH_P + jnp.arange(V, dtype=jnp.uint32)[None, None, :]
        cand_score = jnp.concatenate(
            [jnp.logaddexp(stay_b, stay_nb)[..., None], ext_scores], axis=2
        ).reshape(B, K * (V + 1))
        cand_hash = jnp.concatenate([hashes[..., None], ext_hash], axis=2).reshape(B, K * (V + 1))

        # merge duplicates: lexsort by (hash asc, score desc), keep the
        # best-scored candidate per hash
        order_idx = jnp.lexsort((-cand_score, cand_hash), axis=1)
        s_hash = jnp.take_along_axis(cand_hash, order_idx, axis=1)
        s_score = jnp.take_along_axis(cand_score, order_idx, axis=1)
        first = jnp.concatenate([jnp.ones((B, 1), bool), s_hash[:, 1:] != s_hash[:, :-1]], axis=1)
        # demote duplicates (they are an approximation: mass of dups beyond
        # the first is dropped; exact merge would segment-logsumexp)
        merged_score = jnp.where(first, s_score, LOG0)

        top_scores, top_idx = jax.lax.top_k(merged_score, K)
        flat_idx = jnp.take_along_axis(order_idx, top_idx, axis=1)  # index into K*(V+1)
        src_beam = flat_idx // (V + 1)
        tok = flat_idx % (V + 1) - 1  # -1 = stay
        is_stay = tok < 0

        new_hash = jnp.take_along_axis(cand_hash, flat_idx, axis=1)
        old_last = jnp.take_along_axis(last, src_beam, axis=1)
        new_last = jnp.where(is_stay, old_last, tok)

        old_pb = jnp.take_along_axis(p_b, src_beam, axis=1)
        old_pnb = jnp.take_along_axis(p_nb, src_beam, axis=1)
        old_ptot = jnp.logaddexp(old_pb, old_pnb)
        stay_b_sel = old_ptot + frame[:, None, blank_id].repeat(K, 1)
        rep_sel = jnp.take_along_axis(frame, jnp.clip(old_last, 0, V - 1), axis=1)
        stay_nb_sel = old_pnb + jnp.where(old_last >= 0, rep_sel, LOG0)
        new_pb = jnp.where(is_stay, stay_b_sel, LOG0)
        new_pnb = jnp.where(is_stay, stay_nb_sel, top_scores)

        if use_lm:
            old_ctx = jnp.take_along_axis(ctx, src_beam[..., None], axis=1)
            shifted = jnp.concatenate([old_ctx[..., 1:], jnp.clip(new_last, 0, lm_tab.shape[0] - 1)[..., None]], axis=-1)
            new_ctx = jnp.where(is_stay[..., None], old_ctx, shifted)
        else:
            new_ctx = ctx

        # freeze finished sequences
        new_hash = jnp.where(active[..., 0], new_hash, hashes)
        new_last = jnp.where(active[..., 0], new_last, last)
        new_pb = jnp.where(active[..., 0], new_pb, p_b)
        new_pnb = jnp.where(active[..., 0], new_pnb, p_nb)

        emit_tok = jnp.where(active[..., 0] & ~is_stay, tok, -1)
        src = jnp.where(active[..., 0], src_beam, jnp.arange(K)[None, :].repeat(B, 0))
        return (new_hash, new_last, new_pb, new_pnb, new_ctx), (src.astype(jnp.int32), emit_tok.astype(jnp.int32))

    hashes0 = jnp.zeros((B, K), jnp.uint32)
    last0 = jnp.full((B, K), -1, jnp.int32)
    p_b0 = jnp.full((B, K), LOG0, jnp.float32).at[:, 0].set(0.0)
    p_nb0 = jnp.full((B, K), LOG0, jnp.float32)
    ctx0 = jnp.zeros((B, K, max(1, order - 1)), jnp.int32)

    import jax

    (hashes, last, p_b, p_nb, _ctx), (srcs, toks) = jax.lax.scan(
        step, (hashes0, last0, p_b0, p_nb0, ctx0), jnp.arange(T)
    )
    # best final beam
    best = jnp.argmax(jnp.logaddexp(p_b, p_nb), axis=1)  # (B,)

    # host backtrace through (T, B, K) parent pointers
    srcs = np.asarray(srcs)
    toks = np.asarray(toks)
    best = np.asarray(best)
    lengths = np.asarray(frame_lengths)
    out = np.full((B, T), -1, np.int32)
    out_lens = np.zeros((B,), np.int32)
    for b in range(B):
        k = int(best[b])
        seq = []
        for t in range(T - 1, -1, -1):
            if t < lengths[b]:
                tok = int(toks[t, b, k])
                if tok >= 0:
                    seq.append(tok)
            k = int(srcs[t, b, k])
        seq.reverse()
        out[b, : len(seq)] = seq
        out_lens[b] = len(seq)
    return out, out_lens


def decode_beam_to_text(tokens, lengths, tokenizer):
    return [tokenizer.decode(tokens[b, : lengths[b]]) for b in range(tokens.shape[0])]
