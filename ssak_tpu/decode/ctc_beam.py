"""CTC beam search with optional n-gram LM shallow fusion.

Two engines with one semantics:

* `ctc_prefix_beam_search` — exact host prefix beam (pyctcdecode-equivalent
  capability: word-level LM scored at word boundaries with alpha/beta
  weights; reference transformers_infer.py:272-289). Used for parity and
  word-LM decoding.

* `ctc_beam_search_device` — batched ON-DEVICE beam as a lax.scan: beams
  carry (prefix rolling hash, last token, log p_blank, log p_nonblank,
  lexicon trie node, word-LM context); stay-vs-extend duplicates merge by
  exact hash equality + logsumexp; char-level LM fusion is a dense-table
  gather and WORD-level n-gram fusion is a hashed-table backoff lookup at
  lexicon word boundaries (no host callbacks — the reference does all of
  this on CPU in C++). Backpointers stream to the host for text
  reconstruction.
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
    lexicon=None,
):
    """Exact CTC prefix beam search over one utterance.

    log_probs: (T, V) natural-log probabilities (numpy). vocab: id->token
    list. lm: ArpaLM over WORDS (scored when a word completes), fused as
    alpha * ln10 * log10(P_lm) + beta per word (pyctcdecode semantics).
    lexicon: optional decode.lexicon.Lexicon — hypotheses are constrained
    to in-lexicon words (the Vosk/WFST capability, ref kaldi_infer.py:119);
    composes with lm.
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
                    ext = _extend_state(state, vocab[c], lm, alpha, beta, word_delimiter, lexicon)
                    if ext is not None:
                        add(prefix + (c,), LOG0, p_b + p + ext[0], ext[1])
                else:
                    ext = _extend_state(state, vocab[c], lm, alpha, beta, word_delimiter, lexicon)
                    if ext is not None:
                        add(prefix + (c,), LOG0, p_tot + p + ext[0], ext[1])

        scored = sorted(new_beams.items(), key=lambda kv: -_logsumexp2(kv[1][0], kv[1][1]))
        beams = dict(scored[:beam_width])

    results = []
    for prefix, (p_b, p_nb, state) in beams.items():
        # a trailing partial that is not a complete lexicon word cannot end
        # the utterance (the WFST would have no final state there)
        if lexicon is not None and state[1] and not lexicon.has_word(state[1]):
            continue
        score = _logsumexp2(p_b, p_nb)
        # score the trailing partial word at end of sequence
        if lm is not None and state[1]:
            score += alpha * LOG10 * lm.score(state[1], state[0]) + beta
        text = "".join(vocab[c] for c in prefix).replace(word_delimiter, " ").strip()
        results.append((text, score))
    results.sort(key=lambda x: -x[1])
    return results or [("", LOG0)]


def _extend_state(state, token, lm, alpha, beta, word_delimiter, lexicon=None):
    """Returns (lm_score_increment, new_state) for appending `token`, or
    None when the extension is lexicon-forbidden (hypothesis killed)."""
    if lm is None and lexicon is None:
        return 0.0, state
    ctx, partial = state
    if token == word_delimiter or token == " ":
        if partial:
            if lexicon is not None and not lexicon.has_word(partial):
                return None
            inc = 0.0
            if lm is not None:
                inc = alpha * LOG10 * lm.score(partial, ctx) + beta
                ctx = (ctx + (partial,))[-(lm.order - 1):] if lm.order > 1 else ()
            return inc, (ctx, "")
        return 0.0, state
    if lexicon is not None and not lexicon.has_prefix(partial + token):
        return None
    return 0.0, (ctx, partial + token)


# --- on-device batched beam search ---------------------------------------


_DEVICE_BEAM_CACHE = {}


def _hashed_lookup(table, ids, scale, probes):
    """Probe a decode.lm.HashedNgrams table on device. ids: tuple of
    int32 arrays (broadcastable, the n-gram most-recent-last). probes is
    STATIC (host-computed worst-case probe count — unrolled). Returns
    (value * scale, hit) arrays shaped like ids[0]."""
    import jax.numpy as jnp

    from ssak_tpu.decode.lm import _H_SEED1, _H_SEED2, _ngram_mix

    fp_tab, val_tab = table["fp"], table["val"]
    M = fp_tab.shape[0]
    uids = tuple(i.astype(jnp.uint32) for i in ids)
    h1 = _ngram_mix(uids, jnp.uint32(_H_SEED1), jnp)
    h2 = _ngram_mix(uids, jnp.uint32(_H_SEED2), jnp)
    h2 = jnp.where(h2 == 0, jnp.uint32(1), h2)
    idx = h1 & jnp.uint32(M - 1)
    val = jnp.zeros(h1.shape, jnp.float32)
    hit = jnp.zeros(h1.shape, bool)
    stop = jnp.zeros(h1.shape, bool)
    for i in range(probes):
        j = (idx + jnp.uint32(i)) & jnp.uint32(M - 1)
        f = fp_tab[j]
        now = (f == h2) & ~stop
        val = jnp.where(now, val_tab[j], val)
        hit = hit | now
        stop = stop | now | (f == 0)
    return val * scale, hit


def _word_lm_score(wlm, ctx, w, scale, order, probes):
    """Backoff word n-gram score on device, exactly ArpaLM._score's
    recursion unrolled for order<=3. ctx: (..., order-1) int32 word ids
    most-recent-last (pad/bos rows score-through correctly: a padded
    context never matches an n-gram and its backoff row is 0, reproducing
    the short-context startup scoring of the host beam). w: (...,) valid
    word ids. order/probes are STATIC. Returns scale * log10 P(w | ctx)."""
    import jax.numpy as jnp

    uni_w = wlm["uni"][w] * scale
    if order == 1:
        return uni_w
    c2 = ctx[..., -1]
    v2, hit2 = _hashed_lookup(wlm["bi"], (c2, w), scale, probes["bi"])
    s2 = jnp.where(hit2, v2, wlm["uni_backoff"][c2] * scale + uni_w)
    if order == 2:
        return s2
    c1 = ctx[..., -2]
    v3, hit3 = _hashed_lookup(wlm["tri"], (c1, c2, w), scale, probes["tri"])
    bo2, _ = _hashed_lookup(wlm["bi_backoff"], (c1, c2), scale, probes["bi_backoff"])
    return jnp.where(hit3, v3, bo2 + s2)


def _device_beam_program(T, V, K, blank_id, order, use_lm, use_lexicon=False, word_cfg=None, unroll=4):
    """Build + cache the jitted scan for one (T, V, K, LM, lexicon, word-LM)
    signature.

    Sort-free TPU design: because live beams always hold DISTINCT prefixes,
    the only duplicate class each step is stay-vs-extend (extending beam j
    with token c can recreate beam k's prefix). That merge is an exact
    (B, K, V, K) hash-equality + logsumexp — no lexsort; top-K over the
    K + K*V candidates is ONE lax.top_k (a fused sort over ~800 lanes per
    row — measured faster than K iterative argmax extractions, which
    serialize K reduce+mask rounds inside every scan step).

    use_lexicon: beams additionally carry a trie NODE id; extensions gather
    a (B, K, V) next-node row from the dense lexicon transition table
    (decode/lexicon.Lexicon.device_tables — the WFST L composition as an
    HBM gather), forbidden transitions score -inf, and end-of-utterance
    requires an accepting/boundary node.

    word_cfg (requires use_lexicon): WORD n-gram shallow fusion fully
    on-device (the KenLM/pyctcdecode semantics of reference
    transformers_infer.py:272-289). Beams carry (order-1) previous word
    ids; at each accept-node -> root (delimiter) extension the completed
    word (lexicon.node_word_ids) is scored by backoff lookup in hashed
    n-gram tables and alpha*ln10*log10P + beta is fused into the extension
    score BEFORE top-K — identical placement to the host beam's
    _extend_state, so device and host beams agree. A trailing complete
    word is scored at end-of-utterance the same way.
    """
    import jax
    import jax.numpy as jnp

    HASH_P = jnp.uint32(1000003)
    word_order = word_cfg["order"] if word_cfg else 0
    word_probes = dict(word_cfg["probes"]) if word_cfg else {}

    def run(log_probs, frame_lengths, aux):
        B = log_probs.shape[0]
        lm_tab = aux.get("char_lm")
        if use_lexicon:
            lex_trans, lex_accept = aux["lex_trans"], aux["lex_accept"]
        wlm = aux.get("word_lm")
        beta = aux.get("word_beta", 0.0)
        alpha_scale = aux.get("word_alpha_scale", 1.0)

        def step(carry, t):
            hashes, last, p_b, p_nb, ctx, node, wctx = carry
            frame = log_probs[:, t]  # (B, V)
            active = (t < frame_lengths)[:, None]  # (B, 1)

            p_tot = jnp.logaddexp(p_b, p_nb)  # (B, K)

            # --- extension candidates: (B, K, V)
            ext_base = jnp.where(
                (jnp.arange(V)[None, None, :] == last[..., None]), p_b[..., None], p_tot[..., None]
            )  # extending with the same token only allowed from p_b
            if use_lm:
                idx = tuple(ctx[..., i] for i in range(order - 1))
                lm_row = lm_tab[idx]  # (B, K, V_lm)
                V_lm = lm_row.shape[-1]
                if V > V_lm:
                    lm_inc = jnp.concatenate([lm_row, jnp.zeros((B, K, V - V_lm), lm_row.dtype)], axis=-1)
                else:
                    lm_inc = lm_row[..., :V]
            else:
                lm_inc = 0.0
            ext_scores = ext_base + frame[:, None, :] + lm_inc  # (B, K, V)
            ext_scores = jnp.where(jnp.arange(V)[None, None, :] == blank_id, LOG0, ext_scores)
            if use_lexicon:
                nxt = lex_trans[node]  # (B, K, V) gather of trie rows
                ext_scores = jnp.where(nxt >= 0, ext_scores, LOG0)
                if word_order:
                    # word completion = transition into the root from an
                    # accepting node (only delimiter columns do this)
                    accept_node = aux["lex_accept"][node]  # (B, K)
                    wid = aux["node_word"][node]  # (B, K), -1 if not accepting
                    w_safe = jnp.clip(wid, 0, wlm["uni"].shape[0] - 1)
                    w_inc = _word_lm_score(wlm, wctx, w_safe, alpha_scale, word_order, word_probes) + beta  # (B, K)
                    completing = (nxt == 0) & accept_node[..., None]  # (B, K, V)
                    ext_scores = ext_scores + jnp.where(completing, w_inc[..., None], 0.0)
            ext_hash = hashes[..., None] * HASH_P + jnp.arange(V, dtype=jnp.uint32)[None, None, :]

            # --- stay candidates: blank from anywhere, repeat from p_nb
            stay_b = p_tot + frame[:, None, blank_id]  # (B, K)
            rep = jnp.take_along_axis(frame, jnp.clip(last, 0, V - 1), axis=1)
            stay_nb = p_nb + jnp.where(last >= 0, rep, LOG0)

            # --- exact stay-vs-extend merge: extension (j, c) recreating
            # stay k's prefix folds into k's nonblank mass and is removed
            eq = ext_hash[:, :, :, None] == hashes[:, None, None, :]  # (B, K, V, K)
            live = (jnp.logaddexp(stay_b, stay_nb) > LOG0 / 2)[:, None, None, :]
            eq = eq & live
            merged_in = jnp.max(jnp.where(eq, ext_scores[..., None], LOG0), axis=(1, 2))  # (B, K)
            # (each stay has at most one matching extension: ext j+c == k
            # fixes c = k's last token and j's prefix = k's minus last)
            stay_nb = jnp.logaddexp(stay_nb, merged_in)
            ext_scores = jnp.where(jnp.any(eq, axis=3), LOG0, ext_scores)

            # --- candidates: K stays then K*V extends; ONE fused top-K
            cand_score = jnp.concatenate(
                [jnp.logaddexp(stay_b, stay_nb), ext_scores.reshape(B, K * V)], axis=1
            )  # (B, K + K*V)
            top_scores, flat_idx = jax.lax.top_k(cand_score, K)  # (B, K) each

            is_stay = flat_idx < K
            src_beam = jnp.where(is_stay, flat_idx, (flat_idx - K) // V)
            tok = jnp.where(is_stay, -1, (flat_idx - K) % V)

            old_hash = jnp.take_along_axis(hashes, src_beam, axis=1)
            new_hash = jnp.where(is_stay, old_hash, old_hash * HASH_P + tok.astype(jnp.uint32))
            old_last = jnp.take_along_axis(last, src_beam, axis=1)
            new_last = jnp.where(is_stay, old_last, tok)

            new_pb = jnp.where(is_stay, jnp.take_along_axis(stay_b, src_beam, axis=1), LOG0)
            merged_stay_nb = jnp.take_along_axis(stay_nb, src_beam, axis=1)
            new_pnb = jnp.where(is_stay, merged_stay_nb, top_scores)

            if use_lm:
                old_ctx = jnp.take_along_axis(ctx, src_beam[..., None], axis=1)
                shifted = jnp.concatenate(
                    [old_ctx[..., 1:], jnp.clip(new_last, 0, lm_tab.shape[0] - 1)[..., None]], axis=-1
                )
                new_ctx = jnp.where(is_stay[..., None], old_ctx, shifted)
            else:
                new_ctx = ctx

            if use_lexicon:
                old_node = jnp.take_along_axis(node, src_beam, axis=1)
                nxt_src = jnp.take_along_axis(nxt, src_beam[..., None], axis=1)  # (B, K, V)
                nxt_tok = jnp.take_along_axis(nxt_src, jnp.clip(tok, 0, V - 1)[..., None], axis=2)[..., 0]
                new_node = jnp.where(is_stay, old_node, nxt_tok)
                new_node = jnp.where(active, new_node, node)
            else:
                new_node = node

            if word_order:
                old_wctx = jnp.take_along_axis(wctx, src_beam[..., None], axis=1)
                # chosen extension completes a word iff it lands on the root
                # from an accepting source node — recoverable from already-
                # gathered state, no (B, K, V) completion-matrix reorder
                accept_src = jnp.take_along_axis(accept_node, src_beam, axis=1)
                comp_sel = (new_node == 0) & accept_src & ~is_stay
                w_src = jnp.take_along_axis(jnp.clip(wid, 0, wlm["uni"].shape[0] - 1), src_beam, axis=1)
                shifted_w = jnp.concatenate([old_wctx[..., 1:], w_src[..., None]], axis=-1)
                new_wctx = jnp.where(comp_sel[..., None], shifted_w, old_wctx)
                new_wctx = jnp.where(active[..., None], new_wctx, wctx)
            else:
                new_wctx = wctx

            # freeze finished sequences
            new_hash = jnp.where(active, new_hash, hashes)
            new_last = jnp.where(active, new_last, last)
            new_pb = jnp.where(active, new_pb, p_b)
            new_pnb = jnp.where(active, new_pnb, p_nb)

            emit_tok = jnp.where(active & ~is_stay, tok, -1)
            src = jnp.where(active, src_beam, jnp.arange(K)[None, :].repeat(B, 0))
            return (new_hash, new_last, new_pb, new_pnb, new_ctx, new_node, new_wctx), (src.astype(jnp.int32), emit_tok.astype(jnp.int32))

        hashes0 = jnp.ones((B, K), jnp.uint32) * (jnp.arange(K, dtype=jnp.uint32)[None, :] * jnp.uint32(2654435761) + 1)
        last0 = jnp.full((B, K), -1, jnp.int32)
        p_b0 = jnp.full((B, K), LOG0, jnp.float32).at[:, 0].set(0.0)
        p_nb0 = jnp.full((B, K), LOG0, jnp.float32)
        ctx0 = jnp.zeros((B, K, max(1, order - 1)), jnp.int32)
        node0 = jnp.zeros((B, K), jnp.int32)
        if word_order:
            # context starts as [<pad>, ..., <s>]: pad never matches an
            # n-gram, reproducing the host beam's 1-word startup context
            wctx0 = jnp.full((B, K, max(1, word_order - 1)), word_cfg["pad"], jnp.int32)
            wctx0 = wctx0.at[..., -1].set(word_cfg["bos"])
        else:
            wctx0 = jnp.zeros((B, K, 1), jnp.int32)

        # unroll: the per-frame tensors are tiny (B*K*V ~ 25k elements), so
        # each scan iteration is dispatch/latency-bound, not FLOP-bound;
        # unrolling fuses several frames' op-chains into one XLA computation
        (hashes, last, p_b, p_nb, _ctx, node, wctx), (srcs, toks) = jax.lax.scan(
            step, (hashes0, last0, p_b0, p_nb0, ctx0, node0, wctx0), jnp.arange(T), unroll=unroll
        )
        final = jnp.logaddexp(p_b, p_nb)
        if use_lexicon:
            # a mid-word ending is not a final state (same rule as the host
            # beam's trailing-partial check)
            accept_node = aux["lex_accept"][node]
            ok = (node == 0) | accept_node
            final = jnp.where(ok, final, LOG0)
            if word_order:
                wlm_f = aux["word_lm"]
                wid_f = aux["node_word"][node]
                w_safe = jnp.clip(wid_f, 0, wlm_f["uni"].shape[0] - 1)
                tail = _word_lm_score(wlm_f, wctx, w_safe, aux.get("word_alpha_scale", 1.0), word_order, word_probes) + aux.get("word_beta", 0.0)
                final = final + jnp.where(accept_node, tail, 0.0)
        best = jnp.argmax(final, axis=1)  # (B,)
        return best, srcs, toks

    return jax.jit(run)


# host tables -> device arrays, converted ONCE per table object: the
# lexicon/word-LM tables are tens of MB and live for the whole run (built
# once per model in ctc_infer), but jnp.asarray on a numpy array re-uploads
# every call — over a remote runtime with a per-transfer latency floor that
# tax dominates small batches (advisor r3 finding). Entries keep a strong
# ref to EVERY keyed host object so an id() can never be reused while the
# entry lives, and the cache is a small LRU so repeated ctc_infer calls
# (each builds fresh tables) cannot leak host RAM / HBM without bound.
from collections import OrderedDict as _OrderedDict

_DEVICE_TABLE_CACHE = _OrderedDict()
_DEVICE_TABLE_CACHE_MAX = 8


def _cached_device(objs, extra_key, build):
    """objs: tuple of host objects the device value is built from (all are
    identity-keyed AND strongly referenced); extra_key: hashable scalars."""
    key = (tuple(id(o) for o in objs), extra_key)
    ent = _DEVICE_TABLE_CACHE.get(key)
    if ent is None or any(a is not b for a, b in zip(ent[0], objs)):
        ent = (objs, build())
        _DEVICE_TABLE_CACHE[key] = ent
        while len(_DEVICE_TABLE_CACHE) > _DEVICE_TABLE_CACHE_MAX:
            _DEVICE_TABLE_CACHE.popitem(last=False)
    else:
        _DEVICE_TABLE_CACHE.move_to_end(key)
    return ent[1]


def _prepare_word_lm_aux(word_lm, lexicon_tables, lm_alpha, lm_beta):
    """Device-side arrays for word n-gram fusion (word_lm from
    decode.lm.word_lm_device_tables; lexicon_tables must include the
    node_word array as third element)."""
    import jax.numpy as jnp

    def to_dev(tab):
        return {"fp": jnp.asarray(tab.fp), "val": jnp.asarray(tab.val)}

    wlm = {
        "uni": jnp.asarray(word_lm["uni"]),
        "uni_backoff": jnp.asarray(word_lm["uni_backoff"]),
    }
    if word_lm["order"] >= 2:
        wlm["bi"] = to_dev(word_lm["bi"])
    if word_lm["order"] >= 3:
        wlm["bi_backoff"] = to_dev(word_lm["bi_backoff"])
        wlm["tri"] = to_dev(word_lm["tri"])
    return {
        "word_lm": wlm,
        "node_word": jnp.asarray(lexicon_tables[2]),
        "word_alpha_scale": jnp.float32(lm_alpha * LOG10),
        "word_beta": jnp.float32(lm_beta),
    }


def ctc_beam_search_device(
    log_probs,
    frame_lengths,
    beam_width: int = 16,
    blank_id: int = 0,
    lm_table=None,
    lm_alpha: float = 0.5,
    lexicon_tables=None,
    word_lm=None,
    lm_beta: float = 1.5,
    unroll: int = 4,
    return_async: bool = False,
):
    """Batched beam search on device.

    log_probs: (B, T, V) jax array of log-softmax outputs.
    lm_table: optional dense char-LM (V_lm,)*order numpy table in log10
    (see ssak_tpu.decode.lm.char_lm_table); fused per extension.
    lexicon_tables: optional (trans, accept[, node_word]) from
    decode.lexicon.Lexicon.device_tables (+ node_word_ids) — constrains
    hypotheses to in-lexicon words entirely on device (the Vosk capability
    without leaving the chip).
    word_lm: optional decode.lm.word_lm_device_tables dict — WORD n-gram
    shallow fusion scored at word boundaries on device with pyctcdecode
    weights (alpha=lm_alpha, beta=lm_beta); requires lexicon_tables with
    node_word (the trie identifies which word each accept node completes).

    Returns (tokens (B, T) int32 padded -1, lengths (B,)) for the best beam,
    reconstructed on host from streamed backpointers.

    return_async=True returns a handle whose .result() does the host
    fetch+backtrace: callers can enqueue the NEXT batch's encoder+beam
    before resolving this one, so the device pipeline never drains on the
    host round trip (the round trip dominates small-batch decode on a
    remote-runtime chip).
    """
    import jax.numpy as jnp

    B, T, V = log_probs.shape
    K = beam_width

    use_lm = lm_table is not None
    use_lexicon = lexicon_tables is not None
    order = lm_table.ndim if use_lm else 1
    if word_lm is not None:
        assert use_lexicon and len(lexicon_tables) >= 3, "word_lm requires lexicon_tables with node_word_ids"
        word_cfg = {"order": word_lm["order"], "bos": word_lm["bos"], "pad": word_lm["pad"],
                    "probes": tuple(sorted((k, v.max_probe) for k, v in word_lm.items() if hasattr(v, "max_probe")))}
    else:
        word_cfg = None
    key = (T, V, K, blank_id, order, use_lm, use_lexicon,
           tuple(sorted(word_cfg.items())) if word_cfg else None, unroll)
    if key not in _DEVICE_BEAM_CACHE:
        _DEVICE_BEAM_CACHE[key] = _device_beam_program(T, V, K, blank_id, order, use_lm, use_lexicon, word_cfg, unroll)
    prog = _DEVICE_BEAM_CACHE[key]
    aux = {}
    if use_lm:
        aux["char_lm"] = _cached_device(
            (lm_table,), ("char", float(lm_alpha)),
            lambda: jnp.asarray(lm_table) * jnp.float32(LOG10) * lm_alpha,  # natural log, weighted
        )
    if use_lexicon:
        aux.update(_cached_device(
            (lexicon_tables,), "lex",
            lambda: {"lex_trans": jnp.asarray(lexicon_tables[0]),
                     "lex_accept": jnp.asarray(lexicon_tables[1])},
        ))
    if word_lm is not None:
        aux.update(_cached_device(
            (word_lm, lexicon_tables), ("wlm", float(lm_alpha), float(lm_beta)),
            lambda: _prepare_word_lm_aux(word_lm, lexicon_tables, lm_alpha, lm_beta),
        ))
    best, srcs, toks = prog(log_probs, frame_lengths, aux)
    handle = _AsyncBeamResult(best, srcs, toks, frame_lengths)
    return handle if return_async else handle.result()


class _AsyncBeamResult:
    """Deferred beam result: holds device arrays; .result() fetches and
    backtraces. Lets decode of batch n+1 overlap the host work of batch n."""

    def __init__(self, best, srcs, toks, frame_lengths):
        self._args = (best, srcs, toks, frame_lengths)

    def result(self):
        best, srcs, toks, frame_lengths = self._args
        return _backtrace(np.asarray(best), np.asarray(srcs), np.asarray(toks), np.asarray(frame_lengths))


def _backtrace(best, srcs, toks, lengths):
    """Vectorized host backtrace through (T, B, K) parent pointers: one
    numpy step per frame over the whole batch (the per-(b, t) Python loop
    was ~16k iterations per 32x10s batch)."""
    T, B, K = srcs.shape
    bidx = np.arange(B)
    k = best.astype(np.int64)
    emitted = np.full((B, T), -1, np.int32)
    for t in range(T - 1, -1, -1):
        valid = t < lengths
        emitted[:, t] = np.where(valid, toks[t, bidx, k], -1)
        k = np.where(valid, srcs[t, bidx, k], k)
    out = np.full((B, T), -1, np.int32)
    out_lens = np.zeros((B,), np.int32)
    for b in range(B):
        seq = emitted[b][emitted[b] >= 0]
        out[b, : len(seq)] = seq
        out_lens[b] = len(seq)
    return out, out_lens


def decode_beam_to_text(tokens, lengths, tokenizer):
    return [tokenizer.decode(tokens[b, : lengths[b]]) for b in range(tokens.shape[0])]
