"""Whisper encoder-decoder in pure JAX.

TPU-native re-implementation of the Whisper architecture used by the
reference's whisper/transformers backends (ssak/infer/whisper_infer.py,
whisper_infer_v2.py): conv-downsampled mel encoder + autoregressive text
decoder.  Decode runs as a lax.scan over a static token budget with a
preallocated KV cache (static shapes, one compilation), instead of the
reference's eager per-token loop inside openai-whisper.

Weights import from HF/openai checkpoints via ssak_tpu.models.hf_loader
(same capability as reference hf_to_whisper_states:196, in reverse).
"""

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ssak_tpu.models import layers as L


@dataclass(frozen=True)
class WhisperConfig:
    n_mels: int = 80
    n_audio_ctx: int = 1500
    n_audio_state: int = 384
    n_audio_head: int = 6
    n_audio_layer: int = 4
    n_vocab: int = 51865
    n_text_ctx: int = 448
    n_text_state: int = 384
    n_text_head: int = 6
    n_text_layer: int = 4
    # special tokens (multilingual vocab defaults)
    sot: int = 50258
    eot: int = 50257
    no_timestamps: int = 50363
    sot_prev: int = 50361
    no_speech: int = 50362
    timestamp_begin: int = 50364
    dtype: str = "bfloat16"
    # rematerialize each transformer block in the backward pass (trades
    # ~1/3 more FLOPs for O(layers) less activation HBM — how large-v3
    # training fits on one chip)
    remat: bool = False
    # int8-quantize the precomputed cross-attention K/V: they are re-read
    # whole every token step (5.9 GB/step at large-v3 B=24 — the dominant
    # decode HBM term), and the attention dots run as native int8 MXU ops
    # at 2.4x the bf16 rate (layers.decode_attention_int8)
    kv_int8: bool = False

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


PRESETS = {
    "tiny": dict(n_audio_state=384, n_audio_head=6, n_audio_layer=4, n_text_state=384, n_text_head=6, n_text_layer=4),
    "base": dict(n_audio_state=512, n_audio_head=8, n_audio_layer=6, n_text_state=512, n_text_head=8, n_text_layer=6),
    "small": dict(n_audio_state=768, n_audio_head=12, n_audio_layer=12, n_text_state=768, n_text_head=12, n_text_layer=12),
    "medium": dict(n_audio_state=1024, n_audio_head=16, n_audio_layer=24, n_text_state=1024, n_text_head=16, n_text_layer=24),
    "large-v2": dict(n_audio_state=1280, n_audio_head=20, n_audio_layer=32, n_text_state=1280, n_text_head=20, n_text_layer=32),
    "large-v3": dict(n_audio_state=1280, n_audio_head=20, n_audio_layer=32, n_text_state=1280, n_text_head=20, n_text_layer=32, n_mels=128, n_vocab=51866),
    # seeded micro-config for tests (no pretrained weights needed)
    "tiny_test": dict(n_audio_state=64, n_audio_head=2, n_audio_layer=2, n_text_state=64, n_text_head=2, n_text_layer=2, n_vocab=128, n_audio_ctx=100, n_text_ctx=32, n_mels=80, sot=1, eot=2, no_timestamps=3, sot_prev=4, no_speech=5, timestamp_begin=100),
}


def make_config(name: str = "tiny", **overrides) -> WhisperConfig:
    kw = dict(PRESETS[name])
    kw.update(overrides)
    return WhisperConfig(**kw)


# --- parameters -----------------------------------------------------------


def _block_init(key, d, cross: bool):
    ks = jax.random.split(key, 10)
    p = {
        "attn_ln": L.ln_init(d),
        "attn": {
            "query": L.linear_init(ks[0], d, d),
            "key": L.linear_init(ks[1], d, d, bias=False),
            "value": L.linear_init(ks[2], d, d),
            "out": L.linear_init(ks[3], d, d),
        },
        "mlp_ln": L.ln_init(d),
        "mlp": {"fc1": L.linear_init(ks[4], d, 4 * d), "fc2": L.linear_init(ks[5], 4 * d, d)},
    }
    if cross:
        p["cross_attn_ln"] = L.ln_init(d)
        p["cross_attn"] = {
            "query": L.linear_init(ks[6], d, d),
            "key": L.linear_init(ks[7], d, d, bias=False),
            "value": L.linear_init(ks[8], d, d),
            "out": L.linear_init(ks[9], d, d),
        }
    return p


def init_params(key, cfg: WhisperConfig):
    ks = jax.random.split(key, 6 + cfg.n_audio_layer + cfg.n_text_layer)
    d_a, d_t = cfg.n_audio_state, cfg.n_text_state
    params = {
        "encoder": {
            "conv1": L.conv_init(ks[0], 3, cfg.n_mels, d_a),
            "conv2": L.conv_init(ks[1], 3, d_a, d_a),
            "blocks": [_block_init(ks[6 + i], d_a, cross=False) for i in range(cfg.n_audio_layer)],
            "ln_post": L.ln_init(d_a),
        },
        "decoder": {
            "token_embedding": jax.random.normal(ks[2], (cfg.n_vocab, d_t), jnp.float32) * 0.02,
            "positional_embedding": jax.random.normal(ks[3], (cfg.n_text_ctx, d_t), jnp.float32) * 0.01,
            "blocks": [_block_init(ks[6 + cfg.n_audio_layer + i], d_t, cross=True) for i in range(cfg.n_text_layer)],
            "ln": L.ln_init(d_t),
        },
    }
    return params


# --- forward --------------------------------------------------------------


def encode(params, mel, cfg: WhisperConfig):
    """mel: (B, n_mels, T_frames) -> (B, T_frames//2, D)."""
    dt = cfg.compute_dtype
    x = mel.swapaxes(-2, -1)  # (B, T, n_mels)
    x = L.gelu(L.conv1d(x, params["encoder"]["conv1"], stride=1, padding=(1, 1), dtype=dt))
    x = L.gelu(L.conv1d(x, params["encoder"]["conv2"], stride=2, padding=(1, 1), dtype=dt))
    T = x.shape[1]
    pos = L.sinusoid_position_embedding(cfg.n_audio_ctx, cfg.n_audio_state)
    x = x + jnp.asarray(pos)[:T]

    def block(blk, x):
        h, _ = L.mha(L.layer_norm(x, blk["attn_ln"]), blk["attn"], cfg.n_audio_head, dtype=dt)
        x = x + h
        return x + L.mlp(L.layer_norm(x, blk["mlp_ln"]), blk["mlp"], dtype=dt)

    if cfg.remat:
        block = jax.checkpoint(block)
    for blk in params["encoder"]["blocks"]:
        x = block(blk, x)
    return L.layer_norm(x, params["encoder"]["ln_post"])


def decode_train(params, tokens, audio_features, cfg: WhisperConfig):
    """Teacher-forced decoder: tokens (B, U) -> logits (B, U, V)."""
    dt = cfg.compute_dtype
    dec = params["decoder"]
    U = tokens.shape[1]
    x = dec["token_embedding"][tokens] + dec["positional_embedding"][:U]
    mask = L.causal_mask(U, U)

    def block(blk, x, audio_features):
        h, _ = L.mha(L.layer_norm(x, blk["attn_ln"]), blk["attn"], cfg.n_text_head, mask=mask, dtype=dt)
        x = x + h
        h, _ = L.mha(L.layer_norm(x, blk["cross_attn_ln"]), blk["cross_attn"], cfg.n_text_head, kv_x=audio_features, dtype=dt)
        x = x + h
        return x + L.mlp(L.layer_norm(x, blk["mlp_ln"]), blk["mlp"], dtype=dt)

    if cfg.remat:
        block = jax.checkpoint(block)
    for blk in dec["blocks"]:
        x = block(blk, x, audio_features)
    x = L.layer_norm(x, dec["ln"])
    logits = jnp.matmul(x.astype(dt), dec["token_embedding"].T.astype(dt), preferred_element_type=jnp.float32)
    return logits.astype(jnp.float32)


def fuse_decode_qkv(params):
    """Load-time decode optimization: fuse each DECODER block's self-
    attention q/k/v projections into one (D, 3D) matmul
    (layers.fuse_qkv_params). Cross-attention stays split (its K/V are
    precomputed per utterance, only q runs per step) and the encoder is
    untouched. Apply before quantize/shard; skipped dicts (LoRA/quantized)
    pass through unchanged."""
    out = dict(params)
    dec = dict(params["decoder"])
    dec["blocks"] = [
        {**blk, "attn": L.fuse_qkv_params(blk["attn"])} for blk in params["decoder"]["blocks"]
    ]
    out["decoder"] = dec
    return out


def stack_decoder_blocks(params):
    """Load-time decode optimization: stack the decoder's per-layer block
    dicts into ONE pytree whose leaves carry a leading layer axis, so the
    cached decode step runs as a lax.scan over layers instead of a
    32x-unrolled Python loop. The traced/compiled HLO shrinks ~n_layers x —
    which is what the remote TPU compile helper chokes on for big decode
    programs (PERF.md "int4 decode": B>=40 crashes/hangs are program-SIZE
    failures, not memory). Apply AFTER fuse_decode_qkv/quantize (both keep
    the block structure homogeneous across layers) and NOT under TP (the
    megatron sharding rules address blocks by per-layer path). Opt-in via
    SSAK_SCAN_LAYERS=1 in whisper_infer."""
    blocks = params["decoder"]["blocks"]
    if isinstance(blocks, dict):  # already stacked
        return params
    out = dict(params)
    dec = dict(params["decoder"])
    dec["blocks"] = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    out["decoder"] = dec
    return out


def _decode_layer(blk, cache, cross_kv, x, attn_bounds, cache_index, cfg: WhisperConfig):
    """One decoder layer of a cached decode step (shared by the unrolled
    and the layer-scanned formulations)."""
    dt = cfg.compute_dtype
    h, self_c = L.mha(
        L.layer_norm(x, blk["attn_ln"]), blk["attn"], cfg.n_text_head,
        attn_bounds=attn_bounds, cache=cache, cache_index=cache_index, dtype=dt,
    )
    x = x + h
    xq = L.layer_norm(x, blk["cross_attn_ln"])
    q = L.split_heads(L.dense(xq, blk["cross_attn"]["query"], dt), cfg.n_text_head)
    y = _cross_attention(q, cross_kv, dt)
    x = x + L.dense(L.merge_heads(y), blk["cross_attn"]["out"], dt)
    x = x + L.mlp(L.layer_norm(x, blk["mlp_ln"]), blk["mlp"], dtype=dt)
    return x, self_c


def _decode_layers(dec, x, caches, cross_kvs, attn_bounds, cache_index, cfg: WhisperConfig):
    """Run all decoder layers: Python loop over list-of-blocks params, or a
    single lax.scan over layer-stacked params (stack_decoder_blocks)."""
    blocks = dec["blocks"]
    if isinstance(blocks, dict):
        def body(x, inp):
            blk, cache, ckv = inp
            return _decode_layer(blk, cache, ckv, x, attn_bounds, cache_index, cfg)

        return jax.lax.scan(body, x, (blocks, caches, cross_kvs))
    new_caches = []
    for blk, cache, cross_kv in zip(blocks, caches, cross_kvs):
        x, self_c = _decode_layer(blk, cache, cross_kv, x, attn_bounds, cache_index, cfg)
        new_caches.append(self_c)
    return x, new_caches


def _stacked(params) -> bool:
    return isinstance(params["decoder"]["blocks"], dict)


def precompute_cross_kv(params, audio_features, cfg: WhisperConfig):
    """Cross-attention K/V are decode-invariant: compute once per utterance
    instead of per token (the reference's openai-whisper does this with
    forward hooks; here it is just a pass over blocks).

    Stored in the decode-cache layout (B, H, Dh, T_audio) — near-pad-free
    in TPU HBM (only T tiles to 128 lanes, ~2%; the naive (B, T, H, Dh)
    pads 2.4x at large-v3's (20, 64)) and already the dot operand layout
    for both attention contractions, so the buffers stream straight into
    the MXU each decode step with no transposition/copy (see
    layers.decode_attention). This is what lets batch-32 large-v3 decode
    fit and run bandwidth-bound on one v5e chip."""
    dt = cfg.compute_dtype

    def one(cblk):
        k = L.to_decode_kv(L.dense(audio_features, cblk["key"], dt), cfg.n_text_head)
        v = L.to_decode_kv(L.dense(audio_features, cblk["value"], dt), cfg.n_text_head)
        return L.quantize_decode_kv(k, v) if cfg.kv_int8 else {"k": k, "v": v}

    blocks = params["decoder"]["blocks"]
    if isinstance(blocks, dict):  # layer-stacked (stack_decoder_blocks):
        # scan over the stacked cross-attn params -> stacked (L, ...) K/V
        _, out = jax.lax.scan(lambda c, cblk: (c, one(cblk)), None, blocks["cross_attn"])
        return out
    return [one(blk["cross_attn"]) for blk in blocks]


def _cross_attention(q, cross_kv, dt):
    """Full-window cross attention as a bounded decode step (lo=0,
    hi=T-1): on TPU this is ONE fused flash-decode kernel per (b, h)
    streaming the (possibly int8) K/V — see layers.decode_attention_bounded."""
    T = (cross_kv["k8"] if "k8" in cross_kv else cross_kv["k"]).shape[-1]
    return L.decode_attention_bounded(q, cross_kv, 0, T - 1, dtype=dt)


def _decode_step(params, token, pos, caches, cross_kvs, cfg: WhisperConfig):
    """One cached decoder step. token: (B, 1). caches: list per block of
    {k, v} self-attention caches with static max length n_text_ctx."""
    dt = cfg.compute_dtype
    dec = params["decoder"]
    x = dec["token_embedding"][token] + jax.lax.dynamic_slice_in_dim(dec["positional_embedding"], pos, 1, axis=0)
    x, new_caches = _decode_layers(dec, x, caches, cross_kvs, (0, pos), pos, cfg)
    x = L.layer_norm(x, dec["ln"])
    logits = jnp.matmul(x.astype(dt), dec["token_embedding"].T.astype(dt), preferred_element_type=jnp.float32)
    return logits.astype(jnp.float32)[:, 0], new_caches


def init_cache(cfg: WhisperConfig, batch: int, stacked: bool = False):
    """Self-attention KV cache in the decode-cache layout (B, H, Dh, L),
    compute dtype (bf16 on TPU) — near-pad-free and dot-operand-native;
    see layers.decode_attention / precompute_cross_kv. stacked=True (for
    layer-scanned params, stack_decoder_blocks) returns one pytree with a
    leading layer axis instead of a per-layer list."""
    Dh = cfg.n_text_state // cfg.n_text_head

    def empty():
        if cfg.kv_int8:
            return L.init_int8_cache(batch, cfg.n_text_head, Dh, cfg.n_text_ctx)
        return {
            "k": jnp.zeros((batch, cfg.n_text_head, Dh, cfg.n_text_ctx), cfg.compute_dtype),
            "v": jnp.zeros((batch, cfg.n_text_head, Dh, cfg.n_text_ctx), cfg.compute_dtype),
        }

    if stacked:
        return jax.tree_util.tree_map(
            lambda a: jnp.zeros((cfg.n_text_layer,) + a.shape, a.dtype), empty()
        )
    return [empty() for _ in range(cfg.n_text_layer)]


def greedy_decode(params, mel, cfg: WhisperConfig, prompt, max_tokens: int = None, suppress_blank: bool = True):
    """Batched greedy decode. mel: (B, n_mels, T). prompt: list/array of
    forced initial tokens (e.g. [sot, lang, task, no_timestamps]).

    Returns (tokens (B, max_tokens) int32, lengths (B,)) where tokens hold
    generated ids after the prompt, padded with eot.
    """
    B = mel.shape[0]
    max_tokens = max_tokens or (cfg.n_text_ctx - len(prompt) - 1)
    audio_features = encode(params, mel, cfg)
    cross_kvs = precompute_cross_kv(params, audio_features, cfg)
    caches = init_cache(cfg, B, stacked=_stacked(params))

    # teacher-force the prompt through the cache
    logits = None
    for i, tok in enumerate(prompt):
        token = jnp.full((B, 1), int(tok), jnp.int32)
        logits, caches = _decode_step(params, token, i, caches, cross_kvs, cfg)

    def step(carry, i):
        token, caches, done = carry
        logits, new_caches = _decode_step(params, token, len(prompt) + i - 1, caches, cross_kvs, cfg)
        next_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        next_tok = jnp.where(done, cfg.eot, next_tok)
        done = done | (next_tok == cfg.eot)
        return (next_tok[:, None], new_caches, done), next_tok

    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    done0 = first == cfg.eot
    carry = (first[:, None], caches, done0)
    if max_tokens > 1:
        carry, rest = jax.lax.scan(step, carry, jnp.arange(1, max_tokens))
        tokens = jnp.concatenate([first[:, None], rest.T], axis=1)
    else:
        tokens = first[:, None]
    lengths = jnp.sum(tokens != cfg.eot, axis=1)
    return tokens, lengths


def _tile_rows(tree, n: int, axis: int = 0):
    """Repeat every leaf n times along the batch axis (row b -> rows
    b*n..b*n+n-1). axis=1 for layer-stacked cache/cross-KV pytrees, whose
    leading axis is the layer."""
    return jax.tree_util.tree_map(lambda x: jnp.repeat(x, n, axis=axis), tree)


def _best_of_select(tokens, lengths, sum_logprob, B: int, best_of: int):
    """(B*best_of, ...) candidates -> per-utterance best by avg logprob
    (openai-whisper MaximumLikelihoodRanker: sum_logprob / (length + 1))."""
    L = tokens.shape[1]
    tokens = tokens.reshape(B, best_of, L)
    lengths = lengths.reshape(B, best_of)
    sum_logprob = sum_logprob.reshape(B, best_of)
    avg = sum_logprob / (lengths.astype(jnp.float32) + 1.0)
    best = jnp.argmax(avg, axis=1)  # (B,)
    take = lambda x: jnp.take_along_axis(x, best.reshape(B, *([1] * (x.ndim - 1))), axis=1)
    return take(tokens)[:, 0], take(lengths)[:, 0], take(sum_logprob)[:, 0]


def sample_decode(params, mel, cfg: WhisperConfig, prompt, key, temperature: float = 1.0, max_tokens: int = None, best_of: int = 1):
    """Temperature sampling decode (used by the temperature-fallback chain,
    reference whisper_infer.py accurate preset / openai-whisper semantics).

    best_of > 1 draws that many independent candidates per utterance and
    keeps the highest-average-logprob one (reference whisper_infer.py:24
    `best_of`, :319-322 `--accurate` => best_of=5). The encoder pass and the
    prompt teacher-forcing run ONCE per utterance; only the sampling scan is
    tiled to B*best_of rows (candidates share the cross-attention K/V).

    Returns (tokens, lengths, sum_logprob (B,))."""
    B = mel.shape[0]
    max_tokens = max_tokens or (cfg.n_text_ctx - len(prompt) - 1)
    audio_features = encode(params, mel, cfg)
    cross_kvs = precompute_cross_kv(params, audio_features, cfg)
    caches = init_cache(cfg, B, stacked=_stacked(params))

    logits = None
    for i, tok in enumerate(prompt):
        token = jnp.full((B, 1), int(tok), jnp.int32)
        logits, caches = _decode_step(params, token, i, caches, cross_kvs, cfg)

    n = best_of if temperature > 0 else 1
    if n > 1:
        logits = jnp.repeat(logits, n, axis=0)
        bax = 1 if _stacked(params) else 0
        caches = _tile_rows(caches, n, axis=bax)
        cross_kvs = _tile_rows(cross_kvs, n, axis=bax)
    Bn = B * n

    def pick(logits, k):
        logp = jax.nn.log_softmax(logits, axis=-1)
        if temperature > 0:
            tok = jax.random.categorical(k, logits / temperature, axis=-1).astype(jnp.int32)
        else:
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return tok, jnp.take_along_axis(logp, tok[:, None], axis=1)[:, 0]

    k0, key = jax.random.split(key)
    first, lp0 = pick(logits, k0)
    done0 = first == cfg.eot

    def step(carry, inp):
        token, caches, done, acc = carry
        i, k = inp
        logits, new_caches = _decode_step(params, token, len(prompt) + i - 1, caches, cross_kvs, cfg)
        next_tok, lp = pick(logits, k)
        next_tok = jnp.where(done, cfg.eot, next_tok)
        acc = acc + jnp.where(done, 0.0, lp)
        done = done | (next_tok == cfg.eot)
        return (next_tok[:, None], new_caches, done, acc), next_tok

    keys = jax.random.split(key, max(1, max_tokens - 1))
    carry = (first[:, None], caches, done0, lp0)
    if max_tokens > 1:
        carry, rest = jax.lax.scan(step, carry, (jnp.arange(1, max_tokens), keys))
        tokens = jnp.concatenate([first[:, None], rest.T], axis=1)
    else:
        tokens = first[:, None]
    sum_logprob = carry[3]
    lengths = jnp.sum(tokens != cfg.eot, axis=1)
    if n > 1:
        tokens, lengths, sum_logprob = _best_of_select(tokens, lengths, sum_logprob, B, n)
    return tokens, lengths, sum_logprob


def beam_decode(params, mel, cfg: WhisperConfig, prompt, beam_size: int = 5, max_tokens: int = None, length_penalty: float = None):
    """Batched beam-search decode. Beams are folded into the batch dim so
    the cached decode step stays one compiled program; returns the best
    beam per utterance ((B, L) tokens, lengths, scores).

    Replaces the reference's openai-whisper BeamSearchDecoder
    (whisper_infer.py beam_size option) with an on-device scan.
    """
    B = mel.shape[0]
    K = beam_size
    max_tokens = max_tokens or (cfg.n_text_ctx - len(prompt) - 1)
    audio_features = encode(params, mel, cfg)
    # expand to (B*K, ...)
    af = jnp.repeat(audio_features, K, axis=0)
    cross_kvs = precompute_cross_kv(params, af, cfg)
    caches = init_cache(cfg, B * K, stacked=_stacked(params))

    logits = None
    for i, tok in enumerate(prompt):
        token = jnp.full((B * K, 1), int(tok), jnp.int32)
        logits, caches = _decode_step(params, token, i, caches, cross_kvs, cfg)

    logp = jax.nn.log_softmax(logits.reshape(B, K, -1), axis=-1)  # (B, K, V)
    V = logp.shape[-1]
    # initialize: only beam 0 is live
    init_scores = jnp.where(jnp.arange(K)[None, :] == 0, 0.0, -1e30) + 0.0
    first_scores, first_tokens = jax.lax.top_k(logp[:, 0, :], K)  # (B, K)
    scores = first_scores
    tokens_hist = jnp.full((B, K, max_tokens), cfg.eot, jnp.int32)
    tokens_hist = tokens_hist.at[:, :, 0].set(first_tokens)
    finished = first_tokens == cfg.eot

    def step(carry, i):
        scores, tokens_hist, finished, caches = carry
        last = tokens_hist[:, :, i - 1]
        token = last.reshape(B * K, 1)
        logits, new_caches = _decode_step(params, token, len(prompt) + i - 1, caches, cross_kvs, cfg)
        logp = jax.nn.log_softmax(logits.reshape(B, K, V), axis=-1)
        # finished beams only extend with EOT at no cost
        eot_only = jnp.where(jnp.arange(V)[None, None, :] == cfg.eot, 0.0, -1e30)
        logp = jnp.where(finished[..., None], eot_only, logp)
        cand = scores[..., None] + logp  # (B, K, V)
        flat = cand.reshape(B, K * V)
        new_scores, idx = jax.lax.top_k(flat, K)
        src_beam = idx // V
        new_tok = (idx % V).astype(jnp.int32)
        # reorder histories and caches by src_beam
        tokens_hist = jnp.take_along_axis(tokens_hist, src_beam[..., None], axis=1)
        tokens_hist = tokens_hist.at[:, :, i].set(new_tok)
        finished = jnp.take_along_axis(finished, src_beam, axis=1) | (new_tok == cfg.eot)
        gather = (src_beam + jnp.arange(B)[:, None] * K).reshape(-1)
        if _stacked(params):  # leading axis is the layer; batch is axis 1
            new_caches = jax.tree_util.tree_map(lambda c: c[:, gather], new_caches)
        else:
            new_caches = jax.tree_util.tree_map(lambda c: c[gather], new_caches)
        return (new_scores, tokens_hist, finished, new_caches), None

    carry = (scores, tokens_hist, finished, caches)
    if max_tokens > 1:
        carry, _ = jax.lax.scan(step, carry, jnp.arange(1, max_tokens))
    scores, tokens_hist, finished, _ = carry
    lengths = jnp.sum(tokens_hist != cfg.eot, axis=2)  # (B, K)
    norm = lengths.astype(jnp.float32) + 1.0 if length_penalty is None else ((5.0 + lengths.astype(jnp.float32)) / 6.0) ** length_penalty
    best = jnp.argmax(scores / norm, axis=1)  # (B,)
    tokens = jnp.take_along_axis(tokens_hist, best[:, None, None], axis=1)[:, 0]
    return tokens, jnp.take_along_axis(lengths, best[:, None], axis=1)[:, 0], jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]


# --- long-form window decode (openai-whisper transcribe-loop semantics) ----


def _decode_step_padded(params, token, pos_idx, slot, pad_len, caches, cross_kvs, cfg: WhisperConfig):
    """Cached decoder step with per-utterance positions and left-padding.

    Supports right-aligned prompts of varying true length inside ONE static
    buffer: token (B, 1) is written at cache slot `slot` (scalar); its
    positional-embedding index is `pos_idx` (B,) (= slot - pad_len, i.e. the
    utterance-local position); attention masks out the `pad_len` (B,) unused
    left slots. Counterpart of the reference's variable-length
    condition_on_previous_text prompts (ssak/infer/whisper_infer.py:82 via
    openai-whisper transcribe), restructured so every window reuses one
    compiled program regardless of prompt length.
    """
    dt = cfg.compute_dtype
    dec = params["decoder"]
    pos_emb = dec["positional_embedding"][jnp.clip(pos_idx, 0, cfg.n_text_ctx - 1)][:, None, :]
    x = dec["token_embedding"][token] + pos_emb
    x, new_caches = _decode_layers(dec, x, caches, cross_kvs, (pad_len, slot), slot, cfg)
    x = L.layer_norm(x, dec["ln"])
    logits = jnp.matmul(x.astype(dt), dec["token_embedding"].T.astype(dt), preferred_element_type=jnp.float32)
    return logits.astype(jnp.float32)[:, 0], new_caches


_NEG = -1e30


def _apply_decode_rules(
    logits, cfg: WhisperConfig, *, with_timestamps: bool, is_first: bool,
    last_was_ts=None, penult_was_ts=None, max_ts=None,
    max_initial_timestamp_index: int = 50,
):
    """Vectorized openai-whisper logit filters (SuppressTokens +
    ApplyTimestampRules), per batch row. All state args are (B,) arrays."""
    V = logits.shape[-1]
    ids = jnp.arange(V)
    # always-suppressed specials (the reference relies on openai-whisper's
    # SuppressTokens list; these are the structural ones)
    for t in (cfg.sot, cfg.sot_prev, cfg.no_speech, cfg.no_timestamps):
        if t < V:
            logits = logits.at[:, t].set(_NEG)
    is_ts = ids >= cfg.timestamp_begin  # (V,)
    if not with_timestamps:
        return jnp.where(is_ts[None, :], _NEG, logits)

    text_tok = (~is_ts) & (ids != cfg.eot)
    if is_first:
        # first sampled token must be a timestamp, capped at
        # max_initial_timestamp (openai transcribe default 1.0 s -> idx 50)
        logits = jnp.where(~is_ts[None, :], _NEG, logits)
        last_allowed = cfg.timestamp_begin + max_initial_timestamp_index
        logits = jnp.where(ids[None, :] > last_allowed, _NEG, logits)
    else:
        # timestamps come in pairs: after <ts><ts> force text; after a single
        # <ts> force timestamp-or-eot
        pair_done = last_was_ts & penult_was_ts
        pair_open = last_was_ts & ~penult_was_ts
        logits = jnp.where(pair_done[:, None] & is_ts[None, :], _NEG, logits)
        logits = jnp.where(pair_open[:, None] & text_tok[None, :], _NEG, logits)
        # monotonic timestamps: when closing a pair the end may equal the
        # start; otherwise the next timestamp must strictly increase
        min_allowed = max_ts + jnp.where(pair_open, 0, 1)
        ts_offset = ids - cfg.timestamp_begin
        logits = jnp.where(is_ts[None, :] & (ts_offset[None, :] < min_allowed[:, None]), _NEG, logits)
    # if the total timestamp probability outweighs any single text token,
    # the sample must be a timestamp
    logp = jax.nn.log_softmax(logits, axis=-1)
    ts_logprob = jax.scipy.special.logsumexp(jnp.where(is_ts[None, :], logp, _NEG), axis=-1)
    max_text = jnp.max(jnp.where(is_ts[None, :], _NEG, logp), axis=-1)
    force_ts = ts_logprob > max_text
    logits = jnp.where(force_ts[:, None] & ~is_ts[None, :], _NEG, logits)
    return logits


def decode_window(
    params, mel, prompt, prompt_len, cfg: WhisperConfig, *,
    sot_distance: int, max_tokens: int, with_timestamps: bool = False,
    temperature: float = 0.0, key=None, max_initial_timestamp_index: int = 50,
    best_of: int = 1,
):
    """Full-fidelity single-window decode: the device half of the
    openai-whisper transcribe loop the reference drives
    (ssak/infer/whisper_infer.py:79-82, :314-332).

    mel: (B, n_mels, T). prompt: (B, P) int32, RIGHT-aligned (slots
    [P-prompt_len[b], P) hold [<sot_prev> prev-text...] + sot_sequence, left
    slots are ignored padding). sot_distance: distance of the <sot> token
    from the buffer end (= len(sot_sequence)) — logits at that slot give the
    no-speech probability probe. One compiled program serves every window
    and every prompt length.

    Returns (tokens (B, max_tokens), lengths, sum_logprob, no_speech_prob):
    tokens are the generated ids (timestamp tokens included when
    with_timestamps), eot-padded.
    """
    B, P = prompt.shape
    assert P + max_tokens <= cfg.n_text_ctx, "prompt buffer + budget exceeds text context"
    pad_len = (P - prompt_len).astype(jnp.int32)  # (B,)
    audio_features = encode(params, mel, cfg)
    cross_kvs = precompute_cross_kv(params, audio_features, cfg)
    caches = init_cache(cfg, B, stacked=_stacked(params))

    # teacher-force the padded prompt through the cache as a scan; probe the
    # no-speech logits where <sot> sits (fixed slot: prompts are right-aligned)
    sot_slot = P - sot_distance

    def prompt_step(carry, j):
        caches, probe, _last = carry
        token = jax.lax.dynamic_slice_in_dim(prompt, j, 1, axis=1)
        logits, caches = _decode_step_padded(params, token, j - pad_len, j, pad_len, caches, cross_kvs, cfg)
        probe = jnp.where(j == sot_slot, logits, probe)
        return (caches, probe, logits), None

    zeros = jnp.zeros((B, cfg.n_vocab), jnp.float32)
    (caches, probe_logits, last_logits), _ = jax.lax.scan(
        prompt_step, (caches, zeros, zeros), jnp.arange(P)
    )
    no_speech_prob = jax.nn.softmax(probe_logits, axis=-1)[:, cfg.no_speech]

    # best_of candidates (reference whisper_infer.py:24): encoder + prompt
    # forcing ran once; tile only the sampling scan's state. The probe is
    # deterministic, so no_speech_prob stays per-utterance.
    n = best_of if temperature > 0 else 1
    if n > 1:
        bax = 1 if _stacked(params) else 0
        caches = _tile_rows(caches, n, axis=bax)
        cross_kvs = _tile_rows(cross_kvs, n, axis=bax)
        last_logits = jnp.repeat(last_logits, n, axis=0)
        pad_len = jnp.repeat(pad_len, n, axis=0)
    Bn = B * n

    def pick(logits, k):
        logp = jax.nn.log_softmax(logits, axis=-1)
        if temperature > 0:
            tok = jax.random.categorical(k, logits / temperature, axis=-1).astype(jnp.int32)
        else:
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return tok, jnp.take_along_axis(logp, tok[:, None], axis=1)[:, 0]

    if key is None:
        key = jax.random.PRNGKey(0)
    false = jnp.zeros((Bn,), bool)
    first_logits = _apply_decode_rules(
        last_logits, cfg, with_timestamps=with_timestamps, is_first=True,
        max_initial_timestamp_index=max_initial_timestamp_index,
    )
    k0, key = jax.random.split(key)
    first, lp0 = pick(first_logits, k0)
    done0 = first == cfg.eot
    first_is_ts = (first >= cfg.timestamp_begin) & ~done0
    # openai semantics: with <2 sampled tokens the penultimate counts as a
    # timestamp, so the token right after the initial <ts> is forced to text
    state0 = dict(
        last_was_ts=first_is_ts,
        penult_was_ts=~false,
        max_ts=jnp.where(first_is_ts, first - cfg.timestamp_begin, 0).astype(jnp.int32),
    )

    def step(carry, inp):
        token, caches, done, acc, st = carry
        i, k = inp
        slot = P + i - 1
        logits, new_caches = _decode_step_padded(
            params, token, slot - pad_len, slot, pad_len, caches, cross_kvs, cfg
        )
        logits = _apply_decode_rules(
            logits, cfg, with_timestamps=with_timestamps, is_first=False,
            last_was_ts=st["last_was_ts"], penult_was_ts=st["penult_was_ts"], max_ts=st["max_ts"],
        )
        next_tok, lp = pick(logits, k)
        next_tok = jnp.where(done, cfg.eot, next_tok)
        acc = acc + jnp.where(done, 0.0, lp)
        tok_is_ts = (next_tok >= cfg.timestamp_begin) & ~done
        new_st = dict(
            last_was_ts=tok_is_ts,
            penult_was_ts=st["last_was_ts"] & ~done,
            max_ts=jnp.where(tok_is_ts, next_tok - cfg.timestamp_begin, st["max_ts"]).astype(jnp.int32),
        )
        done = done | (next_tok == cfg.eot)
        return (next_tok[:, None], new_caches, done, acc, new_st), next_tok

    carry = (first[:, None], caches, done0, lp0, state0)
    if max_tokens > 1:
        keys = jax.random.split(key, max_tokens - 1)
        carry, rest = jax.lax.scan(step, carry, (jnp.arange(1, max_tokens), keys))
        tokens = jnp.concatenate([first[:, None], rest.T], axis=1)
    else:
        tokens = first[:, None]
    sum_logprob = carry[3]
    lengths = jnp.sum(tokens != cfg.eot, axis=1)
    if n > 1:
        tokens, lengths, sum_logprob = _best_of_select(tokens, lengths, sum_logprob, B, n)
    return tokens, lengths, sum_logprob, no_speech_prob


def cross_entropy_loss(logits, targets, mask):
    """Label-smoothed-free CE for seq2seq training. targets: (B, U)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(1.0, jnp.sum(mask))
