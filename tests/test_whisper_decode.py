"""Whisper beam search + temperature fallback tests (seeded tiny model)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssak_tpu.models import whisper


@pytest.fixture(scope="module")
def model():
    cfg = whisper.make_config("tiny_test")
    params = whisper.init_params(jax.random.PRNGKey(0), cfg)
    return params, cfg


def test_beam1_matches_greedy(model):
    params, cfg = model
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(2, cfg.n_mels, 200).astype(np.float32) * 0.1)
    prompt = [cfg.sot, cfg.no_timestamps]
    gt, gl = whisper.greedy_decode(params, mel, cfg, prompt, max_tokens=6)
    bt, bl, _s = whisper.beam_decode(params, mel, cfg, prompt, beam_size=1, max_tokens=6)
    assert (np.asarray(gt) == np.asarray(bt)).all()


def test_beam_score_at_least_greedy(model):
    """The best beam's sequence logprob must be >= the greedy path's."""
    params, cfg = model
    rng = np.random.RandomState(1)
    mel = jnp.asarray(rng.randn(2, cfg.n_mels, 200).astype(np.float32) * 0.3)
    prompt = [cfg.sot, cfg.no_timestamps]

    def seq_logprob(tokens, lengths):
        # teacher-forced scoring of a decoded sequence
        enc = whisper.encode(params, mel, cfg)
        out = []
        for b in range(tokens.shape[0]):
            seq = [int(t) for t in np.asarray(tokens[b])][: int(lengths[b])]
            inp = jnp.asarray([prompt + seq], jnp.int32)
            logits = whisper.decode_train(params, inp, enc[b : b + 1], cfg)
            lp = jax.nn.log_softmax(logits, -1)
            total = 0.0
            for i, t in enumerate(seq):
                total += float(lp[0, len(prompt) - 1 + i, t])
            out.append(total)
        return out

    gt, gl = whisper.greedy_decode(params, mel, cfg, prompt, max_tokens=5)
    bt, bl, bs = whisper.beam_decode(params, mel, cfg, prompt, beam_size=4, max_tokens=5)
    g_scores = seq_logprob(gt, np.asarray(gl))
    b_scores = seq_logprob(bt, np.asarray(bl))
    for g, b in zip(g_scores, b_scores):
        assert b >= g - 1e-3


def test_sample_decode_deterministic_at_zero_temp(model):
    params, cfg = model
    rng = np.random.RandomState(2)
    mel = jnp.asarray(rng.randn(1, cfg.n_mels, 200).astype(np.float32) * 0.1)
    prompt = [cfg.sot, cfg.no_timestamps]
    t1, l1, lp1 = whisper.sample_decode(params, mel, cfg, prompt, jax.random.PRNGKey(0), temperature=0.0, max_tokens=5)
    gt, gl = whisper.greedy_decode(params, mel, cfg, prompt, max_tokens=5)
    assert (np.asarray(t1) == np.asarray(gt)).all()
    assert float(lp1[0]) <= 0.0


def test_fallback_chain(model):
    from ssak_tpu.infer.general import LoadedModel, ModelType
    from ssak_tpu.infer.whisper_infer import compression_ratio, transcribe_with_fallback

    params, cfg = model
    m = LoadedModel(ModelType.WHISPER, params, cfg, None)
    rng = np.random.RandomState(3)
    mel = jnp.asarray(rng.randn(2, cfg.n_mels, 200).astype(np.float32) * 0.1)
    texts = transcribe_with_fallback(m, mel, [cfg.sot, cfg.no_timestamps], max_tokens=5, beam_size=2)
    assert len(texts) == 2
    assert all(isinstance(t, str) for t in texts)
    # compression ratio sanity
    assert compression_ratio("a a a a a a a a a a a a a a") > compression_ratio("the quick brown fox")


# --- int8 KV decode (layers.decode_attention_int8 / self_attention_int8) --


def test_int8_kv_attention_op_parity():
    """Quantized decode attention matches full-precision within int8 noise."""
    from ssak_tpu.models import layers as L

    rng = np.random.RandomState(0)
    B, H, Dh, T = 2, 4, 64, 96
    q = jnp.asarray(rng.randn(B, 1, H, Dh).astype(np.float32)) * 0.5
    kT = jnp.asarray(rng.randn(B, H, Dh, T).astype(np.float32)) * 0.5
    vT = jnp.asarray(rng.randn(B, H, Dh, T).astype(np.float32)) * 0.5
    ref = L.decode_attention(q, kT, vT, dtype=jnp.float32)
    out = L.decode_attention_int8(q, L.quantize_decode_kv(kT, vT), dtype=jnp.float32)
    assert float(jnp.max(jnp.abs(out - ref))) < 0.05 * float(jnp.max(jnp.abs(ref))) + 1e-3


def test_int8_self_cache_parity():
    """int8 self-attention cache (per-position scales) matches the bf16
    cache path step by step."""
    from ssak_tpu.models import layers as L

    rng = np.random.RandomState(1)
    B, H, Dh, Tctx, D = 2, 2, 32, 8, 64
    key = jax.random.PRNGKey(0)
    params = {
        name: L.linear_init(k, D, D)
        for name, k in zip(["query", "key", "value", "out"], jax.random.split(key, 4))
    }
    cache_f = {
        "k": jnp.zeros((B, H, Dh, Tctx), jnp.float32),
        "v": jnp.zeros((B, H, Dh, Tctx), jnp.float32),
    }
    cache_q = L.init_int8_cache(B, H, Dh, Tctx)
    for pos in range(4):
        x = jnp.asarray(rng.randn(B, 1, D).astype(np.float32)) * 0.3
        kmask = (jnp.arange(Tctx)[None, None, None, :] <= pos)
        yf, cache_f = L.mha(x, params, H, mask=kmask, cache=cache_f, cache_index=pos, dtype=jnp.float32)
        yq, cache_q = L.mha(x, params, H, mask=kmask, cache=cache_q, cache_index=pos, dtype=jnp.float32)
        err = float(jnp.max(jnp.abs(yf - yq)))
        assert err < 0.05 * float(jnp.max(jnp.abs(yf))) + 1e-3, (pos, err)


def test_int8_kv_greedy_and_beam_parity(model):
    """cfg.kv_int8 decode (int8 cross-KV + int8 self cache) produces the
    same tokens as full precision on the tiny model."""
    params, cfg = model
    cfg8 = whisper.make_config("tiny_test", kv_int8=True)
    rng = np.random.RandomState(5)
    mel = jnp.asarray(rng.randn(3, cfg.n_mels, 200).astype(np.float32) * 0.1)
    prompt = [cfg.sot, cfg.no_timestamps]
    t0, l0 = whisper.greedy_decode(params, mel, cfg, prompt, max_tokens=12)
    t8, l8 = whisper.greedy_decode(params, mel, cfg8, prompt, max_tokens=12)
    assert float(jnp.mean((t0 == t8).astype(jnp.float32))) > 0.9
    bt0, bl0, bs0 = whisper.beam_decode(params, mel, cfg, prompt, beam_size=3, max_tokens=8)
    bt8, bl8, bs8 = whisper.beam_decode(params, mel, cfg8, prompt, beam_size=3, max_tokens=8)
    assert float(jnp.mean((bt0 == bt8).astype(jnp.float32))) > 0.9
    assert float(jnp.max(jnp.abs(bs0 - bs8))) < 0.1
