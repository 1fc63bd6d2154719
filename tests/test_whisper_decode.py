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
