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


def test_fallback_retries_only_pending_rows(model, monkeypatch):
    """A retry temperature decodes ONLY the still-pending rows (gathered
    and padded to a power of 2), not the full mel batch — and rows that
    already passed keep their first accepted text (VERDICT r3 weak #3)."""
    import ssak_tpu.infer.whisper_infer as wi
    from ssak_tpu.infer.general import LoadedModel, ModelType

    params, cfg = model
    m = LoadedModel(ModelType.WHISPER, params, cfg, None)
    widths = []
    calls = {"n": 0}

    def fake_jitted_sample(cfg_, prompt_, max_tokens_, temperature_, best_of=1):
        def run(p, mel, k):
            W = mel.shape[0]
            widths.append(W)
            calls["n"] += 1
            tok_val = 5 if calls["n"] == 1 else 7
            tokens = np.full((W, 2), cfg.eot, np.int32)
            tokens[:, 0] = tok_val
            lengths = np.full((W,), 1, np.int32)
            if calls["n"] == 1:
                lp = np.asarray([-0.1, -99.0, -99.0], np.float32)[:W]
            else:
                lp = np.full((W,), -0.1, np.float32)
            return tokens, lengths, lp
        return run

    monkeypatch.setattr(wi, "_jitted_sample", fake_jitted_sample)
    mel = jnp.zeros((3, cfg.n_mels, 200), jnp.float32)
    texts = wi.transcribe_with_fallback(
        m, mel, [cfg.sot, cfg.no_timestamps], max_tokens=2,
        temperatures=(0.0, 0.5), logprob_threshold=-1.0,
    )
    assert widths == [3, 2]  # retry decodes 2 pending rows (pow2 pad), not 3
    assert texts == ["5", "7", "7"]  # row 0 kept its T=0 result


def _avg_logprob(lp, lens):
    return np.asarray(lp) / (np.asarray(lens).astype(np.float32) + 1.0)


def test_best_of_picks_higher_avg_logprob(model):
    """best_of=4 at T=0.8 must select a candidate whose avg logprob beats a
    single draw (reference whisper_infer.py:24 --best_of / --accurate)."""
    params, cfg = model
    rng = np.random.RandomState(4)
    mel = jnp.asarray(rng.randn(2, cfg.n_mels, 200).astype(np.float32) * 0.3)
    prompt = [cfg.sot, cfg.no_timestamps]
    key = jax.random.PRNGKey(7)
    t1, l1, lp1 = whisper.sample_decode(params, mel, cfg, prompt, key, temperature=0.8, max_tokens=8, best_of=1)
    t4, l4, lp4 = whisper.sample_decode(params, mel, cfg, prompt, key, temperature=0.8, max_tokens=8, best_of=4)
    a1, a4 = _avg_logprob(lp1, l1), _avg_logprob(lp4, l4)
    # max over 4 i.i.d. draws dominates one draw on every utterance here
    assert (a4 >= a1 - 1e-6).all(), (a1, a4)
    assert t4.shape == t1.shape and l4.shape == l1.shape


def test_best_of_selection_is_argmax_over_candidates(model):
    """The returned candidate must be the avg-logprob argmax of the exact
    set that an untiled per-candidate run would produce: sampling is
    per-row independent, so running the same key over the tiled batch
    reproduces each candidate row."""
    params, cfg = model
    rng = np.random.RandomState(6)
    mel = jnp.asarray(rng.randn(1, cfg.n_mels, 200).astype(np.float32) * 0.3)
    prompt = [cfg.sot, cfg.no_timestamps]
    key = jax.random.PRNGKey(3)
    n = 3
    tiled = jnp.repeat(mel, n, axis=0)
    tc, lc, lpc = whisper.sample_decode(params, tiled, cfg, prompt, key, temperature=0.8, max_tokens=6, best_of=1)
    tb, lb, lpb = whisper.sample_decode(params, mel, cfg, prompt, key, temperature=0.8, max_tokens=6, best_of=n)
    best = int(np.argmax(_avg_logprob(lpc, lc)))
    assert np.asarray(tb)[0].tolist() == np.asarray(tc)[best].tolist()
    assert float(lpb[0]) == pytest.approx(float(lpc[best]), abs=1e-4)


def test_decode_window_best_of(model):
    """decode_window best_of: shapes stay per-utterance, no_speech_prob is
    unaffected, and T=0 ignores best_of entirely."""
    params, cfg = model
    rng = np.random.RandomState(8)
    mel = jnp.asarray(rng.randn(2, cfg.n_mels, 200).astype(np.float32) * 0.3)
    P = 4
    prompt = np.full((2, P), cfg.eot, np.int32)
    prompt[:, P - 2 :] = [cfg.sot, cfg.no_timestamps]
    plen = jnp.asarray([2, 2], jnp.int32)
    kw = dict(sot_distance=2, max_tokens=6, with_timestamps=False)
    t0, l0, lp0, ns0 = whisper.decode_window(params, mel, jnp.asarray(prompt), plen, cfg, temperature=0.0, best_of=4, **kw)
    t0r, _, _, ns0r = whisper.decode_window(params, mel, jnp.asarray(prompt), plen, cfg, temperature=0.0, **kw)
    assert (np.asarray(t0) == np.asarray(t0r)).all()
    key = jax.random.PRNGKey(11)
    t1, l1, lp1, ns1 = whisper.decode_window(params, mel, jnp.asarray(prompt), plen, cfg, temperature=0.8, key=key, best_of=4, **kw)
    tb, lb, lpb, _ = whisper.decode_window(params, mel, jnp.asarray(prompt), plen, cfg, temperature=0.8, key=key, best_of=1, **kw)
    assert t1.shape == (2, 6) and l1.shape == (2,)
    np.testing.assert_allclose(np.asarray(ns1), np.asarray(ns0), atol=1e-5)
    # best-of-4 dominates a single draw in expectation (the draws are
    # independent of the best_of=1 ones, so compare at the corpus level)
    assert _avg_logprob(lp1, l1).mean() >= _avg_logprob(lpb, lb).mean() - 1e-6


def test_fused_qkv_decode_parity(model):
    """fuse_decode_qkv (load-time (D,3D) projection fusion) must reproduce
    the unfused greedy decode exactly at f32."""
    params, cfg = model
    cfg32 = whisper.make_config("tiny_test", dtype="float32")
    fused = whisper.fuse_decode_qkv(params)
    assert "qkv" in fused["decoder"]["blocks"][0]["attn"]
    assert "query" not in fused["decoder"]["blocks"][0]["attn"]
    assert "query" in fused["decoder"]["blocks"][0]["cross_attn"]  # cross stays split
    rng = np.random.RandomState(9)
    mel = jnp.asarray(rng.randn(2, cfg.n_mels, 200).astype(np.float32) * 0.1)
    prompt = [cfg.sot, cfg.no_timestamps]
    t0, l0 = whisper.greedy_decode(params, mel, cfg32, prompt, max_tokens=10)
    t1, l1 = whisper.greedy_decode(fused, mel, cfg32, prompt, max_tokens=10)
    assert (np.asarray(t0) == np.asarray(t1)).all()
    # LoRA-carrying projections are skipped, not broken
    from ssak_tpu.models.lora import add_lora

    lp = add_lora(params, rank=2)
    still = whisper.fuse_decode_qkv(lp)
    assert "qkv" not in still["decoder"]["blocks"][0]["attn"]


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


def test_int8_kv_attention_parity_at_production_length():
    """Advisor r2: the int8 probs quantization error grows ~sqrt(T); the
    tiny-model tests only saw T<=100. Pin the error at large-v3's
    cross-attention length (T=1500, Dh=64) with the shipped per-position
    scales — both against soft (spread) and peaked attention patterns."""
    from ssak_tpu.models import layers as L

    rng = np.random.RandomState(2)
    B, H, Dh, T = 2, 4, 64, 1500
    kT = jnp.asarray(rng.randn(B, H, Dh, T).astype(np.float32)) * 0.5
    vT = jnp.asarray(rng.randn(B, H, Dh, T).astype(np.float32)) * 0.5
    kv8 = L.quantize_decode_kv(kT, vT)
    for q_scale, tol in ((0.3, 0.05), (2.0, 0.05)):  # soft and peaked logits
        q = jnp.asarray(rng.randn(B, 1, H, Dh).astype(np.float32)) * q_scale
        ref = L.decode_attention(q, kT, vT, dtype=jnp.float32)
        out = L.decode_attention_int8(q, kv8, dtype=jnp.float32)
        err = float(jnp.max(jnp.abs(out - ref)))
        assert err < tol * float(jnp.max(jnp.abs(ref))) + 1e-3, (q_scale, err)


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


# --- layer-scanned decode (whisper.stack_decoder_blocks) ------------------


def test_stacked_decode_parity(model):
    """stack_decoder_blocks (lax.scan over a layer-stacked decoder — the
    ~n_layers x smaller decode HLO that keeps the remote TPU compile helper
    from crashing on big programs, PERF.md "int4 decode") must reproduce the
    unrolled decode: exactly at f32, token-exact at bf16."""
    params, cfg = model
    cfg32 = whisper.make_config("tiny_test", dtype="float32")
    stacked = whisper.stack_decoder_blocks(params)
    # stacked leaves carry a leading layer axis; idempotent
    assert isinstance(stacked["decoder"]["blocks"], dict)
    lw = stacked["decoder"]["blocks"]["mlp"]["fc1"]["kernel"]
    assert lw.shape[0] == cfg.n_text_layer
    assert whisper.stack_decoder_blocks(stacked) is stacked

    rng = np.random.RandomState(11)
    mel = jnp.asarray(rng.randn(3, cfg.n_mels, 200).astype(np.float32) * 0.1)
    prompt = [cfg.sot, cfg.no_timestamps]
    for c in (cfg32, cfg):
        t0, l0 = whisper.greedy_decode(params, mel, c, prompt, max_tokens=8)
        t1, l1 = whisper.greedy_decode(stacked, mel, c, prompt, max_tokens=8)
        assert (np.asarray(t0) == np.asarray(t1)).all()
        assert (np.asarray(l0) == np.asarray(l1)).all()
    bt0, _, bs0 = whisper.beam_decode(params, mel, cfg32, prompt, beam_size=3, max_tokens=6)
    bt1, _, bs1 = whisper.beam_decode(stacked, mel, cfg32, prompt, beam_size=3, max_tokens=6)
    assert (np.asarray(bt0) == np.asarray(bt1)).all()
    np.testing.assert_allclose(np.asarray(bs0), np.asarray(bs1), atol=1e-4)


def test_stacked_decode_window_and_quant(model):
    """The production decode_window path (timestamps, padded prompts,
    int8 KV) and the int8/int4 quantized loads all decode identically
    through the layer-scanned formulation; fuse_decode_qkv composes."""
    params, cfg = model
    from ssak_tpu.models.quant import quantize_params

    rng = np.random.RandomState(12)
    mel = jnp.asarray(rng.randn(3, cfg.n_mels, 200).astype(np.float32) * 0.1)
    prompt = [cfg.sot, cfg.no_timestamps]
    pr = jnp.full((3, 4), cfg.sot_prev, jnp.int32)
    pr = pr.at[:, 2].set(cfg.sot).at[:, 3].set(cfg.no_timestamps)
    plen = jnp.array([4, 3, 2], jnp.int32)
    for kv8 in (False, True):
        c = whisper.make_config("tiny_test", kv_int8=kv8)
        a = whisper.decode_window(params, mel, pr, plen, c, sot_distance=2,
                                  max_tokens=6, with_timestamps=True)
        b = whisper.decode_window(whisper.stack_decoder_blocks(params), mel, pr, plen, c,
                                  sot_distance=2, max_tokens=6, with_timestamps=True)
        assert (np.asarray(a[0]) == np.asarray(b[0])).all(), f"kv_int8={kv8}"
        np.testing.assert_allclose(np.asarray(a[3]), np.asarray(b[3]), atol=2e-2)
    for bits in (8, 4):
        qp = quantize_params(params, bits=bits)
        t0, _ = whisper.greedy_decode(qp, mel, cfg, prompt, max_tokens=6)
        t1, _ = whisper.greedy_decode(whisper.stack_decoder_blocks(qp), mel, cfg, prompt, max_tokens=6)
        assert (np.asarray(t0) == np.asarray(t1)).all(), f"bits={bits}"
    fs = whisper.stack_decoder_blocks(whisper.fuse_decode_qkv(params))
    assert "qkv" in fs["decoder"]["blocks"]["attn"]
    t0, _ = whisper.greedy_decode(params, mel, cfg, prompt, max_tokens=6)
    t1, _ = whisper.greedy_decode(fs, mel, cfg, prompt, max_tokens=6)
    assert (np.asarray(t0) == np.asarray(t1)).all()


def test_auto_window_batch_scan_layers_cap(monkeypatch):
    """The compiler-crash row caps in auto_window_batch: 20 rows unrolled,
    40 rows pure-beam under SSAK_SCAN_LAYERS=1 (measured envelopes — PERF.md
    "layer-scan investigation"); best_of keeps the conservative cap."""
    from ssak_tpu.infer.whisper_infer import auto_window_batch

    cfg = whisper.make_config("large-v3")
    monkeypatch.delenv("SSAK_SCAN_LAYERS", raising=False)
    assert auto_window_batch(cfg) == 24
    assert auto_window_batch(cfg, beam_size=5) == 4            # 20 // 5
    monkeypatch.setenv("SSAK_SCAN_LAYERS", "1")
    assert auto_window_batch(cfg, beam_size=5) == 8            # 40 // 5
    assert auto_window_batch(cfg, beam_size=5, best_of=5) == 4  # retry program: stay at 20
    assert auto_window_batch(cfg) == 24                        # greedy unaffected
    # explicit scan_layers overrides the env var: whisper_infer passes
    # scan_layers=False under tensor parallelism (stacking is NOT applied
    # there), so SSAK_SCAN_LAYERS=1 + --tp must keep the unrolled-program
    # 20-row envelope (advisor r4)
    assert auto_window_batch(cfg, beam_size=5, scan_layers=False) == 4
    monkeypatch.delenv("SSAK_SCAN_LAYERS", raising=False)
    assert auto_window_batch(cfg, beam_size=5, scan_layers=True) == 8
