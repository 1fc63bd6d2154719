"""End-to-end inference tests with seeded tiny models (reference
methodology: run the full pipeline over real audio/Kaldi inputs; offline
here, so models are random-but-deterministic and we pin stability, shapes
and plumbing rather than pretrained transcripts)."""

import os

import numpy as np
import pytest


def test_ctc_infer_over_kaldi_dir(reference_data_dir, monkeypatch):
    monkeypatch.setenv("DATAPATH", reference_data_dir)
    from ssak_tpu.infer.ctc_infer import ctc_infer

    out = list(
        ctc_infer(None, os.path.join(reference_data_dir, "kaldi", "minimal"),
                  batch_size=2, output_ids=True, seeded_test_config="wav2vec2")
    )
    # mp3-backed utterances are skipped only if native lib missing;
    # wav-backed ones must be present
    ids = [i for i, _t in out]
    assert "toy_bonjour" in ids and "toy_bonjour2" in ids
    texts = dict(out)
    assert isinstance(texts["toy_bonjour"], str)
    # deterministic across runs
    out2 = dict(
        ctc_infer(None, os.path.join(reference_data_dir, "kaldi", "minimal"),
                  batch_size=2, output_ids=True, seeded_test_config="wav2vec2")
    )
    assert texts == out2


def test_ctc_infer_single_file(reference_data_dir):
    from ssak_tpu.infer.ctc_infer import ctc_infer

    wav = os.path.join(reference_data_dir, "audio", "bonjour.wav")
    [t] = list(ctc_infer(None, wav, seeded_test_config="wav2vec2"))
    assert isinstance(t, str)


def test_whisper_infer_single_file(reference_data_dir):
    from ssak_tpu.infer.whisper_infer import whisper_infer

    wav = os.path.join(reference_data_dir, "audio", "bonjour.wav")
    [(i, t)] = list(whisper_infer(None, wav, output_ids=True, seeded_test_config="whisper"))
    assert i == "bonjour"
    assert isinstance(t, str)


def test_ctc_chunked_long_audio():
    """Chunked logits must equal unchunked on the chunk boundary-free case."""
    import jax.numpy as jnp

    from ssak_tpu.infer.ctc_infer import ctc_transcribe_batch
    from ssak_tpu.infer.general import _seeded_model

    model = _seeded_model("wav2vec2")
    rng = np.random.RandomState(0)
    a = rng.randn(16000).astype(np.float32) * 0.1
    [t1] = ctc_transcribe_batch(model, [a])
    # same audio within a larger batch of different lengths
    b = rng.randn(8000).astype(np.float32) * 0.1
    t2 = ctc_transcribe_batch(model, [a, b])[0]
    assert t1 == t2


def test_tensor_parallel_inference_matches_single_device(reference_data_dir):
    """shard_model (megatron TP over the 'model' axis) must not change
    transcripts — whisper greedy decode and CTC logits identical to the
    unsharded run (BASELINE.md 'sharded Whisper decode' capability)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from ssak_tpu.audio import load_audio
    from ssak_tpu.infer.general import _seeded_model, compute_log_probas, shard_model
    from ssak_tpu.infer.whisper_infer import whisper_transcribe_batch

    wav = np.asarray(load_audio(os.path.join(reference_data_dir, "audio", "bonjour.wav"), sample_rate=16000), np.float32)

    # whisper: TP-sharded decode runs end-to-end, and teacher-forced logits
    # match numerically (exact-token compare is ill-posed on the seeded
    # random model: near-uniform logits make argmax sensitive to the TP
    # reduction order; real checkpoints decode confidently)
    from ssak_tpu.models import whisper
    from ssak_tpu.ops.logmel import log_mel_spectrogram, pad_or_trim

    m1 = _seeded_model("whisper")
    cfg = m1.cfg
    mel = log_mel_spectrogram(pad_or_trim(jnp.asarray(wav), cfg.n_audio_ctx * 2 * 160)[None], n_mels=cfg.n_mels)
    toks = jnp.asarray([[cfg.sot, 17, 23, 31]], jnp.int32)
    ref_logits = jax.jit(lambda p: whisper.decode_train(p, toks, whisper.encode(p, mel, cfg), cfg))(m1.params)

    m2 = _seeded_model("whisper")
    shard_model(m2, model_axis=2)
    tp_logits = jax.jit(lambda p: whisper.decode_train(p, toks, whisper.encode(p, mel, cfg), cfg))(m2.params)
    np.testing.assert_allclose(np.asarray(tp_logits), np.asarray(ref_logits), atol=2e-2, rtol=1e-3)
    # and the full decode path executes with sharded weights
    got = whisper_transcribe_batch(m2, [wav])
    assert len(got) == 1 and isinstance(got[0], str)

    # ctc logits
    c1 = _seeded_model("wav2vec2")
    x = jnp.asarray(wav[None])
    lens = jnp.asarray([len(wav)], jnp.int32)
    lp1, fl1 = compute_log_probas(c1, x, lens)
    c2 = _seeded_model("wav2vec2")
    shard_model(c2, model_axis=4)
    # bust the jit program cache keyed on (cfg, shape): same key would reuse
    # the unsharded program — params shardings differ, so jit re-specializes
    lp2, fl2 = compute_log_probas(c2, x, lens)
    np.testing.assert_array_equal(np.asarray(fl1), np.asarray(fl2))
    np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp2), atol=2e-3)


def test_ctc_infer_routes_word_lm_to_device(reference_data_dir, tmp_path, monkeypatch):
    """--lm + --lexicon + beam_width>1 with an order<=3 LM must route to
    the on-device word-LM beam (VERDICT r2 next #2 wiring) and produce
    only in-lexicon words."""
    monkeypatch.setenv("DATAPATH", reference_data_dir)
    from ssak_tpu.decode.lm import train_ngram_lm, write_arpa
    from ssak_tpu.infer import ctc_infer as ci

    words = ["bonjour", "monde", "le", "la"]
    lm = train_ngram_lm(["bonjour le monde", "la monde bonjour"] * 20, order=2)
    arpa = tmp_path / "lm.arpa"
    write_arpa(lm, str(arpa))
    lexfile = tmp_path / "lex.txt"
    lexfile.write_text("\n".join(words), encoding="utf-8")

    calls = {"device": 0, "host": 0}
    orig_dev, orig_host = ci.ctc_decode_beam_device, ci.ctc_decode_with_lm

    def spy_dev(*a, **k):
        calls["device"] += 1
        assert k.get("word_lm") is not None
        return orig_dev(*a, **k)

    def spy_host(*a, **k):
        calls["host"] += 1
        return orig_host(*a, **k)

    monkeypatch.setattr(ci, "ctc_decode_beam_device", spy_dev)
    monkeypatch.setattr(ci, "ctc_decode_with_lm", spy_host)
    wav = os.path.join(reference_data_dir, "audio", "bonjour.wav")
    [t] = list(ci.ctc_infer(
        None, wav, seeded_test_config="wav2vec2",
        lm_path=str(arpa), lexicon_path=str(lexfile), beam_width=8,
    ))
    assert calls["device"] == 1 and calls["host"] == 0
    for w in t.split():
        assert w in words, t


def test_whisper_batch_routes_longform_batched(monkeypatch):
    """Multiple long utterances go through ONE transcribe_longform_batch
    call (not a per-utterance loop)."""
    import ssak_tpu.infer.whisper_infer as wi
    from ssak_tpu.infer.general import _seeded_model

    model = _seeded_model("whisper")
    window = model.cfg.n_audio_ctx * 2 * 160
    rng = np.random.RandomState(0)
    batch = [
        (rng.randn(window * 2) * 0.05).astype(np.float32),
        (rng.randn(window // 2) * 0.05).astype(np.float32),  # short
        (rng.randn(window * 3) * 0.05).astype(np.float32),
    ]
    seen = []
    orig = wi.transcribe_longform_batch

    def spy(model, audios, **kw):
        seen.append(len(audios))
        return orig(model, audios, **kw)

    monkeypatch.setattr(wi, "transcribe_longform_batch", spy)
    texts = wi.whisper_transcribe_batch(model, batch, max_tokens=6)
    assert seen == [2]  # both long rows in one batched call
    assert len(texts) == 3 and all(isinstance(t, str) for t in texts)


def test_whisper_cli_accurate_preset_maps_to_beam5_bestof5(reference_data_dir, monkeypatch, tmp_path):
    """--accurate must translate to beam_size=5 + best_of=5 + temperature
    fallback at the whisper_infer boundary (reference whisper_infer.py
    :319-332 preset semantics)."""
    import ssak_tpu.infer.whisper_infer as wi

    seen = {}

    def fake_infer(model_dir, audios, **kw):
        seen.update(kw)
        return iter([("id", "text")])

    monkeypatch.setattr(wi, "whisper_infer", fake_infer)
    wav = os.path.join(reference_data_dir, "audio", "bonjour.wav")
    wi.cli([wav, "dummy_model", "--accurate", "--output", str(tmp_path / "o.txt")])
    assert seen["beam_size"] == 5
    assert seen["best_of"] == 5
    assert seen["temperature_fallback"] is True
    # --efficient forces greedy single-candidate
    seen.clear()
    wi.cli([wav, "dummy_model", "--efficient", "--best_of", "9", "--output", str(tmp_path / "o.txt")])
    assert seen["beam_size"] == 0 and seen["best_of"] == 1
