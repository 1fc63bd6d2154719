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
