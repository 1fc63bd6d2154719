"""The full-system proof: train a tiny CTC model until it actually learns
real utterances, export it, and transcribe them correctly through the
deployment path (reference test_train_speechbrain.py's 'train then run
inference with the trained model' pattern, taken to WER 0)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.slow
def test_overfit_train_export_transcribe(reference_data_dir, tmp_path, monkeypatch):
    monkeypatch.setenv("DATAPATH", reference_data_dir)
    from ssak_tpu.audio import load_audio
    from ssak_tpu.data.dataset import kaldi_folder_to_manifest
    from ssak_tpu.eval.wer import compute_wer
    from ssak_tpu.infer.ctc_infer import ctc_transcribe_batch
    from ssak_tpu.infer.general import load_model
    from ssak_tpu.models import wav2vec2
    from ssak_tpu.models.tokenizer import CTCTokenizer
    from ssak_tpu.ops.ctc import ctc_loss
    from ssak_tpu.text import format_text
    from ssak_tpu.train.finalize import export_model
    from ssak_tpu.train.steps import init_train_state, make_ctc_train_step, make_optimizer

    def norm(t):
        return format_text(t, "fr", extract_parenthesized=False, safety_checks=False).replace("\n", " ")

    # two short real utterances (bonjour x2 at different sample rates)
    _meta, rows = kaldi_folder_to_manifest(os.path.join(reference_data_dir, "kaldi", "minimal"), max_duration=2.0)
    assert len(rows) == 2
    texts = [norm(r["text"]) for r in rows]
    audios = [load_audio(r["audio"], start=r["start"], end=r["end"], sample_rate=16000) for r in rows]

    tokenizer = CTCTokenizer.from_corpus(texts)
    cfg = wav2vec2.make_config("tiny_test", vocab_size=max(32, len(tokenizer)))
    params = wav2vec2.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(learning_rate=3e-3, warmup_steps=10, total_steps=400, schedule="constant")
    state = init_train_state(params, opt)
    step = make_ctc_train_step(cfg, opt, frozen_feature_encoder=False)

    T = max(len(a) for a in audios)
    x = np.zeros((2, T), np.float32)
    lens = np.zeros((2,), np.int32)
    for i, a in enumerate(audios):
        x[i, : len(a)] = a
        lens[i] = len(a)
    labels_list = [tokenizer.encode(t) for t in texts]
    U = max(len(l) for l in labels_list)
    labels = np.zeros((2, U), np.int32)
    lab_lens = np.zeros((2,), np.int32)
    for i, l in enumerate(labels_list):
        labels[i, : len(l)] = l
        lab_lens[i] = len(l)
    batch = {
        "audio": jnp.asarray(x),
        "audio_lengths": jnp.asarray(lens),
        "labels": jnp.asarray(labels),
        "label_lengths": jnp.asarray(lab_lens),
    }
    loss = None
    for i in range(400):
        state, m = step(state, batch)
        if i % 100 == 0:
            loss = float(m["loss"])
            if loss < 0.05:
                break
    final_loss = float(m["loss"])
    assert final_loss < 1.0, f"did not overfit: loss {final_loss}"

    # export + reload through the deployment path
    out_dir = str(tmp_path / "final")
    export_model(state["params"], cfg, out_dir, tokenizer=tokenizer)
    model = load_model(out_dir)
    hyps = ctc_transcribe_batch(model, audios)
    wer = compute_wer(texts, hyps)["wer"]
    assert wer <= 0.5, f"refs={texts} hyps={hyps} wer={wer}"
    # at least one utterance transcribed exactly
    assert any(h == t for h, t in zip(hyps, texts)), f"{hyps} vs {texts}"
