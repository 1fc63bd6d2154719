"""Neural voice conversion (augment/vc.py — the so-vits-svc capability row,
ref ssak/utils/voice_conversion.py, delivered as a trainable JAX model)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tone(freq=220.0, seconds=1.0, sr=16000):
    t = np.arange(int(seconds * sr)) / sr
    return (0.4 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class TestSynthesis:
    def test_istft_inverts_stft(self):
        from ssak_tpu.augment.vc import istft, stft

        rng = np.random.default_rng(0)
        x = (rng.standard_normal(8000) * 0.3).astype(np.float32)
        re, im = stft(jnp.asarray(x))
        y = np.asarray(istft(re, im, len(x)))
        # perfect reconstruction away from the edges (COLA with hann/hop=160)
        np.testing.assert_allclose(y[400:-400], x[400:-400], atol=1e-3)

    def test_griffin_lim_recovers_tone(self):
        """GL from magnitude-only must reproduce a pure tone's spectrum."""
        from ssak_tpu.augment.vc import audio_to_logmel, griffin_lim, stft

        x = _tone(330.0, 0.5)
        re, im = stft(jnp.asarray(x))
        mag = jnp.sqrt(re**2 + im**2)
        y = np.asarray(griffin_lim(mag, len(x), iters=40))
        # compare log-mel envelopes (phase-free criterion)
        m1 = np.asarray(audio_to_logmel(jnp.asarray(x), 40))
        m2 = np.asarray(audio_to_logmel(jnp.asarray(y), 40))
        corr = np.corrcoef(m1.ravel(), m2.ravel())[0, 1]
        assert corr > 0.99, corr

    def test_mel_roundtrip_envelope(self):
        from ssak_tpu.augment.vc import audio_to_logmel, logmel_to_audio

        x = _tone(440.0, 0.5)
        mel = audio_to_logmel(jnp.asarray(x))
        y = np.asarray(logmel_to_audio(mel, len(x), iters=30))
        assert y.shape == x.shape
        # dominant frequency survives mel->GL->audio
        spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
        f = np.argmax(spec) * 16000 / len(y)
        assert abs(f - 440.0) < 30.0, f


class TestTraining:
    def test_loss_decreases_and_converts(self, tmp_path):
        from ssak_tpu.augment.vc import (
            convert_voice,
            load_vc,
            save_vc,
            train_voice_converter,
        )

        rng = np.random.default_rng(0)
        # "target speaker": band-limited noise bursts with a fixed envelope
        target = [
            (0.3 * np.sin(2 * np.pi * 180 * np.arange(8000) / 16000)
             + 0.05 * rng.standard_normal(8000)).astype(np.float32)
            for _ in range(4)
        ]
        params, losses = train_voice_converter(
            target, steps=30, n_mels=40, hidden=32, blocks=2,
            segment_s=0.5, batch=4, seed=0, log_every=0,
        )
        assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.8, losses[:3] + losses[-3:]

        src = _tone(300.0, 0.6)
        out = convert_voice(params, src, gl_iters=16)
        assert out.shape == src.shape and np.isfinite(out).all()
        # RMS preserved (segment alignment downstream)
        assert abs(np.sqrt((out**2).mean()) - np.sqrt((src**2).mean())) < 0.05

        p = str(tmp_path / "vc.npz")
        save_vc(params, p)
        params2 = load_vc(p)
        out2 = convert_voice(params2, src, gl_iters=16)
        np.testing.assert_allclose(out, out2, atol=1e-5)


class TestKaldiDirConversion:
    def test_converts_kaldi_dir(self, tmp_path, tmp_audio_dir):
        """Reference _convert_voice semantics: per-segment random target
        model, augmented Kaldi dir with prefixed ids + valid structure."""
        from ssak_tpu.augment.vc import convert_kaldi_dir, init_vc_params, save_vc
        from ssak_tpu.data.kaldi import check_kaldi_dir

        # untrained models are fine for the plumbing test (identity-ish net)
        m1, m2 = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
        save_vc(init_vc_params(jax.random.PRNGKey(0), n_mels=80, hidden=16, blocks=1), m1)
        save_vc(init_vc_params(jax.random.PRNGKey(1), n_mels=80, hidden=16, blocks=1), m2)

        kin = tmp_path / "kin"
        kin.mkdir()
        tone = os.path.join(tmp_audio_dir, "tone16k.wav")
        with open(kin / "wav.scp", "w") as f:
            f.write(f"w1 {tone}\n")
        with open(kin / "segments", "w") as f:
            f.write("u1 w1 0.00 0.40\nu2 w1 0.30 0.80\n")
        with open(kin / "text", "w") as f:
            f.write("u1 bonjour\nu2 monde\n")
        with open(kin / "utt2spk", "w") as f:
            f.write("u1 s1\nu2 s1\n")

        out = convert_kaldi_dir(str(kin), [m1, m2], str(tmp_path / "kout"), seed=0, gl_iters=8)
        for fn in ("text", "wav.scp", "utt2spk", "utt2dur", "spk2utt"):
            assert os.path.exists(os.path.join(out, fn)), fn
        ids = [l.split()[0] for l in open(os.path.join(out, "text"))]
        assert len(ids) == 2 and all(i.startswith("vc") for i in ids)
        # the augmented dir validates as a Kaldi dir
        check_kaldi_dir(out)
        # converted audio exists and has the right duration
        from ssak_tpu.audio import load_audio

        wavs = dict(l.split(None, 1) for l in open(os.path.join(out, "wav.scp")))
        a = load_audio(wavs[ids[0]].strip())
        assert abs(len(a) / 16000 - 0.40) < 0.02
