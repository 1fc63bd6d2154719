"""Alignment + VAD + DTW tests."""

import numpy as np
import pytest

import jax.numpy as jnp


VOCAB = ["<pad>", "|", "a", "b", "c", "d"]


def make_logprobs(path, V=6, peaked=6.0):
    lp = np.full((len(path), V), -peaked, np.float32)
    for t, k in enumerate(path):
        lp[t, k] = 0.0
    return lp - np.log(np.exp(lp).sum(-1, keepdims=True))


class TestForcedAlignment:
    def test_word_timestamps(self):
        from ssak_tpu.align import compute_alignment

        # "ab|cd" emitted over 10 frames with blanks between
        path = [2, 2, 0, 3, 1, 4, 4, 0, 5, 0]
        lp = make_logprobs(path)
        chars, words = compute_alignment(lp, "ab cd", VOCAB)
        assert [w.label for w in words] == ["ab", "cd"]
        w1, w2 = words
        assert w1.start == 0 and w1.end <= 4
        assert w2.start >= 5 and w2.end <= 9
        assert w1.score > 0.5 and w2.score > 0.5

    def test_empty_transcript(self):
        from ssak_tpu.align import compute_alignment

        chars, words = compute_alignment(make_logprobs([0, 0]), "", VOCAB)
        assert chars == [] and words == []

    def test_unknown_chars_dropped(self):
        from ssak_tpu.align import compute_alignment

        path = [2, 0, 3]
        chars, words = compute_alignment(make_logprobs(path), "a#b", VOCAB)
        assert [w.label for w in words] == ["ab"]

    def test_to_seconds(self):
        from ssak_tpu.align.forced import Segment

        s = Segment("x", 10, 20, 0.9).to_seconds(0.02)
        assert s.start == pytest.approx(0.2) and s.end == pytest.approx(0.4)


class TestDTW:
    def test_find_exact_span(self):
        from ssak_tpu.align import find_best_position_dtw

        ref = "le chat mange la souris dans le jardin"
        s, e, cost = find_best_position_dtw("mange la souris", ref)
        assert ref.split()[s:e] == ["mange", "la", "souris"]
        assert cost < 0.5

    def test_find_noisy_span(self):
        from ssak_tpu.align import find_best_position_dtw

        ref = "bonjour tout le monde il fait beau aujourd'hui vraiment"
        s, e, _ = find_best_position_dtw("il fais beau", ref)
        span = ref.split()[s:e]
        assert "beau" in span and "il" in span

    def test_levenshtein_position(self):
        from ssak_tpu.align import find_best_position_levenshtein

        ref = "a b c d e f g"
        s, e, d = find_best_position_levenshtein("c d e", ref)
        assert (s, e) == (2, 5) and d == 0


class TestVAD:
    def _signal(self):
        sr = 16000
        rng = np.random.RandomState(0)
        silence = rng.randn(sr) * 0.001
        speech = np.sin(2 * np.pi * 220 * np.arange(sr) / sr) * 0.5
        return np.concatenate([silence, speech, silence, speech, silence]).astype(np.float32), sr

    def test_segments(self):
        from ssak_tpu.align import get_vad_segments

        x, sr = self._signal()
        segs = get_vad_segments(x, sr)
        assert len(segs) == 2
        assert abs(segs[0]["start"] - 1.0) < 0.2
        assert abs(segs[0]["end"] - 2.0) < 0.2
        assert abs(segs[1]["start"] - 3.0) < 0.2

    def test_remove_non_speech_and_back(self):
        from ssak_tpu.align import convert_timestamps, get_vad_segments, remove_non_speech

        x, sr = self._signal()
        cropped, mapping = remove_non_speech(x, sr)
        assert len(cropped) < len(x)
        # a timestamp 0.5s into the cropped audio maps into the 1st speech seg
        [back] = convert_timestamps([{"start": 0.5, "end": 0.6}], mapping)
        assert 1.2 < back["start"] < 2.1


def test_nn_vad_learns_speech_detection(tmp_path):
    """Train the neural VAD on synthetic speech-like bursts with explicit
    labels; it must localize bursts in held-out audio (silero-engine
    capability, reference vad.py:63-80, as a trainable JAX model)."""
    import numpy as np

    from ssak_tpu.align.nn_vad import FRAME_MS, load_vad, save_vad, speech_probs, train_nn_vad
    from ssak_tpu.align.vad import get_vad_segments

    sr = 16000
    rng = np.random.RandomState(0)

    def make_example(bursts, total=4.0):
        audio = rng.randn(int(total * sr)).astype(np.float32) * 0.003  # noise floor
        labels = np.zeros(int(total * 1000 / FRAME_MS), np.float32)
        for s, e in bursts:
            t = np.arange(int((e - s) * sr)) / sr
            # crude "speech": AM-modulated harmonics
            sig = sum(np.sin(2 * np.pi * f * t) for f in (220, 440, 660))
            sig = (0.3 * sig * (0.6 + 0.4 * np.sin(2 * np.pi * 4 * t))).astype(np.float32)
            audio[int(s * sr): int(s * sr) + len(sig)] += sig
            labels[int(s * 1000 / FRAME_MS): int(e * 1000 / FRAME_MS)] = 1.0
        return audio, labels

    train = [make_example([(0.5, 1.5), (2.5, 3.2)]), make_example([(1.0, 2.0)]),
             make_example([(0.2, 0.9), (1.8, 3.5)]), make_example([])]
    params = train_nn_vad([a for a, _ in train], labels=[l for _, l in train], steps=200)

    test_audio, test_labels = make_example([(0.8, 1.8), (2.6, 3.4)])
    probs = speech_probs(params, test_audio, sr)
    pred = probs[: len(test_labels)] > 0.5
    acc = (pred == (test_labels[: len(probs)] > 0.5)).mean()
    assert acc > 0.85, acc

    segs = get_vad_segments(test_audio, sr, method="nn", nn_params=params)
    assert 1 <= len(segs) <= 3, segs
    covered = sum(min(e, seg["end"]) - max(s, seg["start"])
                  for s, e in [(0.8, 1.8), (2.6, 3.4)] for seg in segs
                  if min(e, seg["end"]) > max(s, seg["start"]))
    assert covered > 1.2, (covered, segs)  # of 1.8 s true speech

    # save/load roundtrip
    p = tmp_path / "vad.npz"
    save_vad(params, str(p))
    params2 = load_vad(str(p))
    probs2 = speech_probs(params2, test_audio, sr)
    np.testing.assert_allclose(probs, probs2, atol=1e-6)
