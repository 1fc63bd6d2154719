"""Kernel numerics tests: log-mel vs naive reference, CTC loss vs torch-cpu,
greedy decode, alignment trellis — the kernel-vs-reference layer the
reference test suite lacks (SURVEY.md §4 implication)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssak_tpu.ops import ctc_greedy_decode, ctc_loss, log_mel_spectrogram
from ssak_tpu.ops.ctc import ctc_alignment_trellis


class TestLogMel:
    def test_shape(self):
        x = np.random.RandomState(0).randn(2, 16000 * 2).astype(np.float32)
        mel = np.asarray(log_mel_spectrogram(jnp.asarray(x)))
        assert mel.shape == (2, 80, 200)  # 2 s at hop 160

    def test_range(self):
        x = np.random.RandomState(0).randn(16000).astype(np.float32) * 0.1
        mel = np.asarray(log_mel_spectrogram(jnp.asarray(x)))
        # whisper scaling keeps values roughly in [-1, 2]
        assert mel.min() >= -1.01 and mel.max() < 3.0

    def test_matches_naive_stft(self):
        """Compare the matmul-DFT against numpy rfft."""
        rng = np.random.RandomState(1)
        x = rng.randn(4000).astype(np.float32)
        from ssak_tpu.ops.logmel import HOP_LENGTH, N_FFT, hann_window, mel_filterbank

        pad = N_FFT // 2
        xp = np.pad(x, (pad, pad), mode="reflect")
        n_frames = 1 + (len(xp) - N_FFT) // HOP_LENGTH
        win = hann_window(N_FFT)
        frames = np.stack([xp[i * HOP_LENGTH : i * HOP_LENGTH + N_FFT] * win for i in range(n_frames)])
        spec = np.abs(np.fft.rfft(frames, axis=-1)) ** 2
        mel = spec[:-1] @ mel_filterbank().T
        log_spec = np.log10(np.maximum(mel, 1e-10))
        log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
        expected = ((log_spec + 4.0) / 4.0).T
        got = np.asarray(log_mel_spectrogram(jnp.asarray(x)))
        assert got.shape == expected.shape
        assert np.abs(got - expected).max() < 2e-4

    def test_whisper_tolerance_vs_torch(self):
        torch = pytest.importorskip("torch")
        # replicate whisper's own torch pipeline
        rng = np.random.RandomState(2)
        x = rng.randn(16000).astype(np.float32) * 0.3
        from ssak_tpu.ops.logmel import HOP_LENGTH, N_FFT, mel_filterbank

        xt = torch.from_numpy(x)
        window = torch.hann_window(N_FFT)
        stft = torch.stft(xt, N_FFT, HOP_LENGTH, window=window, center=True, pad_mode="reflect", return_complex=True)
        mag = stft[..., :-1].abs() ** 2
        mel = torch.from_numpy(mel_filterbank()) @ mag
        log_spec = torch.clamp(mel, min=1e-10).log10()
        log_spec = torch.maximum(log_spec, log_spec.max() - 8.0)
        expected = ((log_spec + 4.0) / 4.0).numpy()
        got = np.asarray(log_mel_spectrogram(jnp.asarray(x)))
        assert np.abs(got - expected).max() < 2e-4


class TestCTCLoss:
    def _random_case(self, seed, B=3, T=50, V=8, U=10):
        rng = np.random.RandomState(seed)
        logits = rng.randn(B, T, V).astype(np.float32)
        log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
        labels = rng.randint(1, V, size=(B, U)).astype(np.int32)
        label_lengths = rng.randint(1, U + 1, size=(B,)).astype(np.int32)
        logit_lengths = rng.randint(U + 5, T + 1, size=(B,)).astype(np.int32)
        return logits, log_probs, labels, label_lengths, logit_lengths

    def test_vs_torch(self):
        torch = pytest.importorskip("torch")
        logits, log_probs, labels, label_lengths, logit_lengths = self._random_case(0)
        ours = float(ctc_loss(log_probs, jnp.asarray(logit_lengths), jnp.asarray(labels), jnp.asarray(label_lengths), reduction="none").sum())
        lp_t = torch.from_numpy(np.asarray(log_probs)).transpose(0, 1)  # (T, B, V)
        theirs = torch.nn.functional.ctc_loss(
            lp_t, torch.from_numpy(labels), torch.from_numpy(logit_lengths), torch.from_numpy(label_lengths),
            blank=0, reduction="none", zero_infinity=True,
        )
        assert np.abs(ours - float(theirs.sum())) < 1e-2

    def test_grad_vs_torch(self):
        torch = pytest.importorskip("torch")
        logits, _lp, labels, label_lengths, logit_lengths = self._random_case(1, B=2, T=20, V=6, U=5)

        def loss_fn(lg):
            lp = jax.nn.log_softmax(lg, axis=-1)
            return ctc_loss(lp, jnp.asarray(logit_lengths), jnp.asarray(labels), jnp.asarray(label_lengths), reduction="sum")

        g_ours = np.asarray(jax.grad(loss_fn)(jnp.asarray(logits)))
        lg_t = torch.from_numpy(logits).requires_grad_(True)
        lp_t = torch.nn.functional.log_softmax(lg_t, dim=-1).transpose(0, 1)
        loss = torch.nn.functional.ctc_loss(
            lp_t, torch.from_numpy(labels), torch.from_numpy(logit_lengths), torch.from_numpy(label_lengths),
            blank=0, reduction="sum", zero_infinity=True,
        )
        loss.backward()
        g_theirs = lg_t.grad.numpy()
        assert np.abs(g_ours - g_theirs).max() < 1e-3

    def test_infeasible_zeroed(self):
        # label longer than frames -> zero loss under zero_infinity
        lp = jax.nn.log_softmax(jnp.zeros((1, 3, 5)), axis=-1)
        out = ctc_loss(lp, jnp.array([3]), jnp.array([[1, 2, 3, 4]]), jnp.array([4]), reduction="none")
        assert float(out[0]) == 0.0

    def test_jit(self):
        _lg, lp, labels, label_lengths, logit_lengths = self._random_case(2)
        f = jax.jit(lambda *a: ctc_loss(*a))
        v1 = float(f(lp, jnp.asarray(logit_lengths), jnp.asarray(labels), jnp.asarray(label_lengths)))
        v2 = float(ctc_loss(lp, jnp.asarray(logit_lengths), jnp.asarray(labels), jnp.asarray(label_lengths)))
        assert abs(v1 - v2) < 1e-5


class TestGreedyDecode:
    def test_collapse(self):
        # build logits that argmax to [1,1,0,2,2,0,0,3]
        path = [1, 1, 0, 2, 2, 0, 0, 3]
        V = 5
        lp = np.full((1, len(path), V), -10.0, np.float32)
        for t, k in enumerate(path):
            lp[0, t, k] = 0.0
        toks, lens = ctc_greedy_decode(jnp.asarray(lp), jnp.array([len(path)]))
        assert int(lens[0]) == 3
        assert list(np.asarray(toks[0][:3])) == [1, 2, 3]

    def test_length_mask(self):
        path = [1, 0, 2, 3]
        V = 5
        lp = np.full((1, len(path), V), -10.0, np.float32)
        for t, k in enumerate(path):
            lp[0, t, k] = 0.0
        toks, lens = ctc_greedy_decode(jnp.asarray(lp), jnp.array([2]))
        assert int(lens[0]) == 1
        assert int(toks[0, 0]) == 1


class TestAlignmentTrellis:
    def test_path_monotonic(self):
        rng = np.random.RandomState(0)
        T, V = 30, 6
        tokens = np.array([1, 2, 3], np.int32)
        lp = jax.nn.log_softmax(jnp.asarray(rng.randn(T, V).astype(np.float32)), axis=-1)
        trellis, path = ctc_alignment_trellis(lp, jnp.asarray(tokens))
        p = np.asarray(path)
        assert trellis.shape == (T, 7)
        assert (np.diff(p) >= 0).all() and (np.diff(p) <= 2).all()
        assert p[-1] >= 5  # reaches one of the last two states
