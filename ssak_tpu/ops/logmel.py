"""Log-mel spectrogram (Whisper-compatible) as TPU-friendly JAX ops.

Replaces the torch STFT path used by every reference backend (HF processor,
openai-whisper log_mel_spectrogram). Design: framing + windowed DFT are
expressed as one matmul (frames @ dft_matrix) so XLA puts the FLOPs on the
MXU instead of scattering an FFT; for Whisper sizes (400-pt window, 201
bins, 80/128 mels) the matmul form is faster on TPU than an FFT ladder and
fuses with the mel projection into a single kernel.

Numerics match whisper's log_mel_spectrogram (reflect padding, hann window,
slaney-scale mel filterbank, log10 clamp at max-8) to float32 tolerance.
"""

import functools
import math

import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
N_MELS = 80
CHUNK_LENGTH = 30  # seconds per Whisper window
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE
N_FRAMES = N_SAMPLES // HOP_LENGTH  # 3000


def hann_window(n: int) -> np.ndarray:
    return (0.5 * (1 - np.cos(2 * np.pi * np.arange(n) / n))).astype(np.float32)


@functools.lru_cache(maxsize=4)
def dft_matrices(n_fft: int = N_FFT, win_length: int = None):
    """Real/imag DFT matrices (n_fft, n_fft//2+1) with hann pre-applied.
    win_length < n_fft pads the window symmetrically (torch.stft layout)."""
    k = np.arange(n_fft)[:, None]
    f = np.arange(n_fft // 2 + 1)[None, :]
    ang = -2.0 * np.pi * k * f / n_fft
    win_length = win_length or n_fft
    w = hann_window(win_length)
    if win_length < n_fft:
        lo = (n_fft - win_length) // 2
        w = np.pad(w, (lo, n_fft - win_length - lo))
    w = w[:, None]
    return (np.cos(ang) * w).astype(np.float32), (np.sin(ang) * w).astype(np.float32)


@functools.lru_cache(maxsize=4)
def mel_filterbank(n_mels: int = N_MELS, n_fft: int = N_FFT, sample_rate: int = SAMPLE_RATE) -> np.ndarray:
    """Slaney-scale mel filterbank, matching librosa.filters.mel(htk=False)
    which whisper ships as a precomputed asset."""
    n_freqs = n_fft // 2 + 1
    fmin, fmax = 0.0, sample_rate / 2.0

    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / (200.0 / 3)
        logstep = math.log(6.4) / 27.0
        linear = f / (200.0 / 3)
        return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, linear)

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / (200.0 / 3)
        logstep = math.log(6.4) / 27.0
        linear = m * (200.0 / 3)
        return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), linear)

    mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz = mel_to_hz(mels)
    freqs = np.linspace(0, fmax, n_freqs)
    fb = np.zeros((n_mels, n_freqs))
    for i in range(n_mels):
        lower = (freqs - hz[i]) / (hz[i + 1] - hz[i])
        upper = (hz[i + 2] - freqs) / (hz[i + 2] - hz[i + 1])
        fb[i] = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz[2 : n_mels + 2] - hz[:n_mels])
    fb *= enorm[:, None]
    return fb.astype(np.float32)


def frame_signal(audio, n_fft: int = N_FFT, hop: int = HOP_LENGTH):
    """(..., T) -> (..., n_frames, n_fft) with whisper-style reflect padding
    of n_fft//2 on both sides. Static shapes."""
    import jax.numpy as jnp

    pad = n_fft // 2
    x = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(pad, pad)], mode="reflect")
    T = x.shape[-1]
    n_frames = 1 + (T - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    return x[..., idx]


def log_mel_spectrogram(audio, n_mels: int = N_MELS, dtype=None):
    """audio: (..., T) float32 at 16 kHz -> (..., n_frames, n_mels).

    Whisper semantics: magnitude², mel, log10 with 1e-10 floor, clamp to
    (max - 8), scale (x+4)/4. The final frame is dropped (whisper's [:-1]).
    """
    import jax.numpy as jnp

    cos_m, sin_m = dft_matrices()
    mel_fb = mel_filterbank(n_mels)
    frames = frame_signal(audio)  # (..., F+1, n_fft)
    frames = frames[..., :-1, :]  # whisper drops the final frame
    compute_dtype = dtype or jnp.float32
    re = jnp.matmul(frames.astype(compute_dtype), jnp.asarray(cos_m, compute_dtype))
    im = jnp.matmul(frames.astype(compute_dtype), jnp.asarray(sin_m, compute_dtype))
    power = (re.astype(jnp.float32) ** 2 + im.astype(jnp.float32) ** 2)
    mel = jnp.matmul(power, jnp.asarray(mel_fb).T)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    maxval = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
    log_spec = jnp.maximum(log_spec, maxval - 8.0)
    return ((log_spec + 4.0) / 4.0).swapaxes(-2, -1)  # (..., n_mels, frames)


def nemo_log_mel_spectrogram(audio, n_mels: int = 80, sample_lengths=None):
    """NeMo AudioToMelSpectrogramPreprocessor semantics (the features every
    NeMo Conformer/Parakeet checkpoint was trained on; reference models load
    this preprocessor from model_config.yaml): pre-emphasis 0.97, 25 ms hann
    window / 10 ms hop zero-padded to n_fft=512, magnitude² spectrum, slaney
    mel filterbank, natural log with 2⁻²⁴ zero guard, then PER-FEATURE
    normalization (mean/std over the valid frames of each utterance, per mel
    bin, unbiased std + 1e-5 guard).

    audio: (B, T) float32 @16 kHz -> ((B, n_mels, F), frame_lengths (B,))
    with F = T//hop + 1 (torch.stft center=True frame count). Same
    matmul-DFT MXU formulation as the Whisper frontend above.
    """
    import jax.numpy as jnp

    n_fft, win, hop = 512, 400, 160
    x = jnp.asarray(audio, jnp.float32)
    if sample_lengths is None:
        sample_lengths = jnp.full((x.shape[0],), x.shape[-1], jnp.int32)
    # zero out samples past each utterance's length so padding never leaks
    # into pre-emphasis/framing (batch rows are static-shape padded)
    valid = jnp.arange(x.shape[-1])[None, :] < sample_lengths[:, None]
    x = jnp.where(valid, x, 0.0)
    x = jnp.concatenate([x[..., :1], x[..., 1:] - 0.97 * x[..., :-1]], axis=-1)

    cos_m, sin_m = dft_matrices(n_fft, win)
    pad = n_fft // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    n_frames = 1 + (xp.shape[-1] - n_fft) // hop  # == T//hop + 1
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = xp[..., idx]
    re = jnp.matmul(frames, jnp.asarray(cos_m))
    im = jnp.matmul(frames, jnp.asarray(sin_m))
    power = re**2 + im**2
    mel = jnp.matmul(power, jnp.asarray(mel_filterbank(n_mels, n_fft)).T)
    log_mel = jnp.log(mel + 2.0**-24)  # (B, F, n_mels)

    frame_lengths = jnp.minimum(sample_lengths // hop + 1, n_frames).astype(jnp.int32)
    fmask = (jnp.arange(n_frames)[None, :] < frame_lengths[:, None])[..., None]
    n = jnp.maximum(frame_lengths, 1).astype(jnp.float32)[:, None, None]
    mean = jnp.sum(jnp.where(fmask, log_mel, 0.0), axis=-2, keepdims=True) / n
    var = jnp.sum(jnp.where(fmask, (log_mel - mean) ** 2, 0.0), axis=-2, keepdims=True) / jnp.maximum(n - 1, 1.0)
    out = (log_mel - mean) / (jnp.sqrt(var) + 1e-5)
    out = jnp.where(fmask, out, 0.0)
    return out.swapaxes(-2, -1), frame_lengths  # (B, n_mels, F)


def pad_or_trim(audio, length: int = N_SAMPLES, axis: int = -1):
    """Whisper's pad_or_trim: zero-pad or cut to exactly `length` samples."""
    import jax.numpy as jnp

    audio = jnp.asarray(audio)
    n = audio.shape[axis]
    if n > length:
        sl = [slice(None)] * audio.ndim
        sl[axis] = slice(0, length)
        return audio[tuple(sl)]
    if n < length:
        pads = [(0, 0)] * audio.ndim
        pads[axis] = (0, length - n)
        return jnp.pad(audio, pads)
    return audio
