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
def dft_matrices(n_fft: int = N_FFT):
    """Real/imag DFT matrices (n_fft, n_fft//2+1) with hann pre-applied."""
    k = np.arange(n_fft)[:, None]
    f = np.arange(n_fft // 2 + 1)[None, :]
    ang = -2.0 * np.pi * k * f / n_fft
    w = hann_window(n_fft)[:, None]
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
