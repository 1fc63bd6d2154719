"""The int16 host->device wire format for audio — ONE definition.

The remote runtime's h2d link moves ~37 MB/s (measured — PERF.md
"sak-infer end-to-end"), so every production path ships audio as int16
PCM sample words: exact for file-sourced audio (scale 32768 round-trips
the original sample words), half the bytes of f32. Arrays outside
[-1, 1] (augmented gain, user-passed int16-scaled floats) would
hard-clip, so they ship as f32 unchanged — the GUARD and the SCALE live
here and nowhere else. Decode side: the f32 cast happens on device
(`to_device_f32` eagerly, or `ssak_tpu.train.steps.audio_to_f32` inside
a compiled step), keyed on dtype so float input passes through.

Used by: infer/ctc_infer (_encode_padded), infer/whisper_infer (window
groups + longform batches), train/loop (CTC batches), train/whisper_loop
(mel prep).
"""

import numpy as np

SCALE = 32768.0


def int16_ok(a) -> bool:
    """True when `a` is normalized audio that int16 represents without
    clipping (file-sourced audio always is). Empty arrays are fine."""
    a = np.asarray(a)
    return a.size == 0 or float(np.abs(a).max()) <= 1.0


def to_int16(a) -> np.ndarray:
    return np.rint(np.asarray(a, np.float32) * SCALE).clip(-32768, 32767).astype(np.int16)


def encode_array(x: np.ndarray) -> np.ndarray:
    """A pre-padded (B, T) float batch -> int16 wire format when safe,
    unchanged otherwise."""
    if int16_ok(x):
        return to_int16(x)
    return x


def encode_rows(rows, W: int, T: int) -> np.ndarray:
    """Pack variable-length 1-D rows into a zero-padded (W, T) matrix in
    the wire format: int16 when EVERY row is normalized, f32 otherwise
    (one out-of-range row demotes the whole batch — mixed dtypes would
    mean two compiled programs per shape)."""
    if all(int16_ok(r) for r in rows):
        x = np.zeros((W, T), np.int16)
        for i, r in enumerate(rows):
            n = min(len(r), T)
            x[i, :n] = to_int16(r[:n])
    else:
        x = np.zeros((W, T), np.float32)
        for i, r in enumerate(rows):
            n = min(len(r), T)
            x[i, :n] = r[:n]
    return x


def to_device_f32(x):
    """Ship `x` (host wire-format array) and decode to normalized f32 on
    device. Float input passes through untouched."""
    import jax.numpy as jnp

    arr = jnp.asarray(x)
    if jnp.issubdtype(arr.dtype, jnp.integer):
        return arr.astype(jnp.float32) * (1.0 / SCALE)
    return arr
