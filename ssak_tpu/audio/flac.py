"""FLAC (and any other ffmpeg-supported format) decoding via the native
universal decoder (ssak_tpu/audio/native/avdec.cpp, libavformat/avcodec)."""

import ctypes
import os

import numpy as np


def _lib():
    from ssak_tpu.audio.native import get_native_lib

    lib = get_native_lib()
    if lib is None or not hasattr(lib, "ssak_av_decode"):
        raise RuntimeError(
            "FLAC decoding requires the native audio library with ffmpeg "
            "support; build it with `python -m ssak_tpu.audio.native.build`."
        )
    return lib


def read_any(path):
    """Decode any ffmpeg-supported audio file to (float32 (frames, ch), rate)."""
    lib = _lib()
    dur = lib.ssak_av_duration(path.encode())
    # generous capacity guess: duration * 96kHz * 2ch (+1 min safety)
    est_frames = int((max(dur, 0) + 60) * 96000)
    cap = est_frames * 2
    out = np.zeros(cap, dtype=np.float32)
    rate = ctypes.c_int(0)
    ch = ctypes.c_int(0)
    n = lib.ssak_av_decode(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap,
        ctypes.byref(rate), ctypes.byref(ch),
    )
    if n < 0:
        raise ValueError(f"decode failed for {path} (code {n})")
    c = max(1, ch.value)
    return out[: n * c].reshape(-1, c).copy(), rate.value


def read_flac(path):
    return read_any(path)


def flac_duration(path) -> float:
    lib = _lib()
    dur = lib.ssak_av_duration(path.encode())
    if dur < 0:
        audio, sr = read_any(path)
        return len(audio) / sr
    return float(dur)
