"""Native (C++) audio ingest library loader.

The shared library `libssakaudio.so` provides the hot host-side codecs
(MP3 Layer III decode, FLAC decode, fast WAV scan) used by the data
pipeline. It is built on demand from the bundled sources with g++:

    python -m ssak_tpu.audio.native.build

Loading is lazy and optional: pure-Python fallbacks exist for WAV; MP3/FLAC
require the native library.
"""

import ctypes
import os

_LIB = None
_TRIED = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), "libssakaudio.so")


def get_native_lib(auto_build: bool = True):
    """Return the loaded ctypes library, building it if needed. None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None:
        return _LIB
    if _TRIED and not auto_build:
        return None
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path) and auto_build:
        try:
            from ssak_tpu.audio.native.build import build

            build()
        except Exception:
            return None
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.ssak_mp3_decode.restype = ctypes.c_long
    lib.ssak_mp3_decode.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    if hasattr(lib, "ssak_av_decode"):
        lib.ssak_av_decode.restype = ctypes.c_long
        lib.ssak_av_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.ssak_av_duration.restype = ctypes.c_double
        lib.ssak_av_duration.argtypes = [ctypes.c_char_p]
    if hasattr(lib, "ssak_scan_durations"):
        lib.ssak_scan_durations.restype = None
        lib.ssak_scan_durations.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_double),
        ]
    _LIB = lib
    return _LIB


def scan_durations(paths, n_threads: int = 8):
    """Parallel header-only duration scan (WAV/FLAC) in C++; returns a list
    of seconds with None for files the native scanner cannot parse (caller
    falls back). None for all if the library is unavailable.

    Native counterpart of the reference's Kaldi `wav-to-duration` binary
    run under run.pl jobs (tools/kaldi/utils/get_utt2dur.sh:83-111)."""
    lib = get_native_lib()
    if lib is None or not hasattr(lib, "ssak_scan_durations"):
        return [None] * len(paths)
    n = len(paths)
    if n == 0:
        return []
    arr = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    out = (ctypes.c_double * n)()
    lib.ssak_scan_durations(arr, n, n_threads, out)
    return [d if d >= 0 else None for d in out]
