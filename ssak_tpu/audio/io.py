"""Unified audio ingest: load_audio / save_audio / durations.

Capability parity with reference ssak/utils/audio.py (load_audio:24,
save_audio:159, get_audio_total_duration:191) without any dependency on
libsox/torchaudio: WAV is decoded natively (ssak_tpu.audio.wav), MP3 via the
bundled C++ decoder (ssak_tpu.audio.native), and sox-style command pipes in
Kaldi wav.scp are interpreted directly (ssak_tpu.audio.soxcmd).
"""

import os

import numpy as np

from ssak_tpu.audio import wav as _wav
from ssak_tpu.audio.resample import resample, to_mono

SUPPORTED_EXTENSIONS = (".wav", ".mp3", ".flac")


def _decode_file(path: str, start: float = 0.0, end: float = None):
    """Decode a file to (audio float32 (frames, ch), native sample rate)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".wav":
        info = _wav.wav_info(path)
        sr = info.sample_rate
        start_frame = int(round(start * sr)) if start else 0
        n_frames = -1 if end is None else max(0, int(round(end * sr)) - start_frame)
        return _wav.read_wav(path, start_frame, n_frames)
    elif ext == ".mp3":
        from ssak_tpu.audio import mp3 as _mp3

        audio, sr = _mp3.read_mp3(path)
        if start or end is not None:
            s = int(round(start * sr)) if start else 0
            e = len(audio) if end is None else int(round(end * sr))
            audio = audio[s:e]
        return audio, sr
    else:
        # FLAC / OGG / Opus / M4A / anything ffmpeg-supported via the
        # native universal decoder
        from ssak_tpu.audio import flac as _flac

        audio, sr = _flac.read_any(path)
        if start or end is not None:
            s = int(round(start * sr)) if start else 0
            e = len(audio) if end is None else int(round(end * sr))
            audio = audio[s:e]
        return audio, sr


def load_audio(
    path,
    start: float = None,
    end: float = None,
    sample_rate: int = 16000,
    mono: bool = True,
    return_format: str = "array",
):
    """Load (a segment of) an audio file as float32 at the target rate.

    path may be a plain file path or a Kaldi-style command pipe such as
    ``sox in.mp3 -t wav -r 16k -b 16 -c 1 - |`` (interpreted natively, no
    sox binary required — see ssak_tpu/audio/soxcmd.py).

    return_format: "array" (np.float32), "bytes" (int16 little-endian PCM),
    or "jax" (jax array on default device).
    """
    if isinstance(path, str) and path.rstrip().endswith("|"):
        from ssak_tpu.audio.soxcmd import decode_pipe_command

        audio, sr = decode_pipe_command(path, start=start, end=end)
    else:
        audio, sr = _decode_file(str(path), start=start or 0.0, end=end)
    if mono:
        audio = to_mono(audio)
    if sample_rate is not None and sr != sample_rate:
        audio = resample(audio, sr, sample_rate, axis=0)
        sr = sample_rate
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    if return_format == "array":
        return audio
    if return_format == "bytes":
        return array_to_bytes(audio)
    if return_format == "jax":
        import jax.numpy as jnp

        return jnp.asarray(audio)
    raise ValueError(f"unknown return_format: {return_format}")


def array_to_bytes(audio: np.ndarray) -> bytes:
    """float32 [-1,1] -> int16 little-endian PCM bytes."""
    return np.clip(np.round(audio * 32768.0), -32768, 32767).astype("<i2").tobytes()


def bytes_to_array(data: bytes) -> np.ndarray:
    return np.frombuffer(data, "<i2").astype(np.float32) / 32768.0


def save_audio(path, audio, sample_rate: int = 16000, bits: int = 16):
    _wav.write_wav(path, np.asarray(audio), sample_rate, bits=bits)


def get_audio_duration(path) -> float:
    """Duration in seconds from headers only (no full decode when possible)."""
    if isinstance(path, str) and path.rstrip().endswith("|"):
        from ssak_tpu.audio.soxcmd import pipe_command_duration

        return pipe_command_duration(path)
    ext = os.path.splitext(str(path))[1].lower()
    if ext == ".wav":
        return _wav.wav_info(path).duration
    if ext == ".mp3":
        from ssak_tpu.audio import mp3 as _mp3

        return _mp3.mp3_duration(path)
    from ssak_tpu.audio import flac as _flac

    return _flac.flac_duration(path)


def get_audio_total_duration(paths) -> float:
    return float(sum(get_audio_duration(p) for p in paths))


def mix_audios(paths, output_path, sample_rate: int = 16000):
    """Mix several audio files into one (sum, renormalized if clipping)."""
    sigs = [load_audio(p, sample_rate=sample_rate) for p in paths]
    n = max(len(s) for s in sigs)
    out = np.zeros(n, dtype=np.float32)
    for s in sigs:
        out[: len(s)] += s
    peak = np.abs(out).max()
    if peak > 1.0:
        out /= peak
    save_audio(output_path, out, sample_rate)
    return output_path
