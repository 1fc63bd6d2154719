"""Audio ingest tests: WAV codec, offset reads, resampling, sox-pipe parsing.

Mirrors the coverage intent of reference tests/unittests/test_data_load.py
for the audio layer (pathological formats: 8 kHz, stereo, A-law), using the
loose-hash golden methodology of tests/unittests/utils.py:45-75.
"""

import os

import numpy as np
import pytest

from ssak_tpu.audio import (
    array_to_bytes,
    bytes_to_array,
    get_audio_duration,
    load_audio,
    resample,
    save_audio,
    to_mono,
)
from ssak_tpu.audio.wav import read_wav, wav_info, write_wav


def loosehash(x: np.ndarray):
    """{len, mean, std} rounded — machine-independent numeric fingerprint."""
    x = np.asarray(x, dtype=np.float64)
    return (x.size, round(float(x.mean()), 3), round(float(x.std()), 3))


def test_wav_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    x = (rng.randn(12345) * 0.2).clip(-1, 1).astype(np.float32)
    p = str(tmp_path / "x.wav")
    write_wav(p, x, 16000)
    y, sr = read_wav(p)
    assert sr == 16000
    assert y.shape == (12345, 1)
    assert np.abs(y[:, 0] - x).max() < 1.0 / 32767


def test_wav_offset_read(tmp_path):
    x = np.arange(1000, dtype=np.float32) / 2000.0
    p = str(tmp_path / "x.wav")
    write_wav(p, x, 8000)
    y, _ = read_wav(p, start_frame=100, n_frames=50)
    assert y.shape == (50, 1)
    assert np.abs(y[:, 0] - x[100:150]).max() < 1e-3


def test_wav_info_duration(tmp_audio_dir):
    info = wav_info(os.path.join(tmp_audio_dir, "tone16k.wav"))
    assert info.sample_rate == 16000
    assert abs(info.duration - 2.0) < 1e-6
    assert abs(get_audio_duration(os.path.join(tmp_audio_dir, "tone16k.wav")) - 2.0) < 1e-6


def test_load_audio_resamples_and_downmixes(tmp_audio_dir):
    a = load_audio(os.path.join(tmp_audio_dir, "noise8k.wav"), sample_rate=16000)
    assert a.ndim == 1
    assert abs(len(a) - 3 * 16000) <= 16
    s = load_audio(os.path.join(tmp_audio_dir, "stereo16k.wav"), sample_rate=16000)
    # the two channels cancel out in the mono downmix
    assert np.abs(s).max() < 1e-6


def test_load_audio_segment(tmp_audio_dir):
    a = load_audio(os.path.join(tmp_audio_dir, "tone16k.wav"), start=0.5, end=1.0, sample_rate=16000)
    assert abs(len(a) - 8000) <= 1


def test_bytes_roundtrip():
    x = np.linspace(-0.9, 0.9, 100).astype(np.float32)
    y = bytes_to_array(array_to_bytes(x))
    assert np.abs(x - y).max() < 1e-4


def test_resample_preserves_tone():
    t = np.arange(16000) / 16000.0
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = resample(x, 16000, 8000)
    assert abs(len(y) - 8000) <= 1
    # 440 Hz is well below the new Nyquist; energy must be preserved
    assert abs(np.std(y) - np.std(x)) < 0.01


def test_resample_jax_matches_host():
    from ssak_tpu.audio import resample_jax

    t = np.arange(4000) / 16000.0
    x = np.sin(2 * np.pi * 300 * t).astype(np.float32)
    y_host = resample(x, 16000, 8000)
    y_jax = np.asarray(resample_jax(x, 16000, 8000))
    n = min(len(y_host), len(y_jax))
    # ignore filter edges
    err = np.abs(y_host[100 : n - 100] - y_jax[100 : n - 100]).max()
    assert err < 0.02


# --- reference-fixture parity (skips when reference is absent) ------------


def test_reference_wav_fixtures(reference_data_dir):
    audio_dir = os.path.join(reference_data_dir, "audio")
    a = load_audio(os.path.join(audio_dir, "bonjour.wav"), sample_rate=16000)
    assert a.ndim == 1 and 16000 < len(a) < 32000  # ~1.2 s
    a8 = load_audio(os.path.join(audio_dir, "bonjour 8k.wav"), sample_rate=16000)
    assert abs(len(a8) - len(a)) < 100  # same utterance, upsampled
    alaw = load_audio(os.path.join(audio_dir, "tcof13bits.wav"), sample_rate=16000)
    assert alaw.ndim == 1 and len(alaw) > 16000
    st = load_audio(os.path.join(audio_dir, "tcof2channels.wav"), sample_rate=16000)
    assert st.ndim == 1


def test_reference_mp3_fixtures(reference_data_dir):
    pytest.importorskip("ssak_tpu.audio.native.build")
    from ssak_tpu.audio.native import get_native_lib

    if get_native_lib() is None:
        pytest.skip("native audio library not built")
    audio_dir = os.path.join(reference_data_dir, "audio")
    a = load_audio(os.path.join(audio_dir, "cfpp2channels.mp3"), sample_rate=16000)
    assert a.ndim == 1 and len(a) > 16000 * 5
    d = get_audio_duration(os.path.join(audio_dir, "cfpp2channels.mp3"))
    assert 9 < d < 11  # utt2dur says 10.03


def test_sox_pipe_decode(tmp_audio_dir, monkeypatch):
    monkeypatch.setenv("TESTAUDIO", tmp_audio_dir)
    a = load_audio("sox $TESTAUDIO/noise8k.wav -t wav -r 16k -b 16 -c 1 - |", sample_rate=16000)
    assert a.ndim == 1
    assert abs(len(a) - 3 * 16000) <= 16
    d = get_audio_duration("sox $TESTAUDIO/noise8k.wav -t wav -r 16k -b 16 -c 1 - |")
    assert abs(d - 3.0) < 0.01


def test_universal_decoder_matches_wav(tmp_audio_dir):
    """The native ffmpeg-backed decoder must agree with our WAV codec."""
    pytest.importorskip("ssak_tpu.audio.native.build")
    from ssak_tpu.audio.native import get_native_lib

    if get_native_lib() is None or not hasattr(get_native_lib(), "ssak_av_decode"):
        pytest.skip("native universal decoder not built")
    from ssak_tpu.audio.flac import read_any

    p = os.path.join(tmp_audio_dir, "tone16k.wav")
    a, sr = read_any(p)
    b, sr2 = read_wav(p)
    assert sr == sr2 == 16000
    assert a.shape == b.shape
    assert np.abs(a - b).max() < 1e-4


def test_universal_decoder_mp3_agrees_with_mpg123(reference_data_dir):
    from ssak_tpu.audio.native import get_native_lib

    lib = get_native_lib()
    if lib is None or not hasattr(lib, "ssak_av_decode"):
        pytest.skip("native universal decoder not built")
    from ssak_tpu.audio.flac import read_any
    from ssak_tpu.audio.mp3 import read_mp3

    p = os.path.join(reference_data_dir, "audio", "cfpp2channels.mp3")
    a, sr_a = read_any(p)
    b, sr_b = read_mp3(p)
    assert sr_a == sr_b
    # decoders may differ in delay-compensation padding; compare overlap RMS
    n = min(len(a), len(b))
    assert abs(len(a) - len(b)) < 5000
    ra = np.sqrt((a[:n] ** 2).mean())
    rb = np.sqrt((b[:n] ** 2).mean())
    assert abs(ra - rb) / max(ra, rb) < 0.05


def test_native_duration_scanner(reference_data_dir, tmp_audio_dir):
    """C++ parallel header scanner (wav-to-duration equivalent) agrees with
    the Python per-file path on WAV fixtures (incl. pathological 13-bit and
    stereo); mp3 yields None (fallback marker)."""
    import glob

    from ssak_tpu.audio import get_audio_duration
    from ssak_tpu.audio.native import get_native_lib, scan_durations

    if get_native_lib() is None:
        import pytest

        pytest.skip("native lib unavailable")
    wavs = sorted(glob.glob(os.path.join(reference_data_dir, "audio", "*.wav")))
    wavs += sorted(glob.glob(os.path.join(tmp_audio_dir, "*.wav")))
    mp3s = sorted(glob.glob(os.path.join(reference_data_dir, "audio", "*.mp3")))
    durs = scan_durations(wavs + mp3s, n_threads=4)
    assert len(durs) == len(wavs) + len(mp3s)
    for p, d in zip(wavs, durs):
        assert d is not None and abs(d - get_audio_duration(p)) < 1e-6, p
    for d in durs[len(wavs):]:
        assert d is None  # mp3 -> per-file fallback


def test_compute_durations_native_fast_path(reference_data_dir):
    """compute_durations (utt2dur engine) over a real kaldi dir with
    sox-pipe wav.scp entries mixes the native scan and pipe fallbacks."""
    from ssak_tpu.data.kaldi import compute_durations, parse_wavscp

    os.environ["DATAPATH"] = reference_data_dir
    scp = os.path.join(reference_data_dir, "kaldi", "small", "wav.scp")
    wavscp = parse_wavscp(scp)
    durs = compute_durations(wavscp)
    assert len(durs) == len(wavscp)
    assert all(0.1 < d < 1000 for d in durs.values()), durs
