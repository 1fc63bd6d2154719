"""Voice activity detection.

Counterpart of reference ssak/utils/vad.py (get_vad_segments:11 with
silero/pyannote/auditok backends, dilatation/merge :130-142,
remove_non_speech:172, convert_timestamps:241): the default engine is an
energy detector (auditok-equivalent) implemented with numpy/JAX; the API
keeps a `method` switch so NN engines can plug in.
"""

import numpy as np


def get_vad_segments(
    audio: np.ndarray,
    sample_rate: int = 16000,
    method: str = "energy",
    min_speech_duration: float = 0.25,
    min_silence_duration: float = 0.33,
    dilatation: float = 0.1,
    energy_threshold_db: float = -35.0,
    frame_ms: float = 30.0,
    nn_params=None,
    nn_threshold: float = 0.5,
):
    """Returns list of {"start": sec, "end": sec} speech segments.

    method: "energy" (auditok-equivalent, built in) or "nn" (trainable
    neural VAD, ssak_tpu.align.nn_vad — the silero-engine counterpart;
    pass nn_params from nn_vad.train_nn_vad/load_vad)."""
    if method == "nn":
        from ssak_tpu.align import nn_vad

        if nn_params is None:
            raise ValueError("method='nn' requires nn_params (train_nn_vad/load_vad)")
        probs = nn_vad.speech_probs(nn_params, audio, sample_rate)
        active = probs > nn_threshold
        frame = int(sample_rate * nn_vad.FRAME_MS / 1000)
        n_frames = len(active)
    elif method == "energy":
        frame = int(sample_rate * frame_ms / 1000)
        n_frames = max(1, len(audio) // frame)
        x = audio[: n_frames * frame].reshape(n_frames, frame)
        rms = np.sqrt((x**2).mean(axis=1) + 1e-12)
        db = 20 * np.log10(rms + 1e-12)
        # adaptive floor: threshold relative to loud frames
        ref = np.percentile(db, 95)
        active = db > max(ref + energy_threshold_db / 2, energy_threshold_db)
    else:
        raise NotImplementedError(f"VAD method {method!r} ('energy' or 'nn')")

    segs = []
    start = None
    for i, a in enumerate(active):
        if a and start is None:
            start = i
        elif not a and start is not None:
            segs.append((start, i))
            start = None
    if start is not None:
        segs.append((start, n_frames))

    sec = frame / sample_rate
    segs = [(s * sec, e * sec) for s, e in segs]
    segs = [(max(0, s - dilatation), min(len(audio) / sample_rate, e + dilatation)) for s, e in segs]
    # merge close segments
    merged = []
    for s, e in segs:
        if merged and s - merged[-1][1] < min_silence_duration:
            merged[-1] = (merged[-1][0], e)
        else:
            merged.append((s, e))
    merged = [(s, e) for s, e in merged if e - s >= min_speech_duration]
    return [{"start": float(s), "end": float(e)} for s, e in merged]


def remove_non_speech(
    audio: np.ndarray,
    sample_rate: int = 16000,
    use_sample: bool = False,
    **kwargs,
):
    """Concatenate speech segments; returns (audio, segments) where
    segments map positions in the new audio back to original times
    (reference vad.py:172)."""
    segs = get_vad_segments(audio, sample_rate, **kwargs)
    if not segs:
        return audio, [{"start": 0.0, "end": len(audio) / sample_rate, "new_start": 0.0, "new_end": len(audio) / sample_rate}]
    pieces = []
    mapping = []
    pos = 0.0
    for seg in segs:
        s, e = seg["start"], seg["end"]
        piece = audio[int(s * sample_rate) : int(e * sample_rate)]
        pieces.append(piece)
        mapping.append({"start": s, "end": e, "new_start": pos, "new_end": pos + (e - s)})
        pos += e - s
    return np.concatenate(pieces) if pieces else audio[:0], mapping


def convert_timestamps(timestamps, mapping):
    """Map {'start','end'} times in VAD-cropped audio back to original
    times using remove_non_speech's mapping (reference vad.py:241)."""
    out = []
    for ts in timestamps:
        s, e = ts["start"], ts["end"]
        out.append({**ts, "start": _map_time(s, mapping), "end": _map_time(e, mapping)})
    return out


def _map_time(t, mapping):
    for m in mapping:
        if m["new_start"] <= t <= m["new_end"]:
            return m["start"] + (t - m["new_start"])
    if mapping:
        last = mapping[-1]
        return last["end"]
    return t
