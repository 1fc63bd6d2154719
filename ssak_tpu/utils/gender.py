"""Speaker gender classification.

Counterpart of reference ssak/utils/gender.py (Wav2Vec2ForSpeechClassification
:51 with mean-pool merged_strategy:66, predict_gender:242): a classification
head (mean-pooled wav2vec2 hidden states -> dense) when a checkpoint is
available, plus a pitch-based DSP fallback that needs no model (median F0
via autocorrelation: female voices typically > 165 Hz, male < 155 Hz).
"""

import numpy as np


def estimate_f0_autocorr(audio: np.ndarray, sample_rate: int = 16000, fmin: float = 60.0, fmax: float = 400.0, frame_s: float = 0.04):
    """Median fundamental frequency over voiced frames (autocorrelation)."""
    frame = int(sample_rate * frame_s)
    hop = frame // 2
    lags_min = int(sample_rate / fmax)
    lags_max = int(sample_rate / fmin)
    f0s = []
    for start in range(0, max(1, len(audio) - frame), hop):
        x = audio[start : start + frame]
        if len(x) < frame or np.sqrt((x**2).mean() + 1e-12) < 0.01:
            continue
        x = x - x.mean()
        ac = np.correlate(x, x, mode="full")[len(x) - 1 :]
        if ac[0] <= 0:
            continue
        ac = ac / ac[0]
        seg = ac[lags_min:lags_max]
        if len(seg) == 0:
            continue
        peak = int(np.argmax(seg)) + lags_min
        # voiced only when the autocorrelation peak is strong
        if ac[peak] > 0.5:
            f0s.append(sample_rate / peak)
    return float(np.median(f0s)) if f0s else 0.0


def predict_gender(
    audio,
    sample_rate: int = 16000,
    model=None,
    return_proba: bool = False,
):
    """'m' | 'f' (or probabilities). model: optional LoadedModel with a
    classification head; default is the pitch heuristic."""
    audio = np.asarray(audio, np.float32)
    if model is not None:
        probs = classify_speech(model, audio)
        label = "f" if probs.get("f", 0) >= probs.get("m", 0) else "m"
        return probs if return_proba else label
    f0 = estimate_f0_autocorr(audio, sample_rate)
    if f0 <= 0:
        return {"m": 0.5, "f": 0.5} if return_proba else "m"
    # logistic transition centered at 160 Hz
    pf = 1.0 / (1.0 + np.exp(-(f0 - 160.0) / 12.0))
    if return_proba:
        return {"m": float(1 - pf), "f": float(pf), "f0": f0}
    return "f" if pf >= 0.5 else "m"


def classify_speech(model, audio, labels=("m", "f")):
    """Mean-pooled wav2vec2 hidden states -> classifier head (the reference
    merged_strategy='mean'). model.params must carry 'classifier': {kernel,
    bias} on top of the encoder."""
    import jax.numpy as jnp

    from ssak_tpu.models import wav2vec2
    from ssak_tpu.models.layers import dense

    hidden, fl = wav2vec2.encode(model.params, jnp.asarray(audio[None]), model.cfg)
    n = int(fl[0])
    pooled = hidden[:, :n].mean(axis=1)
    logits = dense(pooled, model.params["classifier"])
    probs = np.asarray(jnp.squeeze(jnp.exp(logits - jnp.logaddexp.reduce(logits, axis=-1, keepdims=True)), 0))
    return {lab: float(p) for lab, p in zip(labels, probs)}


def predict_gender_kaldi_dir(kaldi_dir: str, output_path: str = None, sample_rate: int = 16000):
    """Fill spk2gender for a Kaldi dir by majority vote over each speaker's
    utterances."""
    from collections import Counter, defaultdict

    from ssak_tpu.audio import load_audio
    from ssak_tpu.data.dataset import kaldi_folder_to_manifest
    from ssak_tpu.data.kaldi import write_keyed_file

    _meta, rows = kaldi_folder_to_manifest(kaldi_dir)
    votes = defaultdict(Counter)
    for r in rows:
        audio = load_audio(r["audio"], start=r["start"], end=r["end"], sample_rate=sample_rate)
        votes[r["speaker"] or r["id"]][predict_gender(audio, sample_rate)] += 1
    s2g = {spk: c.most_common(1)[0][0] for spk, c in votes.items()}
    if output_path:
        write_keyed_file(output_path, s2g)
    return s2g
