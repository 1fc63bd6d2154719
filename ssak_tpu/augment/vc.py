"""Trainable neural voice conversion (any-to-one), pure JAX.

Counterpart of the reference's so-vits-svc wrapper
(ssak/utils/voice_conversion.py:258 _convert_voice: per-segment random
target speaker, writes an augmented Kaldi dir). The reference depends on
downloaded pretrained SVC checkpoints; offline, the capability is delivered
as a TRAINABLE converter — the same pattern as the NN VAD (align/nn_vad.py
vs silero): you train a target-speaker model from that speaker's audio,
then convert any source voice to it.

Design (TPU-shaped, everything static-shape jax):
- analysis/synthesis: magnitude STFT as matmul-DFT (ops/logmel machinery),
  log-mel features, mel pseudo-inverse + Griffin-Lim phase recovery as a
  lax.fori_loop of matmuls (no FFT ladder, no scipy).
- converter network: dilated residual 1-D conv stack over mel frames with
  a learned target-voice bias — enough capacity to retime
  spectral envelopes, small enough to train on CPU in tests.
- training: perturbation-invariance. Inputs are pitch/formant-warped
  variants of the target speaker's own audio (polyphase resample trick:
  speed change + mel frequency warp), targets are the clean mels. The
  network learns warp-invariant -> target-voice mapping, so at inference
  a different speaker's mel maps toward the target timbre (the any-to-one
  training shortcut; no content encoder checkpoint needed).
"""

import math
import os

import numpy as np

import jax
import jax.numpy as jnp

N_FFT = 400
HOP = 160
SR = 16000


# --- STFT / iSTFT / Griffin-Lim as matmuls --------------------------------


def _analysis_mats():
    from ssak_tpu.ops.logmel import dft_matrices

    return dft_matrices(N_FFT)  # hann pre-applied, (n_fft, 201)


def _synthesis_mats():
    """Inverse windowed DFT (201, n_fft) + OLA window-square normalizer."""
    from ssak_tpu.ops.logmel import hann_window

    n, F = N_FFT, N_FFT // 2 + 1
    k = np.arange(F)[:, None]
    t = np.arange(n)[None, :]
    c = np.full((F, 1), 2.0 / n, np.float32)
    c[0] = c[-1] = 1.0 / n
    w = hann_window(n)[None, :]
    icos = (np.cos(2 * np.pi * k * t / n) * c * w).astype(np.float32)
    isin = (-np.sin(2 * np.pi * k * t / n) * c * w).astype(np.float32)
    return icos, isin, (w[0] ** 2)


def stft(audio):
    """(T,) -> (F_frames, 201) complex as (re, im). Center-padded."""
    cos_m, sin_m = _analysis_mats()
    pad = N_FFT // 2
    x = jnp.pad(audio, (pad, pad), mode="reflect")
    n_frames = 1 + (x.shape[-1] - N_FFT) // HOP
    idx = np.arange(N_FFT)[None, :] + HOP * np.arange(n_frames)[:, None]
    frames = x[idx]
    return frames @ jnp.asarray(cos_m), frames @ jnp.asarray(sin_m)


def istft(re, im, n_samples: int):
    """(F_frames, 201) re/im -> (n_samples,) via windowed OLA."""
    icos, isin, w2 = _synthesis_mats()
    frames = re @ jnp.asarray(icos) + im @ jnp.asarray(isin)  # (F, n_fft)
    n_frames = frames.shape[0]
    total = (n_frames - 1) * HOP + N_FFT
    idx = np.arange(N_FFT)[None, :] + HOP * np.arange(n_frames)[:, None]
    sig = jnp.zeros((total,), frames.dtype).at[idx.reshape(-1)].add(frames.reshape(-1))
    den = np.zeros((total,), np.float32)
    np.add.at(den, idx.reshape(-1), np.tile(w2, n_frames))
    sig = sig / jnp.asarray(np.maximum(den, 1e-8))
    pad = N_FFT // 2
    return sig[pad : pad + n_samples]


def griffin_lim(mag, n_samples: int, iters: int = 32):
    """Phase recovery from a magnitude spectrogram (F_frames, 201)."""

    def body(_, ph):
        re, im = mag * jnp.cos(ph), mag * jnp.sin(ph)
        x = istft(re, im, n_samples)
        re2, im2 = stft(x)
        return jnp.arctan2(im2, re2)

    ph = jax.lax.fori_loop(0, iters, body, jnp.zeros_like(mag))
    return istft(mag * jnp.cos(ph), mag * jnp.sin(ph), n_samples)


# --- mel features ----------------------------------------------------------


def _mel_fb(n_mels):
    from ssak_tpu.ops.logmel import mel_filterbank

    return mel_filterbank(n_mels, N_FFT)  # (n_mels, 201)


def audio_to_logmel(audio, n_mels: int = 80):
    re, im = stft(audio)
    mag = jnp.sqrt(re**2 + im**2 + 1e-10)
    mel = mag @ jnp.asarray(_mel_fb(n_mels)).T
    return jnp.log(mel + 1e-5)  # (F_frames, n_mels)


def logmel_to_audio(logmel, n_samples: int, iters: int = 32):
    """Mel pseudo-inverse -> linear magnitude -> Griffin-Lim."""
    fb = _mel_fb(logmel.shape[-1])
    pinv = np.linalg.pinv(fb).astype(np.float32)  # (201, n_mels) -> inv
    mag = jnp.clip((jnp.exp(logmel) - 1e-5) @ jnp.asarray(pinv.T), 0.0, None)
    return griffin_lim(mag, n_samples, iters=iters)


# --- converter network ------------------------------------------------------


def init_vc_params(key, n_mels: int = 80, hidden: int = 128, blocks: int = 4, kernel: int = 5):
    from ssak_tpu.models import layers as L

    ks = jax.random.split(key, 2 * blocks + 3)
    p = {
        "inp": L.conv_init(ks[0], kernel, n_mels, hidden),
        "blocks": [],
        "out": L.conv_init(ks[1], kernel, hidden, n_mels),
        "voice": jnp.zeros((n_mels,), jnp.float32),  # learned target-voice bias
    }
    for b in range(blocks):
        p["blocks"].append({
            "c1": L.conv_init(ks[2 + 2 * b], kernel, hidden, hidden),
            "c2": L.conv_init(ks[3 + 2 * b], kernel, hidden, hidden),
            "ln": L.ln_init(hidden),
        })
    return p


def vc_forward(params, logmel):
    """logmel (T, M) or (B, T, M) -> converted logmel, same shape."""
    from ssak_tpu.models import layers as L

    squeeze = logmel.ndim == 2
    x = logmel[None] if squeeze else logmel
    h = jax.nn.gelu(L.conv1d(x, params["inp"], padding="SAME", dtype=jnp.float32))
    for i, blk in enumerate(params["blocks"]):
        d = 2**i  # dilated receptive field over frames
        y = L.layer_norm(h, blk["ln"])
        y = jax.nn.gelu(_dilated_conv(y, blk["c1"], d))
        y = _dilated_conv(y, blk["c2"], 1)
        h = h + y
    out = L.conv1d(h, params["out"], padding="SAME", dtype=jnp.float32)
    # residual around identity: the net learns the voice DELTA (faster
    # convergence, graceful degradation when untrained)
    out = x + out + params["voice"][None, None, :]
    return out[0] if squeeze else out


def _dilated_conv(x, p, dilation: int):
    k = p["kernel"].shape[0]
    pad = (k - 1) // 2 * dilation
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), p["kernel"].astype(jnp.float32), window_strides=(1,),
        padding=[(pad, pad)], rhs_dilation=(dilation,), dimension_numbers=("NHC", "HIO", "NHC"),
    )
    return y + p["bias"] if "bias" in p else y


# --- training ---------------------------------------------------------------


def _perturb_source(audio, rng, sample_rate=SR):
    """Make the target speaker's audio sound like ANOTHER speaker: polyphase
    resample (pitch+formant shift up/down) re-cropped to the original
    length. The converter must undo whatever this does -> warp invariance."""
    from ssak_tpu.audio.resample import resample

    ratio = float(rng.uniform(0.78, 1.28))
    sr2 = int(round(sample_rate * ratio / 100.0) * 100)
    if sr2 == sample_rate:
        return audio
    warped = resample(audio, sample_rate, sr2)
    n = len(audio)
    if len(warped) >= n:
        return warped[:n]
    return np.pad(warped, (0, n - len(warped)))


def train_voice_converter(
    target_audios, steps: int = 300, lr: float = 2e-3, n_mels: int = 80,
    hidden: int = 128, blocks: int = 4, segment_s: float = 2.0, batch: int = 8,
    seed: int = 0, sample_rate: int = SR, log_every: int = 50,
):
    """Train an any-to-one converter from the TARGET speaker's raw audio
    (list of float32 arrays). Returns (params, losses)."""
    import optax

    from ssak_tpu.utils.monitoring import logger

    rng = np.random.RandomState(seed)
    params = init_vc_params(jax.random.PRNGKey(seed), n_mels=n_mels, hidden=hidden, blocks=blocks)
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    seg = int(segment_s * sample_rate)
    pool = [a.astype(np.float32) for a in target_audios if len(a) >= HOP * 8]
    if not pool:
        raise ValueError("no usable target audio (need clips >= 80 ms)")

    @jax.jit
    def step(params, opt_state, src_mel, tgt_mel):
        def loss_fn(p):
            pred = vc_forward(p, src_mel)
            return jnp.mean(jnp.abs(pred - tgt_mel))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    def sample_pair():
        a = pool[rng.randint(len(pool))]
        if len(a) > seg:
            o = rng.randint(len(a) - seg + 1)
            a = a[o : o + seg]
        else:
            a = np.pad(a, (0, seg - len(a)))
        src = _perturb_source(a, rng, sample_rate)
        return src, a

    losses = []
    for it in range(steps):
        pairs = [sample_pair() for _ in range(batch)]
        src = jnp.asarray(np.stack([p[0] for p in pairs]))
        tgt = jnp.asarray(np.stack([p[1] for p in pairs]))
        src_mel = jax.vmap(lambda x: audio_to_logmel(x, n_mels))(src)
        tgt_mel = jax.vmap(lambda x: audio_to_logmel(x, n_mels))(tgt)
        params, opt_state, loss = step(params, opt_state, src_mel, tgt_mel)
        losses.append(float(loss))
        if log_every and (it + 1) % log_every == 0:
            logger.info(f"vc train step {it + 1}/{steps}: L1 {losses[-1]:.4f}")
    return params, losses


# --- inference ---------------------------------------------------------------


def convert_voice(params, audio, sample_rate: int = SR, gl_iters: int = 32):
    """Convert a waveform to the trained target voice. Output matches the
    input length and RMS (the downstream Kaldi segments stay aligned)."""
    audio = np.asarray(audio, np.float32)
    n = len(audio)
    n_mels = int(params["inp"]["kernel"].shape[1])
    mel = audio_to_logmel(jnp.asarray(audio), n_mels)
    mel2 = vc_forward(params, mel)
    out = np.asarray(logmel_to_audio(mel2, n, iters=gl_iters))
    rms_in = float(np.sqrt(np.mean(audio**2)) + 1e-9)
    rms_out = float(np.sqrt(np.mean(out**2)) + 1e-9)
    return np.clip(out * (rms_in / rms_out), -1.0, 1.0)


def save_vc(params, path: str):
    from ssak_tpu.train.checkpoint import _flatten

    np.savez(path, **_flatten(jax.tree_util.tree_map(np.asarray, params)))


def load_vc(path: str):
    from ssak_tpu.train.checkpoint import _unflatten

    with np.load(path, allow_pickle=False) as z:
        return _unflatten({k: z[k] for k in z.files})


# --- Kaldi-dir conversion (the reference tool's semantics) -------------------


def convert_kaldi_dir(
    kaldi_in: str, model_paths, out_dir: str, audio_out_dir: str = None,
    seed: int = 0, sample_rate: int = SR, gl_iters: int = 24,
):
    """Convert every segment of a Kaldi dir with a randomly chosen target-
    voice model per segment (reference _convert_voice per_chunk mode),
    writing a new augmented Kaldi dir + wavs. model_paths: one or more .npz
    from save_vc. Ids get a 'vc_' prefix like the reference's
    '<initials>_augmented_' naming."""
    from ssak_tpu.audio import load_audio, save_audio
    from ssak_tpu.data.dataset import kaldi_folder_to_manifest

    rng = np.random.RandomState(seed)
    if isinstance(model_paths, (str, os.PathLike)):
        model_paths = [model_paths]
    models = [load_vc(p) for p in model_paths]
    audio_out_dir = audio_out_dir or os.path.join(out_dir, "wavs")
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(audio_out_dir, exist_ok=True)

    _, rows = kaldi_folder_to_manifest(kaldi_in)
    with open(os.path.join(out_dir, "text"), "w", encoding="utf-8") as ftext, \
         open(os.path.join(out_dir, "wav.scp"), "w", encoding="utf-8") as fwav, \
         open(os.path.join(out_dir, "utt2spk"), "w", encoding="utf-8") as futt2spk, \
         open(os.path.join(out_dir, "utt2dur"), "w", encoding="utf-8") as futt2dur:
        for r in rows:
            audio = load_audio(r["audio"], start=r.get("start"), end=r.get("end"), sample_rate=sample_rate)
            k = rng.randint(len(models))
            out = convert_voice(models[k], audio, sample_rate, gl_iters=gl_iters)
            uid = f"vc{k}_{r['id']}"
            wav_path = os.path.join(audio_out_dir, f"{uid}.wav")
            save_audio(wav_path, out, sample_rate)
            ftext.write(f"{uid} {r.get('text') or ''}\n")
            fwav.write(f"{uid} {wav_path}\n")
            futt2spk.write(f"{uid} vc{k}\n")
            futt2dur.write(f"{uid} {len(out) / sample_rate:.3f}\n")
    # spk2utt from utt2spk
    spk2utt = {}
    with open(os.path.join(out_dir, "utt2spk"), encoding="utf-8") as f:
        for line in f:
            u, s = line.split()
            spk2utt.setdefault(s, []).append(u)
    with open(os.path.join(out_dir, "spk2utt"), "w", encoding="utf-8") as f:
        for s in sorted(spk2utt):
            f.write(f"{s} {' '.join(spk2utt[s])}\n")
    return out_dir
