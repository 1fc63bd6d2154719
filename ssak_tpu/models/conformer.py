"""Conformer-CTC acoustic model in pure JAX.

Covers the reference's third trainer family — NeMo Conformer/Parakeet CTC
(ssak/train/nemo/train.py, yamls/finetuning.yaml) — as a native model:
log-mel features -> conv subsampling (x4) -> N conformer blocks
(half-step FFN, MHSA with rotary position embeddings, depthwise conv
module, half-step FFN, final LN) -> CTC head.

Two attention variants: RoPE (native; same relative-position capability as
NeMo's attention with a far better TPU fit — no per-pair bias matrix, just
elementwise rotations fused into the attention matmuls) and Transformer-XL
rel-pos with pos_bias_u/v (cfg.pos_type="relpos") for bit-compatibility
with pretrained NeMo/Parakeet checkpoints imported by
models/hf_loader.load_nemo_conformer (reference
ssak/train/nemo/train_utils.py:15 get_base_model). Parity for the relpos
block is pinned against torch in tests/test_nemo_parity.py.
"""

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from ssak_tpu.models import layers as L


@dataclass(frozen=True)
class ConformerConfig:
    n_mels: int = 80
    d_model: int = 256
    num_layers: int = 16
    num_heads: int = 4
    ff_expansion: int = 4
    conv_kernel: int = 31
    subsampling_factor: int = 4
    vocab_size: int = 128
    blank_id: int = 0
    dtype: str = "bfloat16"
    # NeMo/ESPnet checkpoint-compatible variant (models/hf_loader.py
    # load_nemo_conformer; reference ssak/train/nemo/train_utils.py:15
    # get_base_model loads pretrained Parakeet/Conformer this way):
    # pos_type "relpos" = Transformer-XL relative-position attention with
    # pos_bias_u/v; subsampling "striding2d" = NeMo pre_encode Conv2d stack;
    # conv_norm "affine" = folded (eval-mode) BatchNorm; xscale multiplies
    # the encoder input by sqrt(d_model) (NeMo xscaling: true).
    pos_type: str = "rope"
    subsampling: str = "conv1d"
    conv_norm: str = "ln"
    xscale: bool = False
    # "whisper" = ops/logmel.log_mel_spectrogram; "nemo" = the NeMo
    # preprocessor math (ops/logmel.nemo_log_mel_spectrogram) that imported
    # checkpoints were trained on
    frontend: str = "whisper"

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


PRESETS = {
    # NeMo conformer_ctc_small/medium/large dims
    "small": dict(d_model=176, num_layers=16, num_heads=4),
    "medium": dict(d_model=256, num_layers=16, num_heads=4),
    "large": dict(d_model=512, num_layers=17, num_heads=8),
    "tiny_test": dict(d_model=64, num_layers=2, num_heads=2, conv_kernel=7, vocab_size=32),
}


def make_config(name: str = "medium", **overrides) -> ConformerConfig:
    kw = dict(PRESETS[name])
    kw.update(overrides)
    return ConformerConfig(**kw)


# --- rotary position embedding -------------------------------------------


def _rope(x, positions):
    """x: (B, T, H, Dh) -> rotated pairs; positions: (T,)."""
    Dh = x.shape[-1]
    half = Dh // 2
    freqs = 10000.0 ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    ang = positions[:, None] * freqs[None, :]  # (T, half)
    cos = jnp.cos(ang)[None, :, None, :]
    sin = jnp.sin(ang)[None, :, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)


# --- parameter init -------------------------------------------------------


def _block_init(key, cfg: ConformerConfig):
    d = cfg.d_model
    ff = cfg.ff_expansion * d
    ks = jax.random.split(key, 12)
    extra = {}
    if cfg.pos_type == "relpos":
        dh = d // cfg.num_heads
        extra = {
            "linear_pos": L.linear_init(ks[11], d, d, bias=False),
            "pos_bias_u": jnp.zeros((cfg.num_heads, dh), jnp.float32),
            "pos_bias_v": jnp.zeros((cfg.num_heads, dh), jnp.float32),
        }
    return {
        "ff1_ln": L.ln_init(d),
        "ff1": {"fc1": L.linear_init(ks[0], d, ff), "fc2": L.linear_init(ks[1], ff, d)},
        "attn_ln": L.ln_init(d),
        "attn": {
            "query": L.linear_init(ks[2], d, d),
            "key": L.linear_init(ks[3], d, d),
            "value": L.linear_init(ks[4], d, d),
            "out": L.linear_init(ks[5], d, d),
            **extra,
        },
        "conv_ln": L.ln_init(d),
        "conv": {
            "pointwise1": L.linear_init(ks[6], d, 2 * d),  # GLU
            "depthwise": L.conv_init(ks[7], cfg.conv_kernel, d, d, groups=d),
            "bn": L.ln_init(d),  # layernorm in place of batchnorm (stateless)
            "pointwise2": L.linear_init(ks[8], d, d),
        },
        "ff2_ln": L.ln_init(d),
        "ff2": {"fc1": L.linear_init(ks[9], d, ff), "fc2": L.linear_init(ks[10], ff, d)},
        "final_ln": L.ln_init(d),
    }


def _sub2d_out_len(n, k=3, s=2, p=1):
    return (n + 2 * p - k) // s + 1


def init_params(key, cfg: ConformerConfig):
    ks = jax.random.split(key, 4 + cfg.num_layers)
    d = cfg.d_model
    if cfg.subsampling == "striding2d":
        f_out = _sub2d_out_len(_sub2d_out_len(cfg.n_mels))
        sub = {
            # HWIO 2-D kernels (torch Conv2d OIHW transposed at import)
            "conv1": {"kernel": jax.random.normal(ks[0], (3, 3, 1, d), jnp.float32) * 0.1,
                      "bias": jnp.zeros((d,), jnp.float32)},
            "conv2": {"kernel": jax.random.normal(ks[1], (3, 3, d, d), jnp.float32) * 0.02,
                      "bias": jnp.zeros((d,), jnp.float32)},
            "proj": L.linear_init(ks[2], d * f_out, d),
        }
    else:
        sub = {
            "conv1": L.conv_init(ks[0], 3, cfg.n_mels, d),
            "conv2": L.conv_init(ks[1], 3, d, d),
            "proj": L.linear_init(ks[2], d, d),
        }
    params = {
        "subsampling": sub,
        "blocks": [_block_init(ks[4 + i], cfg) for i in range(cfg.num_layers)],
        "lm_head": L.linear_init(ks[3], d, cfg.vocab_size),
    }
    return params


# --- forward --------------------------------------------------------------


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _conv_module(x, p, cfg, pad_mask):
    """Depthwise-separable conv module with GLU (conformer)."""
    dt = cfg.compute_dtype
    h = L.dense(x, p["pointwise1"], dt)
    a, b = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(b)  # GLU
    h = jnp.where(pad_mask[..., None], h, 0.0)
    k = cfg.conv_kernel
    h = L.conv1d(h, p["depthwise"], stride=1, padding=(k // 2, k // 2), groups=cfg.d_model, dtype=dt)
    if cfg.conv_norm == "affine":
        # eval-mode BatchNorm folded at import: y = x * scale + bias
        h = (h.astype(jnp.float32) * p["bn"]["scale"] + p["bn"]["bias"]).astype(h.dtype)
    else:
        h = L.layer_norm(h, p["bn"])
    h = _swish(h)
    return L.dense(h, p["pointwise2"], dt)


def _attention_rope(x, p, cfg, pad_mask):
    dt = cfg.compute_dtype
    B, T, _ = x.shape
    q = L.split_heads(L.dense(x, p["query"], dt), cfg.num_heads)
    k = L.split_heads(L.dense(x, p["key"], dt), cfg.num_heads)
    v = L.split_heads(L.dense(x, p["value"], dt), cfg.num_heads)
    positions = jnp.arange(T, dtype=jnp.float32)
    q = _rope(q, positions)
    k = _rope(k, positions)
    mask = pad_mask[:, None, None, :]
    y = L.attention(q, k, v, mask=mask, dtype=dt)
    return L.dense(L.merge_heads(y), p["out"], dt)


def _relpos_table(T: int, d: int):
    """(2T-1, d) sinusoidal relative-position table, row j = position
    p = T-1-j (the ESPnet RelPositionalEncoding layout NeMo checkpoints were
    trained against: [T-1 ... 1, 0, -1 ... -(T-1)], sin at even dims, cos at
    odd; sin/cos parity makes one formula cover negative positions)."""
    import math

    pos = jnp.arange(T - 1, -T, -1, dtype=jnp.float32)  # (2T-1,)
    div = jnp.exp(jnp.arange(0, d, 2, dtype=jnp.float32) * (-math.log(10000.0) / d))
    ang = pos[:, None] * div[None, :]  # (2T-1, d/2)
    # interleave sin/cos columns scatter-free: (2T-1, d/2, 2) -> (2T-1, d)
    return jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1).reshape(2 * T - 1, d)


def _rel_shift(x):
    """(B, H, T, 2T-1) raw position scores -> (B, H, T, T) aligned so
    out[i, j] = in[i, T-1-i+j] (relative position i-j). The pad/reshape
    trick is the standard Transformer-XL shift."""
    B, H, T, Lr = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(B, H, Lr + 1, T)
    return x[:, :, 1:].reshape(B, H, T, Lr)[:, :, :, :T]


def _attention_relpos(x, p, cfg, pad_mask):
    """Transformer-XL relative-position MHSA (matrices AC + shifted BD with
    pos_bias_u/v), the attention form of NeMo/ESPnet conformer checkpoints."""
    import math

    dt = cfg.compute_dtype
    B, T, _ = x.shape
    H = cfg.num_heads
    q = L.split_heads(L.dense(x, p["query"], dt), H)  # (B, T, H, Dh)
    k = L.split_heads(L.dense(x, p["key"], dt), H)
    v = L.split_heads(L.dense(x, p["value"], dt), H)
    Dh = q.shape[-1]
    pe = _relpos_table(T, cfg.d_model)
    pos = L.dense(pe[None].astype(dt), p["linear_pos"], dt)[0].reshape(2 * T - 1, H, Dh)
    qu = q + p["pos_bias_u"].astype(dt)
    qv = q + p["pos_bias_v"].astype(dt)
    ac = jnp.einsum("bthd,bshd->bhts", qu, k, preferred_element_type=jnp.float32)
    bd = _rel_shift(jnp.einsum("bthd,lhd->bhtl", qv, pos, preferred_element_type=jnp.float32))
    scores = (ac + bd) / math.sqrt(Dh)
    scores = jnp.where(pad_mask[:, None, None, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    y = jnp.einsum("bhts,bshd->bthd", probs.astype(dt), v, preferred_element_type=jnp.float32).astype(dt)
    return L.dense(L.merge_heads(y), p["out"], dt)


def subsample(params, mel, cfg: ConformerConfig):
    """mel: (B, n_mels, T) -> (B, T//4, d_model) via 2 strided convs."""
    dt = cfg.compute_dtype
    if cfg.subsampling == "striding2d":
        return _subsample_striding2d(params, mel, cfg)
    x = mel.swapaxes(-2, -1)  # (B, T, n_mels)
    x = L.gelu(L.conv1d(x, params["subsampling"]["conv1"], stride=2, padding=(1, 1), dtype=dt))
    x = L.gelu(L.conv1d(x, params["subsampling"]["conv2"], stride=2, padding=(1, 1), dtype=dt))
    return L.dense(x, params["subsampling"]["proj"], dt)


def _subsample_striding2d(params, mel, cfg: ConformerConfig):
    """NeMo pre_encode: two stride-2 Conv2d+ReLU over the (time, freq) plane
    of a single-channel mel image, then a linear over channel-major
    (C, F//4) features — the layout pretrained NeMo weights expect."""
    dt = cfg.compute_dtype
    x = mel.swapaxes(-2, -1)[..., None]  # (B, T, F, 1)
    for name in ("conv1", "conv2"):
        p = params["subsampling"][name]
        x = jax.lax.conv_general_dilated(
            x.astype(dt), p["kernel"].astype(dt), window_strides=(2, 2),
            padding=((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = jax.nn.relu(x + p["bias"].astype(dt))
    B, T4, F4, C = x.shape
    x = x.transpose(0, 1, 3, 2).reshape(B, T4, C * F4)  # torch (B,C,T,F) channel-major flatten
    return L.dense(x, params["subsampling"]["proj"], dt)


def subsampled_length(cfg: ConformerConfig, n_frames):
    n = n_frames
    for _ in range(2):
        n = (n + 1) // 2
    return n


def mel_frame_count(cfg: ConformerConfig, n_samples: int) -> int:
    """Mel frames produced from n_samples of 16 kHz audio (frontend-
    dependent: whisper drops the final centered frame, nemo keeps it)."""
    return n_samples // 160 + (1 if cfg.frontend == "nemo" else 0)


def encode(params, mel, cfg: ConformerConfig, frame_lengths=None, time_mask=None):
    """mel: (B, n_mels, T). Returns (hidden (B, T', D), lengths (B,)).
    time_mask: optional bool (B, T') — masked subsampled frames zeroed
    (on-device SpecAugment span masking, same semantics as wav2vec2)."""
    x = subsample(params, mel, cfg)
    if cfg.xscale:
        x = x * jnp.asarray(cfg.d_model ** 0.5, x.dtype)  # NeMo xscaling: true
    if time_mask is not None:
        x = jnp.where(time_mask[:, : x.shape[1], None], 0.0, x)
    T = x.shape[1]
    lengths = (
        subsampled_length(cfg, frame_lengths) if frame_lengths is not None
        else jnp.full((x.shape[0],), T, jnp.int32)
    )
    pad_mask = jnp.arange(T)[None, :] < lengths[:, None]
    attention = _attention_relpos if cfg.pos_type == "relpos" else _attention_rope
    for blk in params["blocks"]:
        x = x + 0.5 * L.mlp(L.layer_norm(x, blk["ff1_ln"]), blk["ff1"], dtype=cfg.compute_dtype, activation=_swish)
        x = x + attention(L.layer_norm(x, blk["attn_ln"]), blk["attn"], cfg, pad_mask)
        x = x + _conv_module(L.layer_norm(x, blk["conv_ln"]), blk["conv"], cfg, pad_mask)
        x = x + 0.5 * L.mlp(L.layer_norm(x, blk["ff2_ln"]), blk["ff2"], dtype=cfg.compute_dtype, activation=_swish)
        x = L.layer_norm(x, blk["final_ln"])
    return x, lengths


def ctc_logits_from_mel(params, mel, cfg: ConformerConfig, frame_lengths=None, time_mask=None):
    hidden, lengths = encode(params, mel, cfg, frame_lengths, time_mask=time_mask)
    logits = L.dense(hidden, params["lm_head"], cfg.compute_dtype)
    return logits, lengths


def ctc_log_probs(params, waveform, cfg: ConformerConfig, sample_lengths=None, time_mask=None):
    """Waveform front-end: log-mel -> encoder -> log-probs, like the other
    families (waveform (B, T) at 16 kHz). cfg.frontend picks the feature
    math — NeMo-imported checkpoints need the NeMo preprocessor."""
    from ssak_tpu.ops.logmel import HOP_LENGTH, log_mel_spectrogram, nemo_log_mel_spectrogram

    if cfg.frontend == "nemo":
        mel, frame_lengths = nemo_log_mel_spectrogram(waveform, n_mels=cfg.n_mels, sample_lengths=sample_lengths)
    else:
        mel = log_mel_spectrogram(waveform, n_mels=cfg.n_mels)
        frame_lengths = (
            jnp.minimum(sample_lengths // HOP_LENGTH, mel.shape[-1]) if sample_lengths is not None else None
        )
    logits, lengths = ctc_logits_from_mel(params, mel, cfg, frame_lengths, time_mask=time_mask)
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1), lengths
