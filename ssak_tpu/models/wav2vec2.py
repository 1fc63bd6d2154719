"""wav2vec2-style CTC acoustic model in pure JAX.

TPU-native counterpart of the reference's HF Wav2Vec2ForCTC / SpeechBrain
wav2vec2 paths (ssak/infer/transformers_infer.py, train/transformers/
wav2vec_train.py): raw-waveform conv feature encoder, feature projection,
transformer encoder with convolutional relative positional embedding, CTC
head.  Supports both HF variants: do_stable_layer_norm=False (base: group
norm on conv0, post-LN blocks) and True (large/XLSR: per-conv layer norm,
pre-LN blocks).  Weights import via ssak_tpu.models.hf_loader.
"""

from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp

from ssak_tpu.models import layers as L


@dataclass(frozen=True)
class Wav2Vec2Config:
    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    do_stable_layer_norm: bool = False
    vocab_size: int = 32
    blank_id: int = 0
    dtype: str = "bfloat16"
    # Mixture-of-Experts FFN (expert parallelism over an 'expert' mesh
    # axis — ssak_tpu.parallel.moe). 0 = dense MLP (the HF architecture).
    num_experts: int = 0
    moe_top_k: int = 2
    # MMS-style per-layer attention adapters (HF adapter_attn_dim; the
    # reference loads these per language via model.load_adapter(language),
    # ssak/infer/transformers_infer.py:214). 0 = no adapters.
    adapter_attn_dim: int = 0
    # rematerialize each transformer block in the backward pass: ~1/3 more
    # block FLOPs for O(layers) less activation HBM — how wav2vec2-LARGE
    # trains at batch 32 x 10 s on one chip (B=24 OOMs by 166 MB without)
    remat: bool = False

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


PRESETS = {
    "base": dict(),
    "large": dict(hidden_size=1024, num_layers=24, num_heads=16, intermediate_size=4096, do_stable_layer_norm=True, conv_bias=True),
    "xlsr": dict(hidden_size=1024, num_layers=24, num_heads=16, intermediate_size=4096, do_stable_layer_norm=True, conv_bias=True),
    # tiny dims but the REAL 320x downsampling (20 ms frames) so long-audio
    # attention stays realistic in tests
    "tiny_test": dict(conv_dim=(32, 32, 32), conv_kernel=(10, 8, 8), conv_stride=(5, 8, 8), hidden_size=64, num_layers=2, num_heads=2, intermediate_size=128, num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=2, vocab_size=32),
}


def make_config(name: str = "base", **overrides) -> Wav2Vec2Config:
    kw = dict(PRESETS[name])
    kw.update(overrides)
    return Wav2Vec2Config(**kw)


def feature_extract_output_length(cfg: Wav2Vec2Config, input_length):
    """Number of frames the conv stack produces for a waveform length."""
    n = input_length
    for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
        n = (n - k) // s + 1
    return n


def init_params(key, cfg: Wav2Vec2Config):
    ks = jax.random.split(key, 8 + len(cfg.conv_dim) + cfg.num_layers)
    D = cfg.hidden_size
    convs = []
    c_in = 1
    for i, (c_out, k) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel)):
        layer = {"conv": L.conv_init(ks[i], k, c_in, c_out, bias=cfg.conv_bias)}
        if cfg.do_stable_layer_norm:
            layer["layer_norm"] = L.ln_init(c_out)
        elif i == 0:
            layer["group_norm"] = L.ln_init(c_out)
        convs.append(layer)
        c_in = c_out
    n = len(cfg.conv_dim)
    blocks = []
    for i in range(cfg.num_layers):
        kb = jax.random.split(ks[8 + n + i], 8)
        block = {
            "attn": {
                "query": L.linear_init(kb[0], D, D),
                "key": L.linear_init(kb[1], D, D),
                "value": L.linear_init(kb[2], D, D),
                "out": L.linear_init(kb[3], D, D),
            },
            "attn_ln": L.ln_init(D),
            "mlp_ln": L.ln_init(D),
        }
        if cfg.num_experts:
            from ssak_tpu.parallel.moe import moe_init

            block["moe"] = moe_init(kb[4], D, cfg.intermediate_size, cfg.num_experts)
        else:
            block["mlp"] = {"fc1": L.linear_init(kb[4], D, cfg.intermediate_size), "fc2": L.linear_init(kb[5], cfg.intermediate_size, D)}
        if cfg.adapter_attn_dim:
            block["adapter"] = {
                "norm": L.ln_init(D),
                "down": L.linear_init(kb[6], D, cfg.adapter_attn_dim),
                "up": L.linear_init(kb[7], cfg.adapter_attn_dim, D),
            }
        blocks.append(block)
    params = {
        "feature_extractor": {"convs": convs},
        "feature_projection": {
            "layer_norm": L.ln_init(cfg.conv_dim[-1]),
            "projection": L.linear_init(ks[n], cfg.conv_dim[-1], D),
        },
        "encoder": {
            "pos_conv": L.conv_init(ks[n + 1], cfg.num_conv_pos_embeddings, D, D, bias=True, groups=cfg.num_conv_pos_embedding_groups),
            "layer_norm": L.ln_init(D),
            "blocks": blocks,
        },
        "lm_head": L.linear_init(ks[n + 2], D, cfg.vocab_size),
    }
    return params


def feature_extractor(params, waveform, cfg: Wav2Vec2Config):
    """waveform: (B, T) -> (B, frames, C). VALID conv stack with GELU."""
    dt = cfg.compute_dtype
    x = waveform[..., None]  # (B, T, 1)
    for i, layer in enumerate(params["feature_extractor"]["convs"]):
        x = L.conv1d(x, layer["conv"], stride=cfg.conv_stride[i], padding=(0, 0), dtype=dt)
        if "layer_norm" in layer:
            x = L.layer_norm(x, layer["layer_norm"])
        elif "group_norm" in layer:
            x = L.group_norm(x, layer["group_norm"], num_groups=x.shape[-1])
        x = L.gelu(x)
    return x


def encode(params, waveform, cfg: Wav2Vec2Config, lengths=None, time_mask=None, freeze_feature_encoder=False, aux_out=None):
    """waveform: (B, T) float32 -> (hidden (B, F, D), frame_lengths (B,)).

    time_mask: optional bool (B, F) — masked frames are zeroed after the
    feature projection (wav2vec2 mask_time_prob-style SpecAugment,
    HF Wav2Vec2Config.mask_time_prob / reference yaml TimeDomainSpecAugment
    capability).

    freeze_feature_encoder=True puts a stop_gradient after the conv stack
    (HF freeze_feature_encoder / reference wav2vec_train.py:313-329
    semantics): XLA then never materializes the expensive long-sequence
    conv VJPs — ~25% of the fine-tune step FLOPs — instead of computing
    them and zeroing the grads afterwards."""
    dt = cfg.compute_dtype
    feats = feature_extractor(params, waveform, cfg)
    if freeze_feature_encoder:
        feats = jax.lax.stop_gradient(feats)
    fp = params["feature_projection"]
    x = L.dense(L.layer_norm(feats, fp["layer_norm"]), fp["projection"], dt)
    if time_mask is not None:
        x = jnp.where(time_mask[:, : x.shape[1], None], 0.0, x)

    frame_lengths = (
        feature_extract_output_length(cfg, lengths) if lengths is not None
        else jnp.full((x.shape[0],), x.shape[1], jnp.int32)
    )
    F = x.shape[1]
    pad_mask = jnp.arange(F)[None, :] < frame_lengths[:, None]  # (B, F)
    x = jnp.where(pad_mask[..., None], x, 0.0)

    # convolutional positional embedding (SAME-ish: pad k//2 both sides, trim)
    k = cfg.num_conv_pos_embeddings
    pos = L.conv1d(x, params["encoder"]["pos_conv"], stride=1, padding=(k // 2, k // 2), groups=cfg.num_conv_pos_embedding_groups, dtype=dt)
    if k % 2 == 0:
        pos = pos[:, :-1]
    x = x + L.gelu(pos)

    # lengths-only padding mask: lets mha pick the fused flash kernel on TPU
    # (and synthesize the boolean mask itself on other backends)
    def ffn(blk, x_in):
        if cfg.num_experts:
            from ssak_tpu.parallel.moe import moe_mlp

            y, aux = moe_mlp(x_in, blk["moe"], top_k=cfg.moe_top_k, dtype=dt)
            if aux_out is not None:
                aux_out.append(aux)
            return y
        return L.mlp(x_in, blk["mlp"], dtype=dt)

    def adapt(blk, x_in):
        # MMS per-language attention adapter: LN -> down -> relu -> up,
        # residual at block end (HF Wav2Vec2AttnAdapterLayer semantics)
        if "adapter" not in blk:
            return x_in
        a = blk["adapter"]
        h = L.dense(L.layer_norm(x_in, a["norm"]), a["down"], dt)
        h = jax.nn.relu(h.astype(jnp.float32)).astype(dt)
        return x_in + L.dense(h, a["up"], dt)

    blocks = params["encoder"]["blocks"]
    if cfg.do_stable_layer_norm:
        def block(blk, x):
            h, _ = L.mha(L.layer_norm(x, blk["attn_ln"]), blk["attn"], cfg.num_heads, lengths=frame_lengths, dtype=dt)
            x = x + h
            x = x + ffn(blk, L.layer_norm(x, blk["mlp_ln"]))
            return adapt(blk, x)

        if cfg.remat and not cfg.num_experts:  # moe appends aux at trace time
            block = jax.checkpoint(block)
        for blk in blocks:
            x = block(blk, x)
        x = L.layer_norm(x, params["encoder"]["layer_norm"])
    else:
        def block(blk, x):
            h, _ = L.mha(x, blk["attn"], cfg.num_heads, lengths=frame_lengths, dtype=dt)
            x = L.layer_norm(x + h, blk["attn_ln"])
            x = L.layer_norm(x + ffn(blk, x), blk["mlp_ln"])
            return adapt(blk, x)

        if cfg.remat and not cfg.num_experts:  # moe appends aux at trace time
            block = jax.checkpoint(block)
        x = L.layer_norm(x, params["encoder"]["layer_norm"])
        for blk in blocks:
            x = block(blk, x)
    return x, frame_lengths


def ctc_logits(params, waveform, cfg: Wav2Vec2Config, lengths=None, time_mask=None, freeze_feature_encoder=False, aux_out=None):
    """Full forward: waveform -> (logits (B, F, V), frame_lengths)."""
    hidden, frame_lengths = encode(params, waveform, cfg, lengths, time_mask=time_mask, freeze_feature_encoder=freeze_feature_encoder, aux_out=aux_out)
    logits = L.dense(hidden, params["lm_head"], cfg.compute_dtype)
    return logits, frame_lengths


def ctc_log_probs(params, waveform, cfg: Wav2Vec2Config, lengths=None, time_mask=None, freeze_feature_encoder=False, aux_out=None):
    logits, fl = ctc_logits(params, waveform, cfg, lengths, time_mask=time_mask, freeze_feature_encoder=freeze_feature_encoder, aux_out=aux_out)
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1), fl
