"""Import HuggingFace checkpoints into ssak_tpu param pytrees.

Pure key-mapping over safetensors (no torch needed on TPU hosts), the same
capability as the reference's hf_to_whisper_states renaming
(ssak/infer/whisper_infer.py:196-229) and its PEFT/processor loading —
but mapping INTO our pytree layout instead of openai-whisper's.

Supported: Whisper (WhisperForConditionalGeneration) and wav2vec2
(Wav2Vec2ForCTC), from a local directory containing *.safetensors (or
pytorch_model.bin, via torch-cpu fallback) + config.json.
"""

import json
import os

import numpy as np

from ssak_tpu.utils.monitoring import logger


def _load_state_dict(model_dir: str) -> dict:
    """name -> np.ndarray from safetensors shards or pytorch_model.bin."""
    # MMS-style per-language adapter shards (adapter.<lang>.safetensors)
    # are NOT part of the base model — loaded on demand by load_wav2vec2_adapter
    files = sorted(f for f in os.listdir(model_dir) if f.endswith(".safetensors") and not f.startswith("adapter."))
    state = {}
    if files:
        from safetensors.numpy import load_file

        for f in files:
            state.update(load_file(os.path.join(model_dir, f)))
        return state
    bins = sorted(f for f in os.listdir(model_dir) if f.endswith(".bin"))
    if bins:
        import torch

        for f in bins:
            sd = torch.load(os.path.join(model_dir, f), map_location="cpu", weights_only=True)
            state.update({k: v.numpy() for k, v in sd.items()})
        return state
    raise FileNotFoundError(f"no *.safetensors or *.bin weights in {model_dir}")


def _strip_prefix(state: dict, prefixes=("model.",)) -> dict:
    out = {}
    for k, v in state.items():
        for p in prefixes:
            if k.startswith(p):
                k = k[len(p):]
                break
        out[k] = v
    return out


def load_config(model_dir: str) -> dict:
    with open(os.path.join(model_dir, "config.json"), encoding="utf-8") as f:
        return json.load(f)


def _t(x):  # torch linear weight (out, in) -> kernel (in, out)
    return np.ascontiguousarray(x.T)


def _conv_t(x):  # torch conv1d weight (out, in, k) -> (k, in, out)
    return np.ascontiguousarray(np.transpose(x, (2, 1, 0)))


# --- Whisper --------------------------------------------------------------


def whisper_config_from_hf(model_dir: str):
    from ssak_tpu.models.whisper import WhisperConfig

    c = load_config(model_dir)
    return WhisperConfig(
        n_mels=c["num_mel_bins"],
        n_audio_ctx=c.get("max_source_positions", 1500),
        n_audio_state=c["d_model"],
        n_audio_head=c["encoder_attention_heads"],
        n_audio_layer=c["encoder_layers"],
        n_vocab=c["vocab_size"],
        n_text_ctx=c.get("max_target_positions", 448),
        n_text_state=c["d_model"],
        n_text_head=c["decoder_attention_heads"],
        n_text_layer=c["decoder_layers"],
        sot=c.get("decoder_start_token_id", 50258),
        eot=c.get("eos_token_id", 50257),
    )


def _map_attn(sd, pfx, has_k_bias=False):
    p = {
        "query": {"kernel": _t(sd[f"{pfx}.q_proj.weight"]), "bias": sd[f"{pfx}.q_proj.bias"]},
        "key": {"kernel": _t(sd[f"{pfx}.k_proj.weight"])},
        "value": {"kernel": _t(sd[f"{pfx}.v_proj.weight"]), "bias": sd[f"{pfx}.v_proj.bias"]},
        "out": {"kernel": _t(sd[f"{pfx}.out_proj.weight"]), "bias": sd[f"{pfx}.out_proj.bias"]},
    }
    if f"{pfx}.k_proj.bias" in sd:
        p["key"]["bias"] = sd[f"{pfx}.k_proj.bias"]
    return p


def _map_ln(sd, pfx):
    return {"scale": sd[f"{pfx}.weight"], "bias": sd[f"{pfx}.bias"]}


def load_whisper(model_dir: str):
    """Returns (params, config) for ssak_tpu.models.whisper."""
    cfg = whisper_config_from_hf(model_dir)
    sd = _strip_prefix(_load_state_dict(model_dir))

    enc_blocks = []
    for i in range(cfg.n_audio_layer):
        pfx = f"encoder.layers.{i}"
        enc_blocks.append(
            {
                "attn_ln": _map_ln(sd, f"{pfx}.self_attn_layer_norm"),
                "attn": _map_attn(sd, f"{pfx}.self_attn"),
                "mlp_ln": _map_ln(sd, f"{pfx}.final_layer_norm"),
                "mlp": {
                    "fc1": {"kernel": _t(sd[f"{pfx}.fc1.weight"]), "bias": sd[f"{pfx}.fc1.bias"]},
                    "fc2": {"kernel": _t(sd[f"{pfx}.fc2.weight"]), "bias": sd[f"{pfx}.fc2.bias"]},
                },
            }
        )
    dec_blocks = []
    for i in range(cfg.n_text_layer):
        pfx = f"decoder.layers.{i}"
        dec_blocks.append(
            {
                "attn_ln": _map_ln(sd, f"{pfx}.self_attn_layer_norm"),
                "attn": _map_attn(sd, f"{pfx}.self_attn"),
                "cross_attn_ln": _map_ln(sd, f"{pfx}.encoder_attn_layer_norm"),
                "cross_attn": _map_attn(sd, f"{pfx}.encoder_attn"),
                "mlp_ln": _map_ln(sd, f"{pfx}.final_layer_norm"),
                "mlp": {
                    "fc1": {"kernel": _t(sd[f"{pfx}.fc1.weight"]), "bias": sd[f"{pfx}.fc1.bias"]},
                    "fc2": {"kernel": _t(sd[f"{pfx}.fc2.weight"]), "bias": sd[f"{pfx}.fc2.bias"]},
                },
            }
        )
    params = {
        "encoder": {
            "conv1": {"kernel": _conv_t(sd["encoder.conv1.weight"]), "bias": sd["encoder.conv1.bias"]},
            "conv2": {"kernel": _conv_t(sd["encoder.conv2.weight"]), "bias": sd["encoder.conv2.bias"]},
            "blocks": enc_blocks,
            "ln_post": _map_ln(sd, "encoder.layer_norm"),
        },
        "decoder": {
            "token_embedding": sd["decoder.embed_tokens.weight"],
            "positional_embedding": sd["decoder.embed_positions.weight"],
            "blocks": dec_blocks,
            "ln": _map_ln(sd, "decoder.layer_norm"),
        },
    }
    import jax

    import jax.numpy as _jnp

    params = jax.tree_util.tree_map(_jnp.asarray, params)
    logger.info(f"loaded Whisper from {model_dir}: d={cfg.n_audio_state}, enc={cfg.n_audio_layer}, dec={cfg.n_text_layer}")
    return params, cfg


# --- wav2vec2 -------------------------------------------------------------


def wav2vec2_config_from_hf(model_dir: str):
    from ssak_tpu.models.wav2vec2 import Wav2Vec2Config

    c = load_config(model_dir)
    return Wav2Vec2Config(
        conv_dim=tuple(c["conv_dim"]),
        conv_kernel=tuple(c["conv_kernel"]),
        conv_stride=tuple(c["conv_stride"]),
        conv_bias=c.get("conv_bias", False),
        hidden_size=c["hidden_size"],
        num_layers=c["num_hidden_layers"],
        num_heads=c["num_attention_heads"],
        intermediate_size=c["intermediate_size"],
        num_conv_pos_embeddings=c.get("num_conv_pos_embeddings", 128),
        num_conv_pos_embedding_groups=c.get("num_conv_pos_embedding_groups", 16),
        do_stable_layer_norm=c.get("do_stable_layer_norm", False),
        vocab_size=c["vocab_size"],
        blank_id=c.get("pad_token_id", 0),
        adapter_attn_dim=c.get("adapter_attn_dim") or 0,
    )


def _weight_norm_conv(sd, pfx):
    """Compose torch weight-norm conv: weight = g * v / ||v|| (dim=2)."""
    if f"{pfx}.weight_g" in sd:
        g, v = sd[f"{pfx}.weight_g"], sd[f"{pfx}.weight_v"]
    else:  # torch >= 2.1 parametrized form
        g, v = sd[f"{pfx}.parametrizations.weight.original0"], sd[f"{pfx}.parametrizations.weight.original1"]
    # v: (out, in/groups, k); torch weight_norm dim=2 normalizes over (out, in)
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
    w = g * v / np.maximum(norm, 1e-12)
    return {"kernel": _conv_t(w), "bias": sd[f"{pfx}.bias"]}


def _map_adapter(sd, pfx):
    """HF Wav2Vec2AttnAdapterLayer: norm -> linear_1 (down) -> relu ->
    linear_2 (up)."""
    return {
        "norm": _map_ln(sd, f"{pfx}.norm"),
        "down": {"kernel": _t(sd[f"{pfx}.linear_1.weight"]), "bias": sd[f"{pfx}.linear_1.bias"]},
        "up": {"kernel": _t(sd[f"{pfx}.linear_2.weight"]), "bias": sd[f"{pfx}.linear_2.bias"]},
    }


def load_wav2vec2_adapter(params, model_dir: str, language: str):
    """MMS per-language adapter swap (reference transformers_infer.py:214
    model.load_adapter(language)): merge adapter.<lang>.safetensors into a
    loaded wav2vec2 param tree. The adapter file carries the per-layer
    adapter weights and (for MMS) the per-language lm_head. Returns the
    updated tree; raises FileNotFoundError when the checkpoint has no such
    adapter (caller decides whether the model is multilingual)."""
    path = os.path.join(model_dir, f"adapter.{language}.safetensors")
    if os.path.exists(path):
        from safetensors.numpy import load_file

        sd = _strip_prefix(load_file(path), prefixes=("wav2vec2.",))
    else:
        binpath = os.path.join(model_dir, f"adapter.{language}.bin")
        if not os.path.exists(binpath):
            raise FileNotFoundError(f"no adapter.{language}.safetensors in {model_dir}")
        import torch

        sd = _strip_prefix(
            {k: v.numpy() for k, v in torch.load(binpath, map_location="cpu", weights_only=True).items()},
            prefixes=("wav2vec2.",),
        )
    import jax
    import jax.numpy as _jnp

    n_layers = len(params["encoder"]["blocks"])
    for i in range(n_layers):
        pfx = f"encoder.layers.{i}.adapter_layer"
        if f"{pfx}.norm.weight" in sd:
            params["encoder"]["blocks"][i]["adapter"] = jax.tree_util.tree_map(_jnp.asarray, _map_adapter(sd, pfx))
    if "lm_head.weight" in sd:
        params["lm_head"] = {"kernel": _jnp.asarray(_t(sd["lm_head.weight"])), "bias": _jnp.asarray(sd["lm_head.bias"])}
    logger.info(f"loaded {language} adapter from {path}")
    return params


def load_wav2vec2(model_dir: str):
    """Returns (params, config) for ssak_tpu.models.wav2vec2 (CTC head
    included when the checkpoint has one)."""
    cfg = wav2vec2_config_from_hf(model_dir)
    sd = _strip_prefix(_load_state_dict(model_dir), prefixes=("wav2vec2.",))

    convs = []
    for i in range(len(cfg.conv_dim)):
        pfx = f"feature_extractor.conv_layers.{i}"
        layer = {"conv": {"kernel": _conv_t(sd[f"{pfx}.conv.weight"])}}
        if f"{pfx}.conv.bias" in sd:
            layer["conv"]["bias"] = sd[f"{pfx}.conv.bias"]
        if f"{pfx}.layer_norm.weight" in sd:
            key = "layer_norm" if cfg.do_stable_layer_norm else "group_norm"
            layer[key] = _map_ln(sd, f"{pfx}.layer_norm")
        convs.append(layer)

    blocks = []
    for i in range(cfg.num_layers):
        pfx = f"encoder.layers.{i}"
        block = {
            "attn": _map_attn(sd, f"{pfx}.attention"),
            "attn_ln": _map_ln(sd, f"{pfx}.layer_norm"),
            "mlp": {
                "fc1": {"kernel": _t(sd[f"{pfx}.feed_forward.intermediate_dense.weight"]), "bias": sd[f"{pfx}.feed_forward.intermediate_dense.bias"]},
                "fc2": {"kernel": _t(sd[f"{pfx}.feed_forward.output_dense.weight"]), "bias": sd[f"{pfx}.feed_forward.output_dense.bias"]},
            },
            "mlp_ln": _map_ln(sd, f"{pfx}.final_layer_norm"),
        }
        if f"{pfx}.adapter_layer.norm.weight" in sd:
            block["adapter"] = _map_adapter(sd, f"{pfx}.adapter_layer")
        blocks.append(block)
    params = {
        "feature_extractor": {"convs": convs},
        "feature_projection": {
            "layer_norm": _map_ln(sd, "feature_projection.layer_norm"),
            "projection": {"kernel": _t(sd["feature_projection.projection.weight"]), "bias": sd["feature_projection.projection.bias"]},
        },
        "encoder": {
            "pos_conv": _weight_norm_conv(sd, "encoder.pos_conv_embed.conv"),
            "layer_norm": _map_ln(sd, "encoder.layer_norm"),
            "blocks": blocks,
        },
    }
    if "lm_head.weight" in sd:
        params["lm_head"] = {"kernel": _t(sd["lm_head.weight"]), "bias": sd["lm_head.bias"]}
    import jax

    import jax.numpy as _jnp

    params = jax.tree_util.tree_map(_jnp.asarray, params)
    logger.info(f"loaded wav2vec2 from {model_dir}: d={cfg.hidden_size}, layers={cfg.num_layers}, vocab={cfg.vocab_size}")
    return params, cfg


# --- NeMo Conformer ---------------------------------------------------------


def _fold_bn(sd, pfx, eps=1e-5):
    """Eval-mode BatchNorm1d -> per-channel affine {scale, bias}."""
    w, b = sd[f"{pfx}.weight"], sd[f"{pfx}.bias"]
    mean, var = sd[f"{pfx}.running_mean"], sd[f"{pfx}.running_var"]
    scale = w / np.sqrt(var + eps)
    return {"scale": scale.astype(np.float32), "bias": (b - mean * scale).astype(np.float32)}


def _conv2d_t(x):  # torch Conv2d OIHW -> HWIO
    return np.ascontiguousarray(np.transpose(x, (2, 3, 1, 0)))


def nemo_conformer_config(model_cfg: dict):
    """ConformerConfig from a NeMo model_config.yaml dict (EncDecCTCModel
    layout — the models the reference's get_base_model starts from,
    ssak/train/nemo/train_utils.py:15)."""
    from ssak_tpu.models.conformer import ConformerConfig

    enc = model_cfg["encoder"]
    dec = model_cfg["decoder"]
    num_classes = dec.get("num_classes", -1)
    if num_classes in (None, -1):
        num_classes = len(dec.get("vocabulary") or model_cfg.get("labels") or [])
    return ConformerConfig(
        n_mels=enc.get("feat_in", 80),
        d_model=enc["d_model"],
        num_layers=enc["n_layers"],
        num_heads=enc.get("n_heads", 4),
        ff_expansion=enc.get("ff_expansion_factor", 4),
        conv_kernel=enc.get("conv_kernel_size", 31),
        vocab_size=num_classes + 1,  # NeMo CTC blank is the LAST index
        blank_id=num_classes,
        pos_type="relpos",
        subsampling="striding2d",
        conv_norm="affine",
        xscale=bool(enc.get("xscaling", True)),
        frontend="nemo",
    )


def _read_nemo_archive(path: str):
    """(model_config_dict, torch_state_dict) from a .nemo tar or a directory
    holding model_config.yaml + model_weights.ckpt."""
    import io
    import tarfile

    import torch
    import yaml

    if os.path.isdir(path):
        with open(os.path.join(path, "model_config.yaml"), encoding="utf-8") as f:
            cfg = yaml.safe_load(f)
        sd = torch.load(os.path.join(path, "model_weights.ckpt"), map_location="cpu", weights_only=True)
    else:
        with tarfile.open(path) as tar:
            names = tar.getnames()

            def member(suffix):
                for n in names:
                    if n.endswith(suffix):
                        return tar.extractfile(n).read()
                raise FileNotFoundError(f"{suffix} not in {path}")

            cfg = yaml.safe_load(io.BytesIO(member("model_config.yaml")))
            sd = torch.load(io.BytesIO(member("model_weights.ckpt")), map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    return cfg, sd


def load_nemo_conformer(path: str):
    """Import a NeMo Conformer-CTC checkpoint (.nemo archive or extracted
    dir) into the ssak_tpu conformer pytree: rel-pos attention with
    pos_bias_u/v, Conv2d striding subsampling, BatchNorm folded to affine.
    Counterpart of the reference's pretrained-Parakeet starting point
    (ssak/train/nemo/train_utils.py:15 get_base_model)."""
    model_cfg, sd = _read_nemo_archive(path)
    cfg = nemo_conformer_config(model_cfg)

    blocks = []
    for i in range(cfg.num_layers):
        p = f"encoder.layers.{i}"
        blocks.append({
            "ff1_ln": _map_ln(sd, f"{p}.norm_feed_forward1"),
            "ff1": {
                "fc1": {"kernel": _t(sd[f"{p}.feed_forward1.linear1.weight"]), "bias": sd[f"{p}.feed_forward1.linear1.bias"]},
                "fc2": {"kernel": _t(sd[f"{p}.feed_forward1.linear2.weight"]), "bias": sd[f"{p}.feed_forward1.linear2.bias"]},
            },
            "attn_ln": _map_ln(sd, f"{p}.norm_self_att"),
            "attn": {
                "query": {"kernel": _t(sd[f"{p}.self_attn.linear_q.weight"]), "bias": sd[f"{p}.self_attn.linear_q.bias"]},
                "key": {"kernel": _t(sd[f"{p}.self_attn.linear_k.weight"]), "bias": sd[f"{p}.self_attn.linear_k.bias"]},
                "value": {"kernel": _t(sd[f"{p}.self_attn.linear_v.weight"]), "bias": sd[f"{p}.self_attn.linear_v.bias"]},
                "out": {"kernel": _t(sd[f"{p}.self_attn.linear_out.weight"]), "bias": sd[f"{p}.self_attn.linear_out.bias"]},
                "linear_pos": {"kernel": _t(sd[f"{p}.self_attn.linear_pos.weight"])},
                "pos_bias_u": sd[f"{p}.self_attn.pos_bias_u"],
                "pos_bias_v": sd[f"{p}.self_attn.pos_bias_v"],
            },
            "conv_ln": _map_ln(sd, f"{p}.norm_conv"),
            "conv": {
                "pointwise1": {"kernel": _t(sd[f"{p}.conv.pointwise_conv1.weight"][:, :, 0]), "bias": sd[f"{p}.conv.pointwise_conv1.bias"]},
                "depthwise": {"kernel": _conv_t(sd[f"{p}.conv.depthwise_conv.weight"]), "bias": sd[f"{p}.conv.depthwise_conv.bias"]},
                "bn": _fold_bn(sd, f"{p}.conv.batch_norm"),
                "pointwise2": {"kernel": _t(sd[f"{p}.conv.pointwise_conv2.weight"][:, :, 0]), "bias": sd[f"{p}.conv.pointwise_conv2.bias"]},
            },
            "ff2_ln": _map_ln(sd, f"{p}.norm_feed_forward2"),
            "ff2": {
                "fc1": {"kernel": _t(sd[f"{p}.feed_forward2.linear1.weight"]), "bias": sd[f"{p}.feed_forward2.linear1.bias"]},
                "fc2": {"kernel": _t(sd[f"{p}.feed_forward2.linear2.weight"]), "bias": sd[f"{p}.feed_forward2.linear2.bias"]},
            },
            "final_ln": _map_ln(sd, f"{p}.norm_out"),
        })

    params = {
        "subsampling": {
            "conv1": {"kernel": _conv2d_t(sd["encoder.pre_encode.conv.0.weight"]), "bias": sd["encoder.pre_encode.conv.0.bias"]},
            "conv2": {"kernel": _conv2d_t(sd["encoder.pre_encode.conv.2.weight"]), "bias": sd["encoder.pre_encode.conv.2.bias"]},
            "proj": {"kernel": _t(sd["encoder.pre_encode.out.weight"]), "bias": sd["encoder.pre_encode.out.bias"]},
        },
        "blocks": blocks,
        "lm_head": {"kernel": _t(sd["decoder.decoder_layers.0.weight"][:, :, 0]), "bias": sd["decoder.decoder_layers.0.bias"]},
    }
    import jax
    import jax.numpy as _jnp

    params = jax.tree_util.tree_map(lambda x: _jnp.asarray(np.asarray(x, np.float32)), params)
    vocab = model_cfg.get("decoder", {}).get("vocabulary") or model_cfg.get("labels") or []
    logger.info(f"loaded NeMo conformer from {path}: d={cfg.d_model}, layers={cfg.num_layers}, vocab={cfg.vocab_size}")
    return params, cfg, list(vocab)
