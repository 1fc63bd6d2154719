"""Finalize a training run: pick the best checkpoint, export a standalone
model directory loadable by ssak_tpu.infer.load_model.

Counterpart of reference ssak/train/speechbrain/wav2vec_finalize.py
(finalize_folder:14: best-WER checkpoint -> final/ + inference-ready
hyperparams).  The export format is a self-contained dir:
    ssak_config.json   {"model_type", "config": {...}}
    weights.npz        flattened param tree
    vocab.json         CTC tokenizer vocab (CTC models)
"""

import dataclasses
import json
import os

import numpy as np


def export_model(params, cfg, output_dir: str, model_type: str = "wav2vec2_ctc", tokenizer=None):
    from ssak_tpu.train.checkpoint import _flatten

    os.makedirs(output_dir, exist_ok=True)
    import jax

    host = jax.tree_util.tree_map(lambda x: np.asarray(x), params)
    np.savez(os.path.join(output_dir, "weights.npz"), **_flatten(host))
    with open(os.path.join(output_dir, "ssak_config.json"), "w") as f:
        json.dump({"model_type": model_type, "config": dataclasses.asdict(cfg)}, f, indent=1)
    if tokenizer is not None:
        tokenizer.save(os.path.join(output_dir, "vocab.json"))
    return output_dir


def _config_from_meta(mtype: str, conf: dict):
    if mtype == "wav2vec2_ctc":
        from ssak_tpu.models.wav2vec2 import Wav2Vec2Config

        return Wav2Vec2Config(**{k: tuple(v) if isinstance(v, list) else v for k, v in conf.items()})
    if mtype == "conformer_ctc":
        from ssak_tpu.models.conformer import ConformerConfig

        return ConformerConfig(**conf)
    from ssak_tpu.models.whisper import WhisperConfig

    return WhisperConfig(**conf)


def load_exported(model_dir: str):
    """Returns (model_type, params, cfg, tokenizer_or_None)."""
    from ssak_tpu.train.checkpoint import _unflatten

    with open(os.path.join(model_dir, "ssak_config.json")) as f:
        meta = json.load(f)
    with np.load(os.path.join(model_dir, "weights.npz"), allow_pickle=False) as z:
        params = _unflatten({k: z[k] for k in z.files})
    mtype = meta["model_type"]
    cfg = _config_from_meta(mtype, meta["config"])
    tokenizer = None
    vocab = os.path.join(model_dir, "vocab.json")
    if os.path.exists(vocab):
        from ssak_tpu.models.tokenizer import CTCTokenizer

        tokenizer = CTCTokenizer(vocab)
    return mtype, params, cfg, tokenizer


def finalize_run(run_dir: str, output_dir: str = None, model_type: str = "wav2vec2_ctc"):
    """Pick the best (or last) checkpoint of a run and export final/."""
    from ssak_tpu.train.checkpoint import list_checkpoints, load_checkpoint

    output_dir = output_dir or os.path.join(run_dir, "final")
    cks = list_checkpoints(run_dir)
    if not cks:
        raise FileNotFoundError(f"no checkpoints in {run_dir}")
    best = None
    best_meta = None
    for ck in cks:
        with open(os.path.join(ck, "metadata.json")) as f:
            meta = json.load(f)
        if best is None or meta.get("eval_wer", float("inf")) <= best_meta.get("eval_wer", float("inf")):
            if meta.get("best_step", -1) == meta.get("step") or "eval_wer" in meta or best is None:
                best, best_meta = ck, meta
    state, meta = load_checkpoint(best)
    params = state["params"]

    # config + vocab from the run dir
    vocab_path = os.path.join(run_dir, "vocab.json")
    tokenizer = None
    if os.path.exists(vocab_path):
        from ssak_tpu.models.tokenizer import CTCTokenizer

        tokenizer = CTCTokenizer(vocab_path)
    cfg_path = os.path.join(run_dir, "ssak_config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            saved = json.load(f)
        model_type = saved.get("model_type", model_type)
        cfg = _config_from_meta(model_type, saved["config"])
    else:
        # infer dims from the params (lm_head gives vocab size)
        from ssak_tpu.models.wav2vec2 import make_config

        vocab_size = np.asarray(params["lm_head"]["kernel"]).shape[1]
        hidden = np.asarray(params["lm_head"]["kernel"]).shape[0]
        n_layers = len(params["encoder"]["blocks"])
        convs = params["feature_extractor"]["convs"]
        preset = "tiny_test" if hidden <= 128 else "base"
        cfg = make_config(preset, vocab_size=vocab_size)
    export_model(params, cfg, output_dir, model_type=model_type, tokenizer=tokenizer)
    with open(os.path.join(output_dir, "finalize_info.json"), "w") as f:
        json.dump({"source_checkpoint": best, **{k: v for k, v in meta.items() if not isinstance(v, (list, dict))}}, f, indent=1)
    return output_dir


def main(argv=None):
    from ssak_tpu.utils.env import apply_platform_env

    apply_platform_env()
    import argparse

    p = argparse.ArgumentParser(description="Export the best checkpoint of a run as a standalone model dir")
    p.add_argument("run_dir")
    p.add_argument("--output_dir", default=None)
    args = p.parse_args(argv)
    out = finalize_run(args.run_dir, args.output_dir)
    print(out)


if __name__ == "__main__":
    main()
