"""LoRA adapters over param pytrees.

Parity with the reference's PEFT path (whisper_train.py:374-407 LoRA on
q/v projections, SavePeftModelCallback:91 saving adapters only): adapters
are extra lora_A/lora_B leaves injected into targeted dense param dicts;
ssak_tpu.models.layers.dense applies them transparently; training masks
gradients to adapter leaves only; merge_lora folds them back for export.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_TARGETS = r"/(attn|cross_attn)/(query|value)/kernel$"


def _walk(tree, path=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _walk(v, f"{path}/{k}")
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _walk(v, f"{path}/{i}")
    else:
        yield path, tree


def add_lora(params, rank: int = 8, alpha: float = 16.0, targets: str = DEFAULT_TARGETS, key=None):
    """Return a copy of params with LoRA adapters on matching dense layers."""
    key = key if key is not None else jax.random.PRNGKey(0)
    rx = re.compile(targets)
    counter = [0]

    def rec(node, path):
        if isinstance(node, dict):
            out = {k: rec(v, f"{path}/{k}") for k, v in node.items()}
            if "kernel" in node and rx.search(f"{path}/kernel") and not isinstance(node["kernel"], dict):
                d_in, d_out = node["kernel"].shape
                k = jax.random.fold_in(key, counter[0])
                counter[0] += 1
                out["lora_A"] = jax.random.normal(k, (d_in, rank), jnp.float32) * (1.0 / max(1, d_in)) ** 0.5
                out["lora_B"] = jnp.zeros((rank, d_out), jnp.float32)
                out["lora_scale"] = jnp.asarray(alpha / rank, jnp.float32)
            return out
        if isinstance(node, (list, tuple)):
            vals = [rec(v, f"{path}/{i}") for i, v in enumerate(node)]
            return vals if isinstance(node, list) else tuple(vals)
        return node

    return rec(params, "")


def lora_grad_mask(grads):
    """Zero all gradients except LoRA leaves (adapter-only training)."""

    def rec(node, path):
        if isinstance(node, dict):
            return {k: rec(v, f"{path}/{k}") for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            vals = [rec(v, f"{path}/{i}") for i, v in enumerate(node)]
            return vals if isinstance(node, list) else tuple(vals)
        if path.rsplit("/", 1)[-1].startswith("lora_") and not path.endswith("lora_scale"):
            return node
        return jnp.zeros_like(node)

    return rec(grads, "")


def merge_lora(params):
    """Fold adapters into base kernels and drop them (export path)."""

    def rec(node):
        if isinstance(node, dict):
            out = {k: rec(v) for k, v in node.items() if not str(k).startswith("lora_")}
            if "lora_A" in node:
                scale = np.asarray(node.get("lora_scale", 1.0))
                out["kernel"] = node["kernel"] + scale * np.asarray(node["lora_A"]) @ np.asarray(node["lora_B"])
            return out
        if isinstance(node, (list, tuple)):
            vals = [rec(v) for v in node]
            return vals if isinstance(node, list) else tuple(vals)
        return node

    return rec(params)


def extract_lora(params):
    """Only the adapter leaves (what gets checkpointed in PEFT mode —
    reference SavePeftModelCallback deletes base weights)."""
    out = {}
    for path, leaf in _walk(params):
        name = path.rsplit("/", 1)[-1]
        if name.startswith("lora_"):
            out[path] = np.asarray(leaf)
    return out


def load_lora(params, adapters: dict):
    """Insert extracted adapter leaves back into a param tree."""

    def rec(node, path):
        if isinstance(node, dict):
            out = {k: rec(v, f"{path}/{k}") for k, v in node.items()}
            for name in ("lora_A", "lora_B", "lora_scale"):
                key = f"{path}/{name}"
                if key in adapters:
                    out[name] = jnp.asarray(adapters[key])
            return out
        if isinstance(node, (list, tuple)):
            vals = [rec(v, f"{path}/{i}") for i, v in enumerate(node)]
            return vals if isinstance(node, list) else tuple(vals)
        return node

    return rec(params, "")
