"""Checkpoint save/restore with data-cursor for fast resume.

Counterpart of the reference's three checkpoint systems (HF Trainer
checkpoints + SKIPPING dataloader fast-forward patch (SURVEY.md §2.2),
SpeechBrain checkpointer, NeMo exp_manager): one format — a directory of
msgpack-free .npz tensor files + JSON metadata that includes the dataloader
cursor (epoch, batch index, rng seed), so resume restarts mid-epoch WITHOUT
replaying/decoding data (replaces the SKIPPING hack by design).

Keeps `save_total_limit` rotation and best-metric tracking
(reference wav2vec_train.py:366-372 semantics).
"""

import json
import os
import shutil

import numpy as np

import jax


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}/{k}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}/{i}"))
        out[f"{prefix}/__len__"] = np.asarray(len(tree))
        if isinstance(tree, tuple):
            out[f"{prefix}/__tuple__"] = np.asarray(1)
    elif tree is None:
        out[f"{prefix}/__none__"] = np.asarray(1)
    else:
        out[prefix] = np.asarray(tree)
    return out


def _unflatten(flat):
    # rebuild nested structure from path keys
    root = {}
    for path, val in flat.items():
        parts = [p for p in path.split("/") if p]
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def materialize(node):
        if not isinstance(node, dict):
            return node
        if "__none__" in node:
            return None
        if "__len__" in node:
            n = int(node["__len__"])
            items = [materialize(node[str(i)]) for i in range(n)]
            return tuple(items) if "__tuple__" in node else items
        return {k: materialize(v) for k, v in node.items()}

    return materialize(root)


def save_checkpoint(ckpt_dir: str, state, metadata: dict = None, save_total_limit: int = None):
    """Write state (pytree) + metadata under ckpt_dir/checkpoint-<step>."""
    step = int(np.asarray(state.get("step", 0)))
    path = os.path.join(ckpt_dir, f"checkpoint-{step}")
    tmp = path + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    host_state = jax.tree_util.tree_map(lambda x: np.asarray(x), state)
    flat = _flatten(host_state)
    np.savez(os.path.join(tmp, "state.npz"), **flat)
    with open(os.path.join(tmp, "metadata.json"), "w", encoding="utf-8") as f:
        json.dump({"step": step, **(metadata or {})}, f, indent=1)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)
    if save_total_limit:
        rotate_checkpoints(ckpt_dir, save_total_limit)
    return path


def list_checkpoints(ckpt_dir: str):
    if not os.path.isdir(ckpt_dir):
        return []
    out = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("checkpoint-") and not name.endswith(".tmp"):
            try:
                out.append((int(name.split("-")[1]), os.path.join(ckpt_dir, name)))
            except ValueError:
                pass
    return [p for _s, p in sorted(out)]


def rotate_checkpoints(ckpt_dir: str, limit: int, keep=()):
    cks = list_checkpoints(ckpt_dir)
    excess = [c for c in cks if c not in keep][: max(0, len(cks) - limit)]
    for c in excess:
        shutil.rmtree(c)


def get_last_checkpoint(ckpt_dir: str):
    cks = list_checkpoints(ckpt_dir)
    return cks[-1] if cks else None


def load_checkpoint(path: str):
    """Returns (state_pytree, metadata)."""
    with np.load(os.path.join(path, "state.npz"), allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    state = _unflatten(flat)
    with open(os.path.join(path, "metadata.json"), encoding="utf-8") as f:
        meta = json.load(f)
    return state, meta
