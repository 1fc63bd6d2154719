"""Weight-only int8 / int4 quantization over param pytrees.

TPU-native counterpart of the reference's bitsandbytes path
(ssak/train/transformers/whisper_train.py:374-407: load_in_8bit /
load_in_4bit base model + LoRA adapters on top). There the point is
fitting a large model into GPU VRAM; here the point is HBM footprint and
weight-fetch bandwidth: quantized kernels live in HBM as int8 (or packed
int4 nibbles) at 1/2 - 1/4 the bytes of bf16, and are dequantized inline
in the forward pass — an elementwise multiply XLA fuses into the matmul
operand read, so no persistent full-precision copy exists.

Representation: a quantized dense layer's `kernel` leaf is REPLACED by a
sub-dict (still a pure pytree of arrays — jit/pjit/checkpoint transparent):

    int8: {"q8": int8 (d_in, d_out), "scale": f32 (1, d_out)}
    int4: {"q4": int8 (ceil(d_in/2/blk)*blk... packed), "scale": f32 (nb, 1, d_out)}

int8 uses symmetric per-output-channel scales; int4 packs two rows per
byte (low nibble = even input row, high nibble = odd) with blockwise
scales over groups of `block` input rows (per out-channel), the same
accuracy recipe as blockwise NF4 but with a uniform grid that unpacks in
three vector ops on device.

QLoRA-style training (quantized frozen base + trainable LoRA) is wired in
ssak_tpu.train.steps.make_whisper_train_step: integer leaves are
non-differentiable, so gradients are taken only w.r.t. the float LoRA
leaves (partitioned grad), matching the reference's PEFT-on-int8 flow.
"""

import re

import jax.numpy as jnp
import numpy as np

# quantize matmul kernels only: 2-D, reasonably large (tiny heads / conv
# kernels / norms stay full precision — negligible bytes, outsized
# sensitivity)
DEFAULT_TARGETS = r"/kernel$"
MIN_SIZE = 64 * 64
INT4_BLOCK = 64


def is_quantized_kernel(leaf) -> bool:
    return isinstance(leaf, dict) and ("q8" in leaf or "q4" in leaf)


def quantize_kernel(w, bits: int = 8, block: int = INT4_BLOCK) -> dict:
    """w: (d_in, d_out) float -> quantized leaf dict (numpy arrays)."""
    w = np.asarray(w, np.float32)
    d_in, d_out = w.shape
    if bits == 8:
        scale = np.max(np.abs(w), axis=0, keepdims=True) / 127.0  # (1, d_out)
        scale = np.where(scale == 0, 1.0, scale)
        q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
        return {"q8": q, "scale": scale.astype(np.float32)}
    if bits == 4:
        # blockwise scales over groups of input rows; block must divide
        # d_in and be even (two rows pack per byte) so dequant shapes are
        # static with no padding bookkeeping
        b = max(2, block)
        while b > 2 and d_in % b:
            b //= 2
        if d_in % b:
            return quantize_kernel(w, bits=8)  # odd d_in: int8 fallback
        nb = d_in // b
        wb = w.reshape(nb, b, d_out)
        scale = np.max(np.abs(wb), axis=1, keepdims=True) / 7.0  # (nb, 1, d_out)
        scale = np.where(scale == 0, 1.0, scale)
        q = np.clip(np.rint(wb / scale), -7, 7).astype(np.int8).reshape(d_in, d_out)
        packed = ((q[0::2] & 0x0F) | (q[1::2] << 4)).astype(np.int8)  # (d_in//2, d_out)
        return {"q4": packed, "scale": scale.astype(np.float32)}
    raise ValueError(f"bits must be 4 or 8, got {bits}")


def dequantize_kernel(qd: dict, dtype=jnp.bfloat16):
    """Quantized leaf dict -> dense (d_in, d_out) array of `dtype`.
    Pure jnp — safe (and intended) to call inside jit; XLA fuses the
    unpack+scale into the consuming matmul's operand read."""
    if "q8" in qd:
        return (qd["q8"].astype(jnp.float32) * qd["scale"]).astype(dtype)
    packed = qd["q4"]
    half, d_out = packed.shape
    rows = 2 * half
    # sign-extended nibbles: arithmetic shifts on int8
    low = jnp.right_shift(jnp.left_shift(packed, 4), 4)
    high = jnp.right_shift(packed, 4)
    q = jnp.stack([low, high], axis=1).reshape(rows, d_out)  # interleave rows
    scale = qd["scale"]
    nb = scale.shape[0]
    w = (q.reshape(nb, rows // nb, d_out).astype(jnp.float32) * scale).reshape(rows, d_out)
    return w.astype(dtype)


def quantize_params(params, bits: int = 8, targets: str = DEFAULT_TARGETS,
                    min_size: int = MIN_SIZE, block: int = INT4_BLOCK):
    """Copy of params with matching 2-D kernels replaced by quantized leaf
    dicts. LoRA leaves (float, trainable) are left untouched."""
    rx = re.compile(targets)

    def rec(node, path):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                p = f"{path}/{k}"
                if (
                    rx.search(p)
                    and not isinstance(v, dict)
                    and getattr(v, "ndim", 0) == 2
                    and v.size >= min_size
                ):
                    out[k] = quantize_kernel(np.asarray(v), bits=bits, block=block)
                else:
                    out[k] = rec(v, p)
            return out
        if isinstance(node, (list, tuple)):
            vals = [rec(v, f"{path}/{i}") for i, v in enumerate(node)]
            return vals if isinstance(node, list) else tuple(vals)
        return node

    return rec(params, "")


def dequantize_params(params, dtype=jnp.float32):
    """Fully materialize a dense tree (export / debugging)."""

    def rec(node):
        if is_quantized_kernel(node):
            return np.asarray(dequantize_kernel(node, dtype))
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            vals = [rec(v) for v in node]
            return vals if isinstance(node, list) else tuple(vals)
        return node

    return rec(params)


def quantized_bytes(params) -> tuple:
    """(quantized_bytes, dense_equiv_bf16_bytes) over quantized kernels —
    for the 'estimated minimum VRAM' style log line of the reference
    (wav2vec_train.py:331-338)."""
    qb = db = 0
    for path, leaf in _walk(params):
        name = path.rsplit("/", 1)[-1]
        size = int(np.asarray(leaf).size) if not hasattr(leaf, "size") else int(leaf.size)
        if name == "q8":
            qb += size
            db += size * 2
        elif name == "q4":
            qb += size
            db += size * 4  # two weights per byte, 2 bytes each in bf16
    return qb, db


def partition_trainable(params):
    """Split a (possibly quantized) tree into (trainable, frozen) with the
    same treedef, using None placeholders — grads are taken w.r.t. the
    trainable half only, so integer leaves never see autodiff.

    Trainable = float leaves whose name starts with lora_ when any LoRA
    leaf exists (PEFT mode); otherwise every float leaf."""
    has_lora = any(
        str(p).split("/")[-1].startswith("lora_") for p, _ in _walk(params)
    )

    def split(node, path):
        if is_quantized_kernel(node):
            return None, node
        if isinstance(node, dict):
            t, f = {}, {}
            for k, v in node.items():
                t[k], f[k] = split(v, f"{path}/{k}")
            return t, f
        if isinstance(node, (list, tuple)):
            pairs = [split(v, f"{path}/{i}") for i, v in enumerate(node)]
            ts = [p[0] for p in pairs]
            fs = [p[1] for p in pairs]
            if isinstance(node, tuple):
                return tuple(ts), tuple(fs)
            return ts, fs
        name = path.rsplit("/", 1)[-1]
        is_float = jnp.issubdtype(jnp.asarray(node).dtype, jnp.floating)
        trainable = is_float and (not has_lora or (name.startswith("lora_") and name != "lora_scale"))
        return (node, None) if trainable else (None, node)

    return split(params, "")


def merge_partition(trainable, frozen):
    """Inverse of partition_trainable (jit-safe)."""
    if trainable is None:
        return frozen
    if frozen is None:
        return trainable
    if isinstance(trainable, dict):
        return {k: merge_partition(trainable[k], frozen[k]) for k in trainable}
    if isinstance(trainable, (list, tuple)):
        vals = [merge_partition(t, f) for t, f in zip(trainable, frozen)]
        return tuple(vals) if isinstance(trainable, tuple) else vals
    return trainable


def _walk(tree, path=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _walk(v, f"{path}/{k}")
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _walk(v, f"{path}/{i}")
    else:
        yield path, tree
