"""Tensor-parallel sharding rules: param-path regex -> PartitionSpec.

Megatron-style TP over the 'model' mesh axis: attention q/k/v and mlp fc1
shard the output feature dim (column parallel), attention out and mlp fc2
shard the input dim (row parallel) — XLA inserts the all-reduce after row-
parallel matmuls. Embeddings shard the vocab dim. Everything else
(layernorms, biases of row-parallel layers, convs) is replicated.

Covers the capability listed as "model sharding" in SURVEY.md §2.4
(reference only has accelerate device_map placement, whisper_train.py:432).
"""

import re

from jax.sharding import PartitionSpec as P

# (path_regex, spec). First match wins. Paths look like
# /encoder/blocks/3/attn/query/kernel
WHISPER_RULES = [
    (r"/(attn|cross_attn)/(query|key|value)/kernel$", P(None, "model")),
    (r"/(attn|cross_attn)/(query|key|value)/bias$", P("model")),
    (r"/(attn|cross_attn)/out/kernel$", P("model", None)),
    (r"/mlp/fc1/kernel$", P(None, "model")),
    (r"/mlp/fc1/bias$", P("model")),
    (r"/mlp/fc2/kernel$", P("model", None)),
    (r"/token_embedding$", P("model", None)),
]

WAV2VEC2_RULES = [
    (r"/attn/(query|key|value)/kernel$", P(None, "model")),
    (r"/attn/(query|key|value)/bias$", P("model")),
    (r"/attn/out/kernel$", P("model", None)),
    (r"/mlp/fc1/kernel$", P(None, "model")),
    (r"/mlp/fc1/bias$", P("model")),
    (r"/mlp/fc2/kernel$", P("model", None)),
    (r"/lm_head/kernel$", P(None, "model")),
    (r"/lm_head/bias$", P("model")),
]

# Conformer (NeMo-imported or native): TP the two macaron FFNs and the
# attention projections; rel-pos machinery shards with the heads
# (linear_pos column-parallel, pos_bias (H, Dh) on the head dim). The conv
# module stays replicated — depthwise grouped convs are cheap (O(k·d)) and
# sharding their channel dim buys nothing at conformer widths.
CONFORMER_RULES = [
    (r"/attn/(query|key|value)/kernel$", P(None, "model")),
    (r"/attn/(query|key|value)/bias$", P("model")),
    (r"/attn/linear_pos/kernel$", P(None, "model")),
    (r"/attn/pos_bias_[uv]$", P("model", None)),
    (r"/attn/out/kernel$", P("model", None)),
    (r"/(ff1|ff2)/fc1/kernel$", P(None, "model")),
    (r"/(ff1|ff2)/fc1/bias$", P("model")),
    (r"/(ff1|ff2)/fc2/kernel$", P("model", None)),
    (r"/lm_head/kernel$", P(None, "model")),
    (r"/lm_head/bias$", P("model")),
]

# expert parallelism: expert-stacked MoE tensors shard their leading E dim
# on the 'expert' axis (ssak_tpu.parallel.moe); XLA lowers the dispatch/
# combine einsums to all-to-all over ICI. Composes with the TP rules above
# when the mesh has both axes.
WAV2VEC2_MOE_RULES = [
    (r"/moe/(w1|w2)$", P("expert", None, None)),
    (r"/moe/(b1|b2)$", P("expert", None)),
] + WAV2VEC2_RULES


def partition_spec_for(path: str, leaf, rules, mesh=None) -> P:
    """Resolve the PartitionSpec for a parameter path; falls back to
    replication. Skips sharding when the dim isn't divisible by the mesh
    axis size (e.g. tiny test configs)."""
    for pattern, spec in rules:
        if re.search(pattern, path):
            if mesh is not None and not _divisible(leaf, spec, mesh):
                return P()
            return spec
    return P()


def _divisible(leaf, spec, mesh) -> bool:
    shape = getattr(leaf, "shape", ())
    for dim, axis in enumerate(spec):
        if axis is None:
            continue
        if not isinstance(axis, tuple) and axis not in mesh.shape:
            return False  # rule references an axis this mesh doesn't have
        size = mesh.shape[axis] if not isinstance(axis, tuple) else 1
        if dim >= len(shape) or shape[dim] % size != 0:
            return False
    return True
