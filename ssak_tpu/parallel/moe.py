"""Mixture-of-Experts FFN with expert parallelism over an 'expert' mesh axis.

The reference has no MoE (SURVEY.md §2.4 "Expert parallel (EP/MoE): No");
this provides it as a first-class TPU-native component: a GShard-style
dense-dispatch MoE layer whose expert-stacked weights (E, ...) shard on the
'expert' axis — the dispatch/combine einsums then lower to all-to-all over
ICI by XLA's sharding propagation (no hand-written collectives, per the
scaling-book recipe: annotate shardings, let the compiler insert comms).

Design notes (TPU-first):
- top-k gating with static capacity: every shape is static, so one compiled
  program regardless of routing; overflow tokens are dropped (standard
  GShard semantics) and recovered by the residual connection.
- dispatch/combine are one-hot einsums (MXU work, not scatter/gather):
  scatter-free routing is the TPU idiom — gathers/scatters serialize on
  the scalar core, matmuls don't.
- load-balancing auxiliary loss (Shazeer/GShard: E * mean(gate_prob) ·
  mean(dispatch_frac) summed over experts) keeps routing uniform.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def moe_init(key, d_model: int, d_ff: int, num_experts: int, scale=None):
    k = jax.random.split(key, 3)
    s1 = scale if scale is not None else d_model ** -0.5
    s2 = scale if scale is not None else d_ff ** -0.5
    return {
        "gate": {"kernel": jax.random.normal(k[0], (d_model, num_experts)) * s1},
        "w1": jax.random.normal(k[1], (num_experts, d_model, d_ff)) * s1,
        "b1": jnp.zeros((num_experts, d_ff)),
        "w2": jax.random.normal(k[2], (num_experts, d_ff, d_model)) * s2,
        "b2": jnp.zeros((num_experts, d_model)),
    }


# sharding rules for expert-stacked leaves: leading E dim on 'expert'
MOE_RULES = [
    (r"/moe/(w1|b1|w2|b2)$", "expert_leading"),
]


def moe_partition_spec(path: str, leaf):
    """PartitionSpec for MoE params: expert-stacked tensors shard their
    leading dim on 'expert'; the gate is replicated."""
    import re

    for pattern, _ in MOE_RULES:
        if re.search(pattern, path):
            return P("expert", *([None] * (leaf.ndim - 1)))
    return P()


def moe_mlp(x, params, *, top_k: int = 2, capacity_factor: float = 1.25,
            dtype=jnp.bfloat16, activation=jax.nn.gelu):
    """x: (B, T, D) -> (y (B, T, D), aux_loss scalar f32).

    Static-capacity top-k routing. C = ceil(capacity_factor * S * k / E)
    rounded up to a multiple of 8 (sublane-friendly)."""
    B, T, D = x.shape
    S = B * T
    E = params["gate"]["kernel"].shape[-1]
    top_k = min(top_k, E)
    C = int(np.ceil(capacity_factor * S * top_k / E / 8.0)) * 8

    xs = x.reshape(S, D)
    gate_logits = (xs.astype(jnp.float32) @ params["gate"]["kernel"].astype(jnp.float32))
    probs = jax.nn.softmax(gate_logits, axis=-1)  # (S, E) f32

    topv, topi = jax.lax.top_k(probs, top_k)  # (S, k)
    # renormalize selected gates
    topv = topv / jnp.maximum(topv.sum(-1, keepdims=True), 1e-9)

    combine = jnp.zeros((S, E, C), jnp.float32)
    # fill counters per expert across the k choices sequentially so
    # positions are unique (k is tiny and static — an unrolled loop)
    counts = jnp.zeros((E,), jnp.int32)
    for k in range(top_k):
        e = topi[:, k]  # (S,)
        onehot = jax.nn.one_hot(e, E, dtype=jnp.int32)  # (S, E)
        pos_within = jnp.cumsum(onehot, axis=0) - onehot + counts[None, :]  # (S, E)
        pos = (pos_within * onehot).sum(-1)  # (S,)
        keep = pos < C
        # (S, E, C) routing one-hot: expert one-hot x position one-hot
        disp = jnp.einsum("se,sc->sec", jax.nn.one_hot(e, E, dtype=jnp.float32),
                          jax.nn.one_hot(pos, C, dtype=jnp.float32))
        disp = disp * keep[:, None, None]
        combine = combine + disp * topv[:, k][:, None, None]
        counts = counts + (onehot * keep[:, None].astype(jnp.int32)).sum(0)

    dispatch = (combine > 0).astype(dtype)  # (S, E, C)

    # route tokens to experts, run expert FFNs, route back — all einsums
    xe = jnp.einsum("sec,sd->ecd", dispatch, xs.astype(dtype))  # (E, C, D)
    h = activation(jnp.einsum("ecd,edf->ecf", xe, params["w1"].astype(dtype),
                              preferred_element_type=jnp.float32).astype(dtype)
                   + params["b1"].astype(dtype)[:, None])
    ye = jnp.einsum("ecf,efd->ecd", h, params["w2"].astype(dtype),
                    preferred_element_type=jnp.float32).astype(dtype) + params["b2"].astype(dtype)[:, None]
    y = jnp.einsum("sec,ecd->sd", combine.astype(dtype), ye)

    # GShard load-balancing loss
    me = probs.mean(0)  # (S,E) -> (E,) mean gate prob
    ce = dispatch.sum(-1).astype(jnp.float32).mean(0)  # mean dispatch fraction
    aux = (me * ce).sum() * E

    return y.reshape(B, T, D), aux
