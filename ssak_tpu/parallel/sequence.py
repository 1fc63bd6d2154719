"""Sequence (context) parallelism over a 'seq' mesh axis.

The reference handles long audio only by host-side chunking with logit
concatenation (SURVEY.md §2.4 "Sequence/context parallel: No";
transformers_infer.py:259-265) — attention never sees the full context.
Here the encoder's time axis is sharded across chips so one program
attends over the whole sequence:

- activations are sharded (B, F/P, D) on the 'seq' axis; layernorms, MLPs
  and Q/K/V projections are purely local (zero communication);
- each attention layer all-gathers K and V over 'seq' (ICI), queries stay
  local — every chip computes its F/P query rows against the full
  key/value set. For ASR encoder lengths K/V are tiny next to the (B, H,
  Fq, Fk) score tile, so the gathered K/V fit comfortably while scores
  and probs stay sharded on the query dim — the memory that actually
  explodes with context length never materializes on one chip.

Composes with data parallelism on the batch dim via a ('data','seq') mesh.
"""

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _pad_to_multiple(x, multiple: int, axis: int):
    pad = (-x.shape[axis]) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def sp_self_attention(x, blk_attn, n_heads: int, lengths, seq_axis: str, dtype):
    """Self-attention inside a shard_map region with x: (B, F_local, D)
    sharded on the time dim; K/V all-gathered over seq_axis (tiled=True ->
    concatenated in shard order, i.e. global time order)."""
    from ssak_tpu.models import layers as L

    q = L.split_heads(L.dense(x, blk_attn["query"], dtype), n_heads)
    k = L.split_heads(L.dense(x, blk_attn["key"], dtype), n_heads)
    v = L.split_heads(L.dense(x, blk_attn["value"], dtype), n_heads)
    k = jax.lax.all_gather(k, seq_axis, axis=1, tiled=True)
    v = jax.lax.all_gather(v, seq_axis, axis=1, tiled=True)
    mask = (jnp.arange(k.shape[1])[None, :] < lengths[:, None])[:, None, None, :]
    y = L.attention(q, k, v, mask=mask, dtype=dtype)
    return L.dense(L.merge_heads(y), blk_attn["out"], dtype)


def encode_sp(params, waveform, cfg, mesh: Mesh, *, lengths=None,
              seq_axis: str = "seq", data_axis: str = None):
    """wav2vec2-style encoder with the transformer stack time-sharded.

    Pre-encoder work (conv feature extractor, projection, positional conv)
    runs outside the sharded region — it is local in time anyway and XLA
    shards it by propagation. Returns (hidden (B, F, D), frame_lengths)
    like ssak_tpu.models.wav2vec2.encode."""
    from ssak_tpu.models import layers as L
    from ssak_tpu.models import wav2vec2

    dt = cfg.compute_dtype
    feats = wav2vec2.feature_extractor(params, waveform, cfg)
    fp = params["feature_projection"]
    x = L.dense(L.layer_norm(feats, fp["layer_norm"]), fp["projection"], dt)

    frame_lengths = (
        wav2vec2.feature_extract_output_length(cfg, lengths) if lengths is not None
        else jnp.full((x.shape[0],), x.shape[1], jnp.int32)
    )
    F = x.shape[1]
    pad_mask = jnp.arange(F)[None, :] < frame_lengths[:, None]
    x = jnp.where(pad_mask[..., None], x, 0.0)

    k = cfg.num_conv_pos_embeddings
    pos = L.conv1d(x, params["encoder"]["pos_conv"], stride=1, padding=(k // 2, k // 2),
                   groups=cfg.num_conv_pos_embedding_groups, dtype=dt)
    if k % 2 == 0:
        pos = pos[:, :-1]
    x = x + L.gelu(pos)

    n_shards = mesh.shape[seq_axis]
    x = _pad_to_multiple(x, n_shards, axis=1)

    blocks = params["encoder"]["blocks"]
    x_spec = P(data_axis, seq_axis, None)
    len_spec = P(data_axis)

    def worker(x_local, lengths_local, final_ln, *block_leaves):
        blks = jax.tree.unflatten(block_treedef, block_leaves)
        if cfg.do_stable_layer_norm:
            for blk in blks:
                h = sp_self_attention(L.layer_norm(x_local, blk["attn_ln"]), blk["attn"],
                                      cfg.num_heads, lengths_local, seq_axis, dt)
                x_local = x_local + h
                x_local = x_local + L.mlp(L.layer_norm(x_local, blk["mlp_ln"]), blk["mlp"], dtype=dt)
            x_local = L.layer_norm(x_local, final_ln)
        else:
            x_local = L.layer_norm(x_local, final_ln)
            for blk in blks:
                h = sp_self_attention(x_local, blk["attn"], cfg.num_heads, lengths_local, seq_axis, dt)
                x_local = L.layer_norm(x_local + h, blk["attn_ln"])
                x_local = L.layer_norm(x_local + L.mlp(x_local, blk["mlp"], dtype=dt), blk["mlp_ln"])
        return x_local

    block_leaves, block_treedef = jax.tree.flatten(blocks)
    final_ln = params["encoder"]["layer_norm"]
    out = jax.shard_map(
        worker, mesh=mesh,
        in_specs=(x_spec, len_spec, P()) + tuple(P() for _ in block_leaves),
        out_specs=x_spec, check_vma=False,
    )(x, frame_lengths, final_ln, *block_leaves)
    return out[:, :F], frame_lengths


def ctc_log_probs_sp(params, waveform, cfg, mesh: Mesh, *, lengths=None,
                     seq_axis: str = "seq", data_axis: str = None):
    """Full sequence-parallel CTC forward (long-context inference path)."""
    from ssak_tpu.models import layers as L

    hidden, frame_lengths = encode_sp(params, waveform, cfg, mesh, lengths=lengths,
                                      seq_axis=seq_axis, data_axis=data_axis)
    logits = L.dense(hidden, params["lm_head"], cfg.compute_dtype)
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1), frame_lengths
