"""Pipeline parallelism (GPipe schedule) over a 'pipe' mesh axis.

The reference has no pipeline parallelism (SURVEY.md §2.4: "Pipeline
parallel (PP): No"); this is a first-class TPU-native component for models
whose layer stack exceeds one chip's HBM. Design:

- transformer blocks are *stacked* into one pytree with a leading layer
  axis, sharded over the 'pipe' mesh axis — each stage holds L/P layers.
- the batch is split into M microbatches; a `lax.scan` over M+P-1 ticks
  runs the classic GPipe fill/steady/drain schedule. Each tick every stage
  applies its local layers to the microbatch it holds, then the activations
  rotate one stage forward via `lax.ppermute` (point-to-point over ICI —
  no all-to-all, no host involvement).
- outputs are collected on the last stage and replicated with a masked
  psum. Everything is differentiable: backward runs the reverse schedule
  automatically through ppermute/scan transposes (1F1B-equivalent memory is
  NOT attempted; activations for all in-flight microbatches are live, the
  standard GPipe trade-off).

Composes with data parallelism: state arrays are sharded on 'data' along
the batch dim while layer stacks are sharded on 'pipe', in one shard_map
over a ('data', 'pipe') mesh.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_blocks(blocks):
    """List of per-layer param dicts -> one pytree with leading layer axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def unstack_blocks(stacked, num_layers: int):
    return [jax.tree.map(lambda a: a[i], stacked) for i in range(num_layers)]


def _leading_spec(axis):
    """Spec sharding only the leading dim of every leaf."""
    def spec(leaf):
        rank = getattr(leaf, "ndim", 0)
        return P(axis, *([None] * (rank - 1))) if rank else P()
    return spec


def gpipe_apply(block_fn, stacked, state, mesh: Mesh, *, n_microbatches: int,
                pipe_axis: str = "pipe", data_axis: str = None):
    """Run `state` through the stacked layers with a GPipe schedule.

    block_fn(layer_params, state) -> state applies ONE layer; `state` is a
    pytree of arrays whose leading dim is the batch (e.g. {"x": (B, T, D),
    "lengths": (B,)}); auxiliary leaves travel down the pipeline with their
    microbatch. The leading (layer) dim of `stacked` must be divisible by
    mesh.shape[pipe_axis]; the batch dim by n_microbatches (and by
    mesh.shape[data_axis] * n_microbatches when data_axis is given).
    """
    n_stages = mesh.shape[pipe_axis]
    state_spec = jax.tree.map(_leading_spec(data_axis) if data_axis else lambda l: P(), state)
    stacked_spec = jax.tree.map(_leading_spec(pipe_axis), stacked)

    def worker(stacked_local, state_local):
        idx = jax.lax.axis_index(pipe_axis)
        M = n_microbatches
        mbs = jax.tree.map(lambda a: a.reshape(M, a.shape[0] // M, *a.shape[1:]), state_local)

        def apply_local(x):
            def body(c, layer_params):
                return block_fn(layer_params, c), None
            y, _ = jax.lax.scan(body, x, stacked_local)
            return y

        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def tick(inflight, t):
            mb_idx = jnp.clip(t, 0, M - 1)
            inp = jax.tree.map(lambda a: jax.lax.dynamic_index_in_dim(a, mb_idx, 0, keepdims=False), mbs)
            x = jax.tree.map(lambda i, c: jnp.where(idx == 0, i, c), inp, inflight)
            y = apply_local(x)
            nxt = jax.lax.ppermute(y, pipe_axis, perm)
            return nxt, y

        init = jax.tree.map(lambda a: jnp.zeros_like(a[0]), mbs)
        _, ys = jax.lax.scan(tick, init, jnp.arange(M + n_stages - 1))
        # last stage emitted microbatch m at tick m + n_stages - 1
        outs = jax.tree.map(lambda a: a[n_stages - 1:], ys)
        outs = jax.tree.map(lambda a: jnp.where(idx == n_stages - 1, a, jnp.zeros_like(a)), outs)
        outs = jax.lax.psum(outs, pipe_axis)
        return jax.tree.map(lambda a: a.reshape(a.shape[0] * a.shape[1], *a.shape[2:]), outs)

    return jax.shard_map(
        worker, mesh=mesh,
        in_specs=(stacked_spec, state_spec), out_specs=state_spec,
        check_vma=False,
    )(stacked, state)


# ---------------------------------------------------------------- wav2vec2

def wav2vec2_block_fn(cfg):
    """One transformer-encoder layer as a pipeline stage body (both HF
    variants — cf. ssak_tpu.models.wav2vec2.encode block loop)."""
    from ssak_tpu.models import layers as L

    dt = cfg.compute_dtype

    def fn(blk, state):
        x, lengths = state["x"], state["lengths"]
        if cfg.do_stable_layer_norm:
            h, _ = L.mha(L.layer_norm(x, blk["attn_ln"]), blk["attn"], cfg.num_heads, lengths=lengths, dtype=dt)
            x = x + h
            x = x + L.mlp(L.layer_norm(x, blk["mlp_ln"]), blk["mlp"], dtype=dt)
        else:
            h, _ = L.mha(x, blk["attn"], cfg.num_heads, lengths=lengths, dtype=dt)
            x = L.layer_norm(x + h, blk["attn_ln"])
            x = L.layer_norm(x + L.mlp(x, blk["mlp"], dtype=dt), blk["mlp_ln"])
        return {"x": x, "lengths": lengths}

    return fn


def stack_wav2vec2_params(params):
    """Return params with encoder blocks stacked for pipeline sharding."""
    out = dict(params)
    enc = dict(params["encoder"])
    enc["blocks"] = stack_blocks(params["encoder"]["blocks"])
    out["encoder"] = enc
    return out


def shard_pp_params(params, mesh: Mesh, pipe_axis: str = "pipe"):
    """Place stacked-block params: layer axis on 'pipe', rest replicated."""
    def place(path, leaf):
        if "/encoder/blocks/" in path + "/":
            rank = leaf.ndim
            return jax.device_put(leaf, NamedSharding(mesh, P(pipe_axis, *([None] * (rank - 1)))))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    from ssak_tpu.parallel.mesh import _tree_map_with_path
    return _tree_map_with_path(place, params)


def ctc_log_probs_gpipe(params, waveform, cfg, mesh, *, lengths=None,
                        n_microbatches: int = 2, pipe_axis: str = "pipe",
                        data_axis: str = "data", freeze_feature_encoder=False):
    """wav2vec2 CTC forward with the transformer block stack pipelined.

    `params` must have stacked encoder blocks (stack_wav2vec2_params). The
    conv feature extractor / projection / positional conv and the CTC head
    run data-parallel outside the pipeline region (they are a small
    fraction of FLOPs and have no layer axis)."""
    from ssak_tpu.models import layers as L
    from ssak_tpu.models import wav2vec2

    dt = cfg.compute_dtype
    feats = wav2vec2.feature_extractor(params, waveform, cfg)
    if freeze_feature_encoder:
        feats = jax.lax.stop_gradient(feats)
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

    if not cfg.do_stable_layer_norm:
        x = L.layer_norm(x, params["encoder"]["layer_norm"])

    state = {"x": x, "lengths": frame_lengths}
    state = gpipe_apply(
        wav2vec2_block_fn(cfg), params["encoder"]["blocks"], state, mesh,
        n_microbatches=n_microbatches, pipe_axis=pipe_axis, data_axis=data_axis,
    )
    x = state["x"]
    if cfg.do_stable_layer_norm:
        x = L.layer_norm(x, params["encoder"]["layer_norm"])
    logits = L.dense(x, params["lm_head"], dt)
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1), frame_lengths


def make_pp_ctc_train_step(cfg, optimizer, mesh, *, n_microbatches: int = 2,
                           pipe_axis: str = "pipe", data_axis: str = "data",
                           frozen_feature_encoder: bool = True):
    """CTC train step with a pipeline-parallel encoder: grads for the
    stacked block stack stay sharded on 'pipe', data-parallel grads are
    psum'd on 'data' by XLA's sharding propagation."""
    from functools import partial as _partial

    import optax

    from ssak_tpu.ops.ctc_pallas import ctc_loss_fast as ctc_loss

    def loss_fn(params, batch):
        log_probs, frame_lengths = ctc_log_probs_gpipe(
            params, batch["audio"], cfg, mesh, lengths=batch["audio_lengths"],
            n_microbatches=n_microbatches, pipe_axis=pipe_axis, data_axis=data_axis,
            freeze_feature_encoder=frozen_feature_encoder)
        return ctc_loss(log_probs, frame_lengths, batch["labels"], batch["label_lengths"], blank_id=cfg.blank_id)

    @_partial(jax.jit, donate_argnums=(0,))
    def step(state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(state["params"], batch)
        if frozen_feature_encoder:
            g = dict(grads)
            g["feature_extractor"] = jax.tree.map(jnp.zeros_like, grads["feature_extractor"])
            grads = g
        gnorm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        return {"params": params, "opt_state": opt_state, "step": state["step"] + 1}, {"loss": loss, "grad_norm": gnorm}

    return step
