"""Pipeline (GPipe) and sequence parallelism: parity against the dense
single-program forward on a virtual CPU mesh (SURVEY.md §2.4 — these are
strategies the reference lacks; validated here numerically, not just
compile-checked)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ssak_tpu.models import wav2vec2
from ssak_tpu.parallel.mesh import make_mesh


def _tiny_cfg(**kw):
    base = dict(
        conv_dim=(16, 16), conv_kernel=(10, 8), conv_stride=(5, 4),
        hidden_size=32, num_layers=4, num_heads=2, intermediate_size=64,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=2,
        vocab_size=16, dtype="float32",
    )
    base.update(kw)
    return wav2vec2.Wav2Vec2Config(**base)


def _mesh_2d(names, shape):
    devices = np.asarray(jax.devices()[: shape[0] * shape[1]]).reshape(shape)
    return Mesh(devices, names)


@pytest.mark.parametrize("stable_ln", [False, True])
def test_gpipe_ctc_forward_parity(stable_ln):
    from ssak_tpu.parallel.pipeline import ctc_log_probs_gpipe, shard_pp_params, stack_wav2vec2_params

    cfg = _tiny_cfg(do_stable_layer_norm=stable_ln)
    params = wav2vec2.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    B, T = 8, 1600
    audio = jnp.asarray(rng.randn(B, T).astype(np.float32) * 0.1)
    lengths = jnp.asarray([T, T, 1200, 800, T, 1000, 600, T], jnp.int32)

    ref_lp, ref_fl = wav2vec2.ctc_log_probs(params, audio, cfg, lengths)

    mesh = _mesh_2d(("data", "pipe"), (2, 4))
    pp = shard_pp_params(stack_wav2vec2_params(params), mesh)
    with mesh:
        lp, fl = jax.jit(
            lambda p, a, l: ctc_log_probs_gpipe(p, a, cfg, mesh, lengths=l, n_microbatches=2)
        )(pp, audio, lengths)
    np.testing.assert_array_equal(np.asarray(fl), np.asarray(ref_fl))
    # only frames within frame_lengths are meaningful
    mask = np.arange(lp.shape[1])[None, :] < np.asarray(fl)[:, None]
    diff = np.abs(np.asarray(lp) - np.asarray(ref_lp))[mask]
    assert diff.max() < 2e-4, diff.max()


def test_gpipe_ctc_grads_match_dense():
    from ssak_tpu.ops.ctc import ctc_loss as ctc_loss_scan
    from ssak_tpu.parallel.pipeline import ctc_log_probs_gpipe, shard_pp_params, stack_wav2vec2_params

    cfg = _tiny_cfg(num_layers=2)
    params = wav2vec2.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.RandomState(1)
    B, T, U = 4, 1200, 5
    batch = {
        "audio": jnp.asarray(rng.randn(B, T).astype(np.float32) * 0.1),
        "audio_lengths": jnp.asarray([T, 900, T, 700], jnp.int32),
        "labels": jnp.asarray(rng.randint(1, cfg.vocab_size, (B, U)), jnp.int32),
        "label_lengths": jnp.asarray([U, 3, U, 2], jnp.int32),
    }

    def dense_loss(p):
        lp, fl = wav2vec2.ctc_log_probs(p, batch["audio"], cfg, batch["audio_lengths"])
        return ctc_loss_scan(lp, fl, batch["labels"], batch["label_lengths"], blank_id=cfg.blank_id)

    ref_loss, ref_grads = jax.value_and_grad(dense_loss)(params)

    mesh = _mesh_2d(("data", "pipe"), (2, 2))
    pp = shard_pp_params(stack_wav2vec2_params(params), mesh)

    def pp_loss(p):
        lp, fl = ctc_log_probs_gpipe(p, batch["audio"], cfg, mesh, lengths=batch["audio_lengths"], n_microbatches=2)
        return ctc_loss_scan(lp, fl, batch["labels"], batch["label_lengths"], blank_id=cfg.blank_id)

    with mesh:
        loss, grads = jax.jit(jax.value_and_grad(pp_loss))(pp)
    assert abs(float(loss) - float(ref_loss)) < 1e-4

    # stacked block grads vs per-layer dense grads
    stacked_ref = jax.tree.map(lambda *xs: jnp.stack(xs), *ref_grads["encoder"]["blocks"])
    flat_ref, _ = jax.tree.flatten(stacked_ref)
    flat_pp, _ = jax.tree.flatten(grads["encoder"]["blocks"])
    for a, b in zip(flat_ref, flat_pp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4, rtol=1e-3)
    # a non-pipelined param too (lm_head)
    np.testing.assert_allclose(
        np.asarray(grads["lm_head"]["kernel"]), np.asarray(ref_grads["lm_head"]["kernel"]), atol=5e-4, rtol=1e-3
    )


def test_pp_train_step_runs_and_learns():
    from ssak_tpu.parallel.pipeline import make_pp_ctc_train_step, shard_pp_params, stack_wav2vec2_params
    from ssak_tpu.train.steps import init_train_state, make_optimizer

    cfg = _tiny_cfg(num_layers=4, dtype="bfloat16")
    params = stack_wav2vec2_params(wav2vec2.init_params(jax.random.PRNGKey(2), cfg))
    mesh = _mesh_2d(("data", "pipe"), (2, 4))
    opt = make_optimizer(learning_rate=3e-3, warmup_steps=1, total_steps=30)
    rng = np.random.RandomState(2)
    B, T, U = 4, 1600, 4
    batch = {
        "audio": jnp.asarray(rng.randn(B, T).astype(np.float32) * 0.1),
        "audio_lengths": jnp.full((B,), T, jnp.int32),
        "labels": jnp.asarray(rng.randint(1, cfg.vocab_size, (B, U)), jnp.int32),
        "label_lengths": jnp.full((B,), U, jnp.int32),
    }
    with mesh:
        pp = shard_pp_params(params, mesh)
        state = init_train_state(pp, opt)
        step = make_pp_ctc_train_step(cfg, opt, mesh, n_microbatches=2)
        losses = []
        for _ in range(8):
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


@pytest.mark.parametrize("stable_ln", [False, True])
def test_sequence_parallel_encode_parity(stable_ln):
    from ssak_tpu.parallel.sequence import ctc_log_probs_sp

    cfg = _tiny_cfg(do_stable_layer_norm=stable_ln, num_layers=2)
    params = wav2vec2.init_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.RandomState(3)
    B, T = 2, 4000
    audio = jnp.asarray(rng.randn(B, T).astype(np.float32) * 0.1)
    lengths = jnp.asarray([T, 2500], jnp.int32)

    ref_lp, ref_fl = wav2vec2.ctc_log_probs(params, audio, cfg, lengths)

    mesh = _mesh_2d(("data", "seq"), (2, 4))
    with mesh:
        lp, fl = jax.jit(
            lambda p, a, l: ctc_log_probs_sp(p, a, cfg, mesh, lengths=l, seq_axis="seq", data_axis="data")
        )(params, audio, lengths)
    np.testing.assert_array_equal(np.asarray(fl), np.asarray(ref_fl))
    mask = np.arange(ref_lp.shape[1])[None, :] < np.asarray(fl)[:, None]
    diff = np.abs(np.asarray(lp)[:, : ref_lp.shape[1]] - np.asarray(ref_lp))[mask]
    assert diff.max() < 2e-4, diff.max()


# ----------------------------------------------------------------- MoE / EP

def test_moe_single_expert_equals_dense_mlp():
    """E=1, top_k=1, ample capacity: MoE must reduce to the plain MLP."""
    from ssak_tpu.models import layers as L
    from ssak_tpu.parallel.moe import moe_init, moe_mlp

    key = jax.random.PRNGKey(0)
    D, F = 16, 32
    p = moe_init(key, D, F, num_experts=1)
    dense = {"fc1": {"kernel": p["w1"][0], "bias": p["b1"][0]},
             "fc2": {"kernel": p["w2"][0], "bias": p["b2"][0]}}
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, D))
    y, aux = moe_mlp(x, p, top_k=1, capacity_factor=2.0, dtype=jnp.float32)
    ref = L.mlp(x, dense, dtype=jnp.float32, activation=jax.nn.gelu)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)
    assert float(aux) == pytest.approx(1.0, abs=1e-5)  # k=1, single expert


def test_moe_routing_balance_and_capacity():
    from ssak_tpu.parallel.moe import moe_init, moe_mlp

    D, F, E = 16, 32, 4
    p = moe_init(jax.random.PRNGKey(2), D, F, num_experts=E)
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 32, D))
    y, aux = moe_mlp(x, p, top_k=2, capacity_factor=1.25, dtype=jnp.float32)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
    # near-uniform routing at init: aux close to top_k
    assert 1.0 < float(aux) < 4.0, float(aux)

    # starved capacity must drop tokens (output partially zero) but not nan
    y2, _ = moe_mlp(x, p, top_k=1, capacity_factor=0.05, dtype=jnp.float32)
    assert np.isfinite(np.asarray(y2)).all()
    assert np.abs(np.asarray(y2)).sum() < np.abs(np.asarray(y)).sum()


def test_moe_expert_parallel_matches_single_device():
    """Expert-stacked weights sharded on an 'expert' mesh axis give the
    same outputs as the unsharded layer (XLA inserts the all-to-alls)."""
    from jax.sharding import NamedSharding

    from ssak_tpu.parallel.mesh import _tree_map_with_path
    from ssak_tpu.parallel.moe import moe_init, moe_mlp, moe_partition_spec

    D, F, E = 16, 32, 4
    p = moe_init(jax.random.PRNGKey(4), D, F, num_experts=E)
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 16, D))
    ref, aux_ref = moe_mlp(x, p, top_k=2, dtype=jnp.float32)

    mesh = _mesh_2d(("data", "expert"), (2, 4))
    with mesh:
        ps = _tree_map_with_path(
            lambda path, leaf: jax.device_put(leaf, NamedSharding(mesh, moe_partition_spec("/moe" + path, leaf))), p)
        xd = jax.device_put(x, NamedSharding(mesh, jax.sharding.PartitionSpec("data")))
        y, aux = jax.jit(lambda pp, xx: moe_mlp(xx, pp, top_k=2, dtype=jnp.float32))(ps, xd)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)
    assert float(aux) == pytest.approx(float(aux_ref), abs=1e-5)


def test_moe_gradients_flow_to_all_parts():
    from ssak_tpu.parallel.moe import moe_init, moe_mlp

    D, F, E = 8, 16, 2
    p = moe_init(jax.random.PRNGKey(6), D, F, num_experts=E)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 8, D))

    def loss(p):
        y, aux = moe_mlp(x, p, top_k=2, dtype=jnp.float32)
        return (y ** 2).mean() + 0.01 * aux

    grads = jax.grad(loss)(p)
    for path, g in [("gate", grads["gate"]["kernel"]), ("w1", grads["w1"]), ("w2", grads["w2"])]:
        assert float(jnp.abs(g).sum()) > 0, path


def test_moe_ctc_trains_and_learns():
    """MoE wav2vec2-CTC with expert-parallel sharded weights: train step
    runs on a ('data','expert') mesh and the loss drops."""
    from jax.sharding import NamedSharding, PartitionSpec

    from ssak_tpu.parallel.mesh import shard_params
    from ssak_tpu.parallel.sharding import WAV2VEC2_MOE_RULES
    from ssak_tpu.train.steps import init_train_state, make_ctc_train_step, make_optimizer

    cfg = wav2vec2.make_config("tiny_test", num_experts=4, moe_top_k=2)
    params = wav2vec2.init_params(jax.random.PRNGKey(0), cfg)
    mesh = _mesh_2d(("data", "expert"), (2, 4))
    opt = make_optimizer(learning_rate=3e-3, warmup_steps=1, total_steps=40, schedule="constant")
    rng = np.random.RandomState(0)
    B = 4
    batch = {
        "audio": jnp.asarray(rng.randn(B, 3200).astype(np.float32) * 0.1),
        "audio_lengths": jnp.full((B,), 3200, jnp.int32),
        "labels": jnp.asarray(rng.randint(1, cfg.vocab_size, (B, 4)), jnp.int32),
        "label_lengths": jnp.full((B,), 4, jnp.int32),
    }
    with mesh:
        params = shard_params(params, mesh, WAV2VEC2_MOE_RULES)
        # expert weights really landed on the expert axis
        spec = params["encoder"]["blocks"][0]["moe"]["w1"].sharding.spec
        assert spec[0] == "expert", spec
        state = init_train_state(params, opt)
        step = make_ctc_train_step(cfg, opt)
        losses = []
        for _ in range(15):
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, losses


class TestMultiProcessDistributed:
    """TRUE multi-process jax.distributed (two OS processes, Gloo host
    collectives): the one distributed path the single-process dryrun can't
    see — coordinator handshake via parallel.mesh.initialize_multihost,
    per-process tarred shard interleave, and a cross-process AllReduce.
    Mirrors SURVEY §4's multi-host pod topology on CPU."""

    WORKER = '''
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "__REPO__")
from ssak_tpu.utils.env import apply_platform_env
apply_platform_env()
import jax
jax.config.update("jax_num_cpu_devices", 2)
pid, nproc, tarred, out_file = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
from ssak_tpu.parallel.mesh import initialize_multihost
initialize_multihost(coordinator_address="127.0.0.1:__PORT__", num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc and jax.local_device_count() == 2

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from ssak_tpu.data.tarred import iterate_tarred_dataset

ids, total = [], 0.0
for x, lens, rows in iterate_tarred_dataset(tarred, batch_size=2, process_index=pid, process_count=nproc):
    ids.extend(r["id"] for r in rows if r)
    total += float(np.abs(x).sum())

# cross-process AllReduce over the global ('data',) mesh: every process
# contributes its local shard statistic; all must see the global sum
mesh = Mesh(np.asarray(jax.devices()), ("data",))
local = np.full((jax.local_device_count(), 1), total, np.float32)
garr = jax.make_array_from_process_local_data(NamedSharding(mesh, P("data")), local)
gsum = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(garr)
with open(out_file, "w") as f:
    json.dump({"ids": ids, "local_stat": total, "global_sum": float(gsum)}, f)
'''

    def test_two_process_interleave_and_allreduce(self, tmp_path, tmp_audio_dir):
        import json
        import socket
        import subprocess
        import sys

        from ssak_tpu.data.tarred import create_tarred_dataset

        tone = os.path.join(tmp_audio_dir, "tone16k.wav")
        rows = [{"id": f"u{i}", "audio": tone, "start": 0.0, "end": 0.5, "duration": 0.5, "text": ""} for i in range(8)]
        tarred = str(tmp_path / "tarred_mh")
        create_tarred_dataset(rows, tarred, buckets=(1.0,), shard_size=2)  # 4 shards

        with socket.socket() as s:  # free port for the coordinator
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        worker = tmp_path / "worker.py"
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        worker.write_text(self.WORKER.replace("__REPO__", repo).replace("__PORT__", str(port)))

        env = dict(os.environ, JAX_PLATFORMS="cpu")
        env.pop("XLA_FLAGS", None)  # no virtual-device flag: 2 real cpu devs per proc
        outs = [str(tmp_path / f"out{p}.json") for p in range(2)]
        procs = [
            subprocess.Popen([sys.executable, str(worker), str(p), "2", tarred, outs[p]],
                             env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
            for p in range(2)
        ]
        for p in procs:
            stdout, _ = p.communicate(timeout=240)
            assert p.returncode == 0, stdout.decode(errors="replace")[-2000:]

        r0, r1 = (json.load(open(o)) for o in outs)
        # disjoint + complete shard interleave across processes
        assert not (set(r0["ids"]) & set(r1["ids"]))
        assert sorted(r0["ids"] + r1["ids"]) == sorted(r["id"] for r in rows)
        # AllReduce: both processes see the same global sum = 2*(stat0+stat1)
        # (each process contributes its stat from both local devices)
        expect = 2 * (r0["local_stat"] + r1["local_stat"])
        assert abs(r0["global_sum"] - expect) < 1e-2 * max(1.0, expect)
        assert r0["global_sum"] == r1["global_sum"]
