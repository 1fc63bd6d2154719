"""Device meshes and parameter sharding.

The reference's distributed story is torch DataParallel / Lightning DDP
(SURVEY.md §2.4); here parallelism is first-class: a Mesh with named axes
("data", "model"), NamedSharding placement of parameter pytrees via rules
(ssak_tpu.parallel.sharding), and XLA-inserted collectives over ICI.
Multi-host: call jax.distributed.initialize() before building the mesh.
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator_address: str = None, num_processes: int = None, process_id: int = None):
    """Initialize jax.distributed for multi-host pods (DCN coordination;
    collectives still ride ICI). On Cloud TPU the arguments are discovered
    from the environment automatically."""
    import os

    import jax

    kwargs = {}
    if coordinator_address:
        kwargs = {
            "coordinator_address": coordinator_address,
            "num_processes": num_processes,
            "process_id": process_id,
        }
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # cross-process collectives on the host backend ride Gloo (CI /
        # multi-host dryruns without chips); TPU pods use ICI natively
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass
    jax.distributed.initialize(**kwargs)
    from ssak_tpu.utils.monitoring import logger

    logger.info(
        f"multihost initialized: process {jax.process_index()}/{jax.process_count()}, "
        f"{jax.local_device_count()} local / {jax.device_count()} global devices"
    )


def make_mesh(data: int = None, model: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh. data defaults to n_devices/model."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_params(params, mesh: Mesh, rules):
    """Place parameters per sharding rules (path regex -> PartitionSpec)."""
    from ssak_tpu.parallel.sharding import partition_spec_for

    def place(path, leaf):
        spec = partition_spec_for(path, leaf, rules, mesh)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return _tree_map_with_path(place, params)


def shardings_like(params, mesh: Mesh, rules):
    """Pytree of NamedShardings matching shard_params placement (for pjit
    in_shardings/out_shardings)."""
    from ssak_tpu.parallel.sharding import partition_spec_for

    def spec(path, leaf):
        return NamedSharding(mesh, partition_spec_for(path, leaf, rules, mesh))

    return _tree_map_with_path(spec, params)


def _tree_map_with_path(fn, tree):
    def walk(path, node):
        if isinstance(node, dict):
            return {k: walk(f"{path}/{k}", v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            t = [walk(f"{path}/{i}", v) for i, v in enumerate(node)]
            return type(node)(t) if not isinstance(node, tuple) else tuple(t)
        return fn(path, node)

    return walk("", tree)


def data_sharding(mesh: Mesh):
    """Batch-dim sharding for input arrays."""
    return NamedSharding(mesh, P("data"))
