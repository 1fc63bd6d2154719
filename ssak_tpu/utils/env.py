"""Runtime environment helpers for JAX on TPU/CPU.

Counterpart of reference ssak/utils/env.py (auto_device:73, use_gpu:76,
import-time --gpus handling:35-44).  On TPU there is no CUDA_VISIBLE_DEVICES
dance: we expose helpers to query the platform, build meshes, and force CPU
(e.g. for tests) via JAX_PLATFORMS.
"""

import os


def apply_platform_env():
    """Honor JAX_PLATFORMS even when the interpreter pre-imported jax with
    another default platform (sitecustomize-registered TPU plugins): the
    env var is re-applied through jax.config before any backend is touched.
    Call at the top of every CLI entry point."""
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    try:
        import jax

        jax.config.update("jax_platforms", want)
        if want == "cpu":
            n = int(os.environ.get("SSAK_TPU_CPU_DEVICES", "0") or 0)
            if n:
                jax.config.update("jax_num_cpu_devices", n)
    except Exception:
        pass


def force_cpu(n_virtual_devices: int = 0):
    """Must be called before jax is imported. Makes jax run on host CPU,
    optionally with N virtual devices for sharding tests."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    if n_virtual_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        opt = f"--xla_force_host_platform_device_count={n_virtual_devices}"
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (flags + " " + opt).strip()


def default_device():
    import jax

    return jax.devices()[0]


def platform() -> str:
    import jax

    return jax.devices()[0].platform


def is_tpu() -> bool:
    return platform() in ("tpu", "axon")


def num_devices() -> int:
    import jax

    return jax.device_count()
