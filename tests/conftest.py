"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars before jax initializes so sharding/pjit paths are
exercised without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

# The environment may pre-import jax (sitecustomize) with a TPU platform
# selected; jax.config can still redirect to an 8-device CPU mesh as long
# as no backend has been initialized yet.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest

REFERENCE_DATA = "/root/reference/tests/data"


@pytest.fixture(scope="session")
def reference_data_dir():
    if not os.path.isdir(REFERENCE_DATA):
        pytest.skip("reference test data not available")
    return REFERENCE_DATA


@pytest.fixture(scope="session")
def tmp_audio_dir(tmp_path_factory):
    """Generate deterministic synthetic audio fixtures."""
    from ssak_tpu.audio import save_audio

    d = tmp_path_factory.mktemp("audio")
    rng = np.random.RandomState(0)
    t = np.arange(16000 * 2) / 16000.0
    tone = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    save_audio(str(d / "tone16k.wav"), tone, 16000)
    noise = rng.randn(8000 * 3).astype(np.float32) * 0.1
    save_audio(str(d / "noise8k.wav"), noise, 8000)
    stereo = np.stack([tone[:16000], -tone[:16000]], axis=1)
    save_audio(str(d / "stereo16k.wav"), stereo, 16000)
    return str(d)
