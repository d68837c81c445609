"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding code is validated without TPU hardware by forcing the
host CPU platform to expose 8 devices (the pattern recommended for
distributed CI in SURVEY.md section 4). Must run before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's sitecustomize imports jax at interpreter start (to register
# the axon TPU plugin), so the env var above comes too late — force the
# platform through the live config as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


REFERENCE_RESOURCES = "/root/reference/resources"


@pytest.fixture(scope="session")
def coarse1_mesh():
    from eigenpinns_tpu.geometry import load_mesh

    return load_mesh(os.path.join(REFERENCE_RESOURCES, "coarse_1.obj"))


@pytest.fixture(scope="session")
def bunny_mesh():
    from eigenpinns_tpu.geometry import load_mesh

    return load_mesh(os.path.join(REFERENCE_RESOURCES, "bunny.obj"))


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
