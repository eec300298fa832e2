"""Test configuration: CPU backend with 8 virtual devices, x64 enabled.

Multi-chip sharding is validated on a virtual CPU mesh
(xla_force_host_platform_device_count), standing in for a TPU slice.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # tests never touch the real TPU
# Hermetic per-run compile cache: stale cross-process entries (e.g. AOT
# CPU executables baked on a host with different CPU features) have hung
# cache READS mid-suite, so tests never share the user-level cache dir —
# but a run-local one stays useful (repeated identical programs across
# test files).
import tempfile as _tempfile

os.environ["PDB2R_TPU_CACHE"] = _tempfile.mkdtemp(prefix="pdb2r_test_cache_")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU platform before conftest
# runs; override it before any backend is initialized so tests stay on the
# 8-virtual-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
