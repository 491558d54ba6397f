"""Test config: run everything on a virtual 8-device CPU mesh.

CI needs no TPU: all pipelines run on the CPU backend (the analogue of the
reference's RKNN simulator mode, src/py_utils/rknn_executor.py:12-15), and
multi-chip sharding is exercised on XLA's forced host-device mesh.
Must set env vars before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The jaxtyping pytest plugin imports jax BEFORE this conftest runs, so the
# env vars above can be too late — jax's config snapshots JAX_PLATFORMS at
# import. Force the platform through the config API as well; otherwise the
# whole suite silently runs over the (25 ms RTT) axon TPU tunnel.
import jax

jax.config.update("jax_platforms", "cpu")
try:
    # jax>=0.5 mechanism; the XLA_FLAGS spelling above is ignored by some
    # versions when set this late.
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass
assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, not the TPU tunnel")
assert len(jax.devices()) >= 8, "virtual CPU device count not applied"

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
