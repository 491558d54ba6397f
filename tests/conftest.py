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

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
