"""Device mesh construction and sharding vocabulary.

The reference is a single-board app with no distributed axis at all
(SURVEY.md §2.2); its scaling axis is frames/sec. The TPU framework scales
that axis over a 2-D device mesh:

  * ``data``    — batch (frame) parallelism: each device segments its own
                  slice of the frame batch; no communication in inference,
                  gradient psum in training.
  * ``spatial`` — image-height parallelism: H is sharded across devices and
                  XLA GSPMD inserts halo exchanges for the 3x3 convs. Useful
                  when a single high-resolution frame exceeds one chip's
                  arithmetic or memory (the conv-net analogue of sequence/
                  context parallelism).

Tensor/pipeline/expert parallelism do not pay off for ~2M-param convnets
(SURVEY.md §2.2) — the mesh API keeps the axes open, but the built-in
shardings implement data x spatial.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(data: int | None = None, spatial: int = 1, devices=None) -> Mesh:
    """Build a (data, spatial) mesh. `data=None` uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % spatial == 0, f"{n} devices not divisible by spatial={spatial}"
        data = n // spatial
    assert data * spatial <= n, (
        f"mesh {data}x{spatial} needs {data * spatial} devices, have {n}")
    dev_array = np.array(devices[: data * spatial]).reshape(data, spatial)
    return Mesh(dev_array, (DATA_AXIS, SPATIAL_AXIS))


def batch_sharding(mesh: Mesh, spatial: bool = True) -> NamedSharding:
    """Sharding for [B, H, W, C] image batches: B over data, H over spatial."""
    spec = P(DATA_AXIS, SPATIAL_AXIS if spatial else None, None, None)
    return NamedSharding(mesh, spec)


def mask_sharding(mesh: Mesh, spatial: bool = True) -> NamedSharding:
    return batch_sharding(mesh, spatial)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
