"""Device-timing utilities.

On some experimental JAX backends (the tunneled `axon` TPU platform in this
environment), `Array.block_until_ready()` returns before the computation has
actually finished; only a host fetch truly synchronizes. `device_sync`
forces a real sync by fetching one element, so benchmark numbers are honest
on every backend.
"""

from __future__ import annotations

import time

import jax
import numpy as np


def device_sync(out) -> None:
    """Force completion of `out` (array or pytree) with a 1-element fetch."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    leaf.block_until_ready()
    # A tiny host fetch is the only reliable fence on tunneled backends.
    np.asarray(jax.numpy.ravel(leaf)[0])


def time_fn(fn, *args, warmup: int = 3, runs: int = 10) -> dict:
    """Time fn(*args) with proper device sync. Returns ms statistics."""
    for _ in range(warmup):
        device_sync(fn(*args))
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        device_sync(fn(*args))
        times.append(time.perf_counter() - t0)
    times = np.asarray(times)
    return {
        "avg_ms": float(times.mean() * 1e3),
        "std_ms": float(times.std() * 1e3),
        "min_ms": float(times.min() * 1e3),
        "max_ms": float(times.max() * 1e3),
    }
