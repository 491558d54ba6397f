"""Executor-layer tests: checkpoint container, XLAEngine contract, input
adaptation, stopwatch."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lanetpu.core.config import UNetConfig
from lanetpu.models.unet import UNet
from lanetpu.runtime.engine import (
    Stopwatch,
    XLAEngine,
    adapt_input,
    load_checkpoint,
    load_engine,
    save_checkpoint,
)


def test_checkpoint_container_roundtrip(tmp_path):
    module = UNet(config=UNetConfig(features=(4,)))
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    path = str(tmp_path / "m.ltpu")
    save_checkpoint(path, variables,
                    {"arch": "unet", "features": [4], "final_sigmoid": False})
    meta, restored = load_checkpoint(path)
    assert meta["arch"] == "unet"
    a = jax.tree_util.tree_leaves(variables)[0]
    b = jax.tree_util.tree_leaves(restored)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_checkpoint_rejects_garbage(tmp_path):
    path = tmp_path / "bad.ltpu"
    path.write_bytes(b"NOPE" + b"\x00" * 16)
    with pytest.raises(ValueError, match="not a lanetpu checkpoint"):
        load_checkpoint(str(path))


def test_load_engine_builds_module(tmp_path):
    module = UNet(config=UNetConfig(features=(4, 8)))
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    path = str(tmp_path / "m.ltpu")
    save_checkpoint(path, variables, {"arch": "unet", "features": [4, 8],
                                      "final_sigmoid": True})
    module2, variables2, meta = load_engine(path, backend="cpu")
    out = module2.apply(variables2, jnp.zeros((1, 16, 16, 3)))
    assert out.shape == (1, 16, 16, 1)
    assert float(out.min()) >= 0.0  # final_sigmoid honored


def test_load_engine_unknown_arch(tmp_path):
    path = str(tmp_path / "m.ltpu")
    save_checkpoint(path, {"params": {}}, {"arch": "wat"})
    with pytest.raises(ValueError, match="unknown arch"):
        load_engine(path)


def test_xla_engine_run_contract():
    """Engine.run: list of host arrays in, list of host arrays out
    (reference rknn_executor.py:26-42 contract)."""
    module = UNet(config=UNetConfig(features=(4,)))
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))

    def apply_fn(v, x):
        return module.apply(v, x, train=False)

    engine = XLAEngine(apply_fn, variables, backend="cpu")
    out = engine.run([np.zeros((1, 16, 16, 3), np.float32)])
    assert isinstance(out, list) and out[0].shape == (1, 16, 16, 1)
    engine.release()
    assert engine._variables is None


def test_adapt_input_squeezes_unit_dims():
    x = np.zeros((1, 4, 5, 3))
    y = adapt_input(x, target_shape=(4, 5, 3))
    assert y.shape == (4, 5, 3)
    y = adapt_input(np.zeros((4, 5, 3)), target_shape=(1, 4, 5, 3))
    assert y.shape == (1, 4, 5, 3)


def test_adapt_input_dtype_and_reject():
    y = adapt_input(np.zeros((2, 2), np.float64), target_dtype=np.float32)
    assert y.dtype == np.float32
    with pytest.raises(ValueError):
        adapt_input(np.zeros((2, 3)), target_shape=(4, 5))


def test_stopwatch_stages():
    sw = Stopwatch()
    with sw.measure("a"):
        time.sleep(0.01)
    with sw.measure("a"):
        time.sleep(0.01)
    s = sw.summary()
    assert s["a"]["count"] == 2
    assert s["a"]["mean_ms"] >= 5.0


def test_load_meta_header_only(tmp_path):
    """load_meta reads the JSON header without touching the payload and
    matches load_checkpoint's meta."""
    from lanetpu.runtime.engine import load_meta

    path = str(tmp_path / "m.ltpu")
    save_checkpoint(path, {"params": {"w": np.zeros((4, 4), np.float32)}},
                    {"arch": "unet", "features": [8], "s2d": 2})
    meta = load_meta(path)
    assert meta == load_checkpoint(path)[0]
    assert meta["s2d"] == 2
    with open(str(tmp_path / "bad.ltpu"), "wb") as f:
        f.write(b"nope")
    with pytest.raises(ValueError):
        load_meta(str(tmp_path / "bad.ltpu"))
