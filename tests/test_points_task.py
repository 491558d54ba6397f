"""Lane-point regression task tests: label derivation + training smoke."""

import numpy as np
import pytest

from lanetpu.train.points_task import points_from_mask, train_points


def _vertical_lane_mask(h=100, w=200, x=50, width=6):
    m = np.zeros((h, w, 1), np.float32)
    m[:, x - width // 2:x + width // 2] = 1.0
    return m


def test_points_from_mask_xcoords():
    mask = _vertical_lane_mask(x=50, w=200)
    labels, valid = points_from_mask(mask, "xcoords")
    assert labels.shape == (4,) and valid.all()
    np.testing.assert_allclose(labels, (50 - 0.5) / 200, atol=0.02)


def test_points_from_mask_centerline():
    mask = _vertical_lane_mask(x=120, w=200)
    labels, valid = points_from_mask(mask, "centerline")
    assert labels.shape == (12,) and valid.all()
    xs = labels[0::2]
    ys = labels[1::2]
    np.testing.assert_allclose(xs, (120 - 0.5) / 200, atol=0.02)
    assert (np.diff(ys) > 0).all()  # rows descend the image


def test_points_from_mask_empty_rows():
    mask = np.zeros((100, 200, 1), np.float32)
    labels, valid = points_from_mask(mask, "xcoords")
    assert valid.sum() == 0


def test_train_points_smoke(tmp_path):
    """A tiny run must reduce validation MAE below the ~uniform-guess level
    and write a loadable artifact."""
    from lanetpu.runtime.engine import load_engine

    path = str(tmp_path / "points.ltpu")
    result = train_points(mode="xcoords", depth=18, epochs=3, num_train=32,
                          num_val=8, batch_size=8, image_size=(64, 64),
                          compute_dtype=np.float32, save_path=path,
                          verbose=False)
    assert result["final_val_mae"] < 0.35  # random guessing ~0.33+ on [0,1]
    module, variables, meta = load_engine(path)
    assert meta["arch"] == "resnet_regressor" and meta["num_outputs"] == 4
    import jax.numpy as jnp

    out = module.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
    assert out.shape == (1, 4)
