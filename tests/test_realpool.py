"""Real-crop fine-tune pool tests (train.realpool).

The pool must be deterministic, hold the GOLDEN eval frame out (transfer
measurement, not memorization — tests/test_real_eval.py scores golden),
and produce photometrically sane pseudo-labels."""

import numpy as np
import pytest

from lanetpu.eval import real

pytestmark = pytest.mark.skipif(
    not real.assets_present(), reason="reference demo assets not mounted")


def test_pool_shapes_and_determinism():
    from lanetpu.train.realpool import RealCropLaneDataset

    ds = RealCropLaneDataset(12, seed=5)
    img, mask = ds[0]
    assert img.shape == (224, 224, 3) and img.dtype == np.uint8
    assert mask.shape == (224, 224, 1) and mask.dtype == np.float32
    ds2 = RealCropLaneDataset(12, seed=5)
    np.testing.assert_array_equal(ds[3][0], ds2[3][0])
    np.testing.assert_array_equal(ds[3][1], ds2[3][1])
    # different seed -> different crops
    ds3 = RealCropLaneDataset(12, seed=6)
    assert not np.array_equal(ds[3][0], ds3[3][0])


def test_pool_holds_golden_out():
    """Default pool draws only from the published bird's-eye frames —
    never the golden camera frame the production-path eval scores."""
    from lanetpu.train.realpool import RealCropLaneDataset

    ds = RealCropLaneDataset(4, seed=1)
    frames = real.demo_frames()
    pool_shapes = {f.shape for f in ds._frames}
    assert frames["normal_raw"].shape in pool_shapes
    assert len(ds._frames) == 2
    if "golden" in frames:
        assert frames["golden"].shape not in pool_shapes


def test_pool_labels_sane():
    """Most crops contain some lane; labels stay a plausible fraction."""
    from lanetpu.train.realpool import RealCropLaneDataset

    ds = RealCropLaneDataset(24, seed=9)
    fracs = [ds[i][1].mean() for i in range(24)]
    assert np.mean([f > 0 for f in fracs]) >= 0.8
    assert max(fracs) < 0.5


def test_mixed_dataset_batches():
    from lanetpu.train.realpool import MixedDataset, RealCropLaneDataset
    from lanetpu.train.synthetic import SyntheticLaneDataset

    mx = MixedDataset(SyntheticLaneDataset(8), RealCropLaneDataset(8, seed=2))
    assert len(mx) == 16
    imgs, masks = next(iter(mx.batches(4)))
    assert imgs.shape == (4, 224, 224, 3) and masks.shape == (4, 224, 224, 1)
    # shuffled stream covers both sources across a full epoch
    seen = list(mx.batches(4))
    assert sum(b[0].shape[0] for b in seen) == 16
