"""On-disk paired image/mask dataset tests (reference LaneDataset parity)."""

import os

import numpy as np
import pytest

from lanetpu.train.data import DiskLaneDataset, resolve_datasets


def _make_dataset(root, n=6, size=(40, 60)):
    from PIL import Image

    img_dir = root / "images"
    mask_dir = root / "masks"
    img_dir.mkdir(parents=True)
    mask_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    h, w = size
    for i in range(n):
        Image.fromarray(rng.integers(0, 256, (h, w, 3), dtype=np.uint8)).save(
            img_dir / f"frame_{i:03d}.jpg")
        mask = np.zeros((h, w), np.uint8)
        mask[10:30, 10:40] = 255
        Image.fromarray(mask).save(mask_dir / f"frame_{i:03d}.png")
    return str(img_dir), str(mask_dir)


def test_disk_dataset_loads_and_binarizes(tmp_path):
    img_dir, mask_dir = _make_dataset(tmp_path)
    ds = DiskLaneDataset(img_dir, mask_dir, image_size=(40, 60))
    assert len(ds) == 6
    img, mask = ds[0]
    assert img.shape == (40, 60, 3) and img.dtype == np.uint8
    assert mask.shape == (40, 60, 1)
    assert set(np.unique(mask)) <= {0.0, 1.0}
    assert mask.sum() > 0


def test_disk_dataset_resizes(tmp_path):
    img_dir, mask_dir = _make_dataset(tmp_path)
    ds = DiskLaneDataset(img_dir, mask_dir, image_size=(32, 32))
    img, mask = ds[0]
    assert img.shape == (32, 32, 3) and mask.shape == (32, 32, 1)
    assert set(np.unique(mask)) <= {0.0, 1.0}  # nearest keeps it binary


def test_disk_dataset_missing_mask(tmp_path):
    img_dir, mask_dir = _make_dataset(tmp_path)
    os.remove(os.path.join(mask_dir, "frame_000.png"))
    with pytest.raises(FileNotFoundError, match="masks missing"):
        DiskLaneDataset(img_dir, mask_dir)


def test_disk_dataset_batches(tmp_path):
    img_dir, mask_dir = _make_dataset(tmp_path)
    ds = DiskLaneDataset(img_dir, mask_dir, image_size=(40, 60))
    batches = list(ds.batches(4, shuffle=False))
    assert len(batches) == 1  # drop_last
    assert batches[0][0].shape == (4, 40, 60, 3)


def test_resolve_datasets_flat_split(tmp_path):
    _make_dataset(tmp_path, n=10)
    train, val = resolve_datasets(str(tmp_path), image_size=(40, 60),
                                  val_fraction=0.2)
    assert len(train) == 8 and len(val) == 2
    assert set(train.names).isdisjoint(val.names)


def test_trainer_uses_disk_dataset(tmp_path):
    from lanetpu.core.config import TrainConfig
    from lanetpu.train.trainer import Trainer

    _make_dataset(tmp_path / "data", n=8, size=(32, 32))
    cfg = TrainConfig(synthetic=False, data_root=str(tmp_path / "data"),
                      image_size=(32, 32), features=(4,), batch_size=4,
                      compute_dtype="float32",
                      save_dir=str(tmp_path / "ckpt"), patience=50)
    trainer = Trainer(cfg)
    assert len(trainer.train_ds) == 7  # 8 - ceil(0.1*8)=1 val
    result = trainer.fit(epochs=2, verbose=False)
    assert len(result["history"]) == 2
