"""On-disk lane dataset: paired image/mask files.

Parity with the reference's LaneDataset (README.md:1996-2030): images
`<name>.jpg|.png` in `images/`, masks `<name>.png` in `masks/` (grayscale,
binarized at >127), sorted pairing by filename. Samples resize to the
configured input size on load (image bilinear, mask nearest so labels stay
binary) and are cached in RAM.

Directory layout (either works):
    data_root/images/*.jpg|png + data_root/masks/*.png
    data_root/train/images + data_root/train/masks (+ val/...)
"""

from __future__ import annotations

import os

import numpy as np


def _binarize_mask(mask_img: np.ndarray) -> np.ndarray:
    return (mask_img > 127).astype(np.float32)[..., None]


class DiskLaneDataset:
    """Same interface as SyntheticLaneDataset: len, [i], batches()."""

    def __init__(self, image_dir: str, mask_dir: str, image_size=(224, 224),
                 cache: bool = True):
        from PIL import Image  # gated: PIL is the only loader dependency

        self._Image = Image
        self.image_dir = image_dir
        self.mask_dir = mask_dir
        self.image_size = tuple(image_size)
        self.names = sorted(
            f for f in os.listdir(image_dir)
            if f.lower().endswith((".jpg", ".jpeg", ".png")))
        if not self.names:
            raise FileNotFoundError(f"no images in {image_dir}")
        missing = [n for n in self.names
                   if not os.path.exists(self._mask_path(n))]
        if missing:
            raise FileNotFoundError(
                f"{len(missing)} masks missing, e.g. {missing[0]}")
        self.cache = cache
        self._cached = None

    def _mask_path(self, name: str) -> str:
        stem = os.path.splitext(name)[0]
        return os.path.join(self.mask_dir, stem + ".png")

    def _load(self, name: str):
        h, w = self.image_size
        img = self._Image.open(os.path.join(self.image_dir, name))
        img = np.asarray(img.convert("RGB").resize((w, h),
                                                   self._Image.BILINEAR))
        mask = self._Image.open(self._mask_path(name))
        mask = np.asarray(mask.convert("L").resize((w, h),
                                                   self._Image.NEAREST))
        return img.astype(np.uint8), _binarize_mask(mask)

    def _materialize(self):
        if self._cached is None:
            pairs = [self._load(n) for n in self.names]
            self._cached = (np.stack([p[0] for p in pairs]),
                            np.stack([p[1] for p in pairs]))
        return self._cached

    def __len__(self):
        return len(self.names)

    def __getitem__(self, idx: int):
        if self.cache:
            imgs, masks = self._materialize()
            return imgs[idx], masks[idx]
        return self._load(self.names[idx])

    def batches(self, batch_size: int, shuffle: bool = True,
                rng: np.random.Generator | None = None,
                drop_last: bool = True):
        n = len(self.names)
        order = np.arange(n)
        if shuffle:
            (rng or np.random.default_rng(0)).shuffle(order)
        end = n // batch_size * batch_size if drop_last else n
        imgs, masks = self._materialize() if self.cache else (None, None)
        for i in range(0, end, batch_size):
            sel = order[i:i + batch_size]
            if self.cache:
                yield imgs[sel], masks[sel]
            else:
                pairs = [self._load(self.names[j]) for j in sel]
                yield (np.stack([p[0] for p in pairs]),
                       np.stack([p[1] for p in pairs]))


def resolve_datasets(data_root: str, image_size=(224, 224),
                     val_fraction: float = 0.1):
    """Build (train_ds, val_ds) from a data_root directory.

    Prefers explicit train/ + val/ subdirs; otherwise splits one
    images/+masks/ pair by a deterministic tail fraction.
    """
    tr_img = os.path.join(data_root, "train", "images")
    if os.path.isdir(tr_img):
        train = DiskLaneDataset(tr_img,
                                os.path.join(data_root, "train", "masks"),
                                image_size)
        val = DiskLaneDataset(os.path.join(data_root, "val", "images"),
                              os.path.join(data_root, "val", "masks"),
                              image_size)
        return train, val

    # the reference's documented layout (README.md:1059-1084):
    # images/{train,val}/ + masks/{train,val}/ — what convert-labelme emits
    tr_img = os.path.join(data_root, "images", "train")
    if os.path.isdir(tr_img):
        train = DiskLaneDataset(tr_img,
                                os.path.join(data_root, "masks", "train"),
                                image_size)
        val = DiskLaneDataset(os.path.join(data_root, "images", "val"),
                              os.path.join(data_root, "masks", "val"),
                              image_size)
        return train, val

    full = DiskLaneDataset(os.path.join(data_root, "images"),
                           os.path.join(data_root, "masks"), image_size)
    n_val = max(1, int(len(full) * val_fraction))
    train = DiskLaneDataset(full.image_dir, full.mask_dir, image_size)
    train.names = full.names[:-n_val]
    val = DiskLaneDataset(full.image_dir, full.mask_dir, image_size)
    val.names = full.names[-n_val:]
    return train, val
