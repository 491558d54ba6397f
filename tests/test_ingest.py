"""Real-data ingestion tests: LabelMe masks, frame extraction, COCO data.

Covers the reference's documented data-prep workflow (reference
README.md:903-917 rosbag frame extraction, :1013-1051 labelme_json_to_mask,
:1059-1084 dataset layout) re-homed in lanetpu/train/ingest.py.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

from lanetpu.ops.letterbox import letterbox_params
from lanetpu.train.ingest import (
    CocoDetectionDataset,
    convert_labelme_dir,
    labelme_to_mask,
)


# ---------------------------------------------------------------------------
# LabelMe
# ---------------------------------------------------------------------------


def _labelme_ann(h=40, w=60):
    return {
        "imageHeight": h,
        "imageWidth": w,
        "imagePath": "img.jpg",
        "shapes": [
            {"label": "lane", "shape_type": "polygon",
             "points": [[5, 5], [25, 5], [25, 15], [5, 15]]},
            {"label": "car", "shape_type": "polygon",  # filtered out
             "points": [[30, 30], [50, 30], [50, 38]]},
            {"label": "lane", "shape_type": "rectangle",
             "points": [[40, 2], [55, 10]]},
        ],
    }


def test_labelme_to_mask_polygons_and_filter():
    mask = labelme_to_mask(_labelme_ann())
    assert mask.shape == (40, 60) and mask.dtype == np.uint8
    assert mask[10, 15] == 255          # inside the lane polygon
    assert mask[5, 45] == 255           # inside the lane rectangle
    assert mask[33, 45] == 0            # 'car' shape filtered out
    assert mask[30, 5] == 0             # background
    # labels=None rasterizes everything
    mask_all = labelme_to_mask(_labelme_ann(), labels=None)
    assert mask_all[33, 45] == 255


def test_convert_labelme_dir_layout_and_dataset_roundtrip(tmp_path):
    json_dir = tmp_path / "raw"
    json_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(5):
        ann = _labelme_ann()
        name = f"frame_{i:03d}"
        ann["imagePath"] = name + ".jpg"
        with open(json_dir / (name + ".json"), "w") as f:
            json.dump(ann, f)
        img = rng.integers(0, 256, (40, 60, 3), np.uint8)
        Image.fromarray(img).save(json_dir / (name + ".jpg"))

    out = tmp_path / "dataset"
    summary = convert_labelme_dir(str(json_dir), str(out), val_fraction=0.4)
    assert summary["train"] == 3 and summary["val"] == 2
    assert not summary["skipped"]
    assert sorted(os.listdir(out / "images" / "train")) == \
        sorted(os.path.splitext(n)[0] + ".jpg"
               for n in os.listdir(out / "masks" / "train"))

    # the produced layout feeds the existing disk-dataset loader
    from lanetpu.train.data import resolve_datasets

    train_ds, val_ds = resolve_datasets(str(out), image_size=(32, 32))
    assert len(train_ds) == 3 and len(val_ds) == 2
    img, mask = train_ds[0]
    assert img.shape == (32, 32, 3) and mask.shape == (32, 32, 1)
    assert set(np.unique(mask)).issubset({0.0, 1.0})


def test_convert_labelme_embedded_image(tmp_path):
    import base64
    import io

    buf = io.BytesIO()
    Image.fromarray(np.zeros((40, 60, 3), np.uint8)).save(buf, format="PNG")
    ann = _labelme_ann()
    ann["imageData"] = base64.b64encode(buf.getvalue()).decode()
    json_dir = tmp_path / "raw"
    json_dir.mkdir()
    with open(json_dir / "a.json", "w") as f:
        json.dump(ann, f)
    summary = convert_labelme_dir(str(json_dir), str(tmp_path / "ds"))
    assert summary["train"] == 1
    assert os.path.exists(tmp_path / "ds" / "images" / "a.jpg")


# ---------------------------------------------------------------------------
# Frame extraction
# ---------------------------------------------------------------------------


def test_extract_frames_stride(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from lanetpu.train.ingest import extract_frames

    vid = str(tmp_path / "in.mp4")
    out = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
    for i in range(12):
        out.write(np.full((48, 64, 3), i * 20, np.uint8))
    out.release()

    n = extract_frames(vid, str(tmp_path / "frames"), stride=5)
    assert n == 3  # frames 0, 5, 10
    names = sorted(os.listdir(tmp_path / "frames"))
    assert names == ["frame_000000.jpg", "frame_000005.jpg",
                     "frame_000010.jpg"]

    n = extract_frames(vid, str(tmp_path / "f2"), stride=1, limit=4)
    assert n == 4


# ---------------------------------------------------------------------------
# COCO detection dataset
# ---------------------------------------------------------------------------


def _write_coco(tmp_path, img_hw=(48, 96)):
    """2 images, sparse category ids {7: 'cone', 19: 'sign'}."""
    h, w = img_hw
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(1)
    for name in ("a.jpg", "b.jpg"):
        Image.fromarray(
            rng.integers(0, 256, (h, w, 3), np.uint8)).save(img_dir / name)
    coco = {
        "images": [
            {"id": 10, "file_name": "a.jpg", "height": h, "width": w},
            {"id": 11, "file_name": "b.jpg", "height": h, "width": w},
        ],
        "categories": [{"id": 19, "name": "sign"}, {"id": 7, "name": "cone"}],
        "annotations": [
            {"id": 1, "image_id": 10, "category_id": 7,
             "bbox": [8, 8, 24, 16], "iscrowd": 0},
            {"id": 2, "image_id": 10, "category_id": 19,
             "bbox": [40, 20, 30, 20], "iscrowd": 0},
            {"id": 3, "image_id": 10, "category_id": 19,
             "bbox": [0, 0, 10, 10], "iscrowd": 1},   # crowd: skipped
            {"id": 4, "image_id": 11, "category_id": 7,
             "bbox": [2, 2, 0, 5], "iscrowd": 0},     # degenerate: skipped
        ],
    }
    ann_path = tmp_path / "ann.json"
    with open(ann_path, "w") as f:
        json.dump(coco, f)
    return str(ann_path), str(img_dir)


def test_coco_dataset_geometry(tmp_path):
    ann, img_dir = _write_coco(tmp_path)
    ds = CocoDetectionDataset(ann, img_dir, img_size=(64, 64))
    assert len(ds) == 2
    assert ds.num_classes == 2
    assert ds.class_names == ["cone", "sign"]  # sorted by category id

    imgs, gb, gc, gv = ds.gt_batch([0, 1])
    assert imgs.shape == (2, 64, 64, 3) and imgs.dtype == np.uint8
    assert gb.shape == (2, 8, 4) and gc.shape == (2, 8) and gv.shape == (2, 8)
    # image a: 2 valid boxes (crowd skipped); image b: none (degenerate)
    assert gv[0].sum() == 2 and gv[1].sum() == 0

    # boxes map through the SAME letterbox geometry as inference
    p = letterbox_params((48, 96), (64, 64))
    top, _, left, _ = p.pad
    exp = np.array([8 * p.ratio + left, 8 * p.ratio + top,
                    32 * p.ratio + left, 24 * p.ratio + top], np.float32)
    np.testing.assert_allclose(gb[0, 0], exp, atol=1e-5)
    assert gc[0, 0] == 0 and gc[0, 1] == 1  # remapped contiguous ids
    # letterbox pad bands carry the pad color
    assert (imgs[0, :top] == 114).all()


def test_coco_train_yolo_smoke(tmp_path):
    from lanetpu.train.detect_task import train_yolo

    ann, img_dir = _write_coco(tmp_path)
    ds = CocoDetectionDataset(ann, img_dir, img_size=(64, 64))
    result = train_yolo(epochs=2, batch_size=2, compute_dtype=np.float32,
                        verbose=False, data=ds)
    assert len(result["history"]) == 2
    assert result["config"].num_classes == 2
    assert np.isfinite(result["history"][-1]["loss"])


def test_coco_train_saves_class_names(tmp_path):
    """A real-dataset checkpoint must carry its class names so load-time
    labels don't fall back to the count-matched synthetic tuples
    (ADVICE r2: silent relabeling at 11/12 classes)."""
    from lanetpu.models.yolo import yolo_from_meta
    from lanetpu.runtime.engine import load_meta
    from lanetpu.train.detect_task import train_yolo

    ann, img_dir = _write_coco(tmp_path)
    ds = CocoDetectionDataset(ann, img_dir, img_size=(64, 64))
    ckpt = str(tmp_path / "yolo_real.ltpu")
    train_yolo(epochs=1, batch_size=2, compute_dtype=np.float32,
               verbose=False, data=ds, save_path=ckpt)
    meta = load_meta(ckpt)
    assert meta["classes"] == ["cone", "sign"]
    _, classes = yolo_from_meta(meta)
    assert classes == ("cone", "sign")
    # explicit override still wins
    _, classes = yolo_from_meta(meta, classes=("x", "y"))
    assert classes == ("x", "y")
    # without stored names, count-based fallback is unchanged
    _, classes = yolo_from_meta({"num_classes": 3})
    assert classes == ("0", "1", "2")


def test_coco_gt_batch_warns_on_truncation(tmp_path):
    """Dropping annotations beyond max_objects must be visible
    (ADVICE r2: silent GT loss on real COCO images)."""
    import warnings

    ann, img_dir = _write_coco(tmp_path)
    ds = CocoDetectionDataset(ann, img_dir, img_size=(64, 64),
                              max_objects=1)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        imgs, gb, gc, gv = ds.gt_batch([0])
    assert any("max_objects" in str(x.message) for x in w)
    assert ds.truncated_images == 1
    assert gv[0].sum() == 1  # kept only the first box
