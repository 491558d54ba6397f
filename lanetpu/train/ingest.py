"""Real-data ingestion: LabelMe masks, frame extraction, COCO detection.

The reference documents a three-step data-prep workflow for user-collected
data (reference README.md):
  * record frames and keep every Nth to avoid near-duplicates
    (README.md:903-917, rosbag extraction at stride 5),
  * annotate lanes as LabelMe polygons and rasterize them to binary
    masks (README.md:1013-1051, `labelme_json_to_mask`),
  * arrange `dataset/images/{train,val}` + `dataset/masks/{train,val}`
    (README.md:1059-1084) for the torch `LaneDataset`.
Detection evaluation/annotation is COCO-format JSON
(reference src/py_utils/coco_utils.py).

This module is the lanetpu equivalent, host-side and framework-agnostic:
  * `labelme_to_mask` / `convert_labelme_dir` — polygon JSON -> binary
    PNG masks, pure PIL rasterization (no labelme/cv2 dependency), laid
    out for `train.data.DiskLaneDataset`.
  * `extract_frames` — video -> strided JPEG frames (the rosbag-recipe
    analogue; lanetpu records video instead of bags).
  * `CocoDetectionDataset` — COCO annotation JSON + image dir -> padded
    ground-truth batches for the TAL training step
    (`train.detect_task.train_yolo(data=...)`). Images are letterboxed
    with the SAME `ops.letterbox` geometry the inference path uses, so
    train-time and deploy-time preprocessing agree exactly.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np

from lanetpu.ops.letterbox import letterbox_params

__all__ = [
    "labelme_to_mask",
    "convert_labelme_dir",
    "extract_frames",
    "CocoDetectionDataset",
]


# ---------------------------------------------------------------------------
# LabelMe polygon JSON -> binary mask
# ---------------------------------------------------------------------------


def labelme_to_mask(data: dict | str, labels: tuple[str, ...] = ("lane",),
                    fill: int = 255) -> np.ndarray:
    """Rasterize a LabelMe annotation to a uint8 binary mask.

    Accepts a parsed annotation dict or a path to the JSON file. Only
    polygon shapes whose ``label`` is in `labels` are filled (the
    reference filters to the 'lane' label, README.md:1033); pass
    ``labels=None`` to accept every shape. Rectangles (2-point shapes)
    are filled as axis-aligned boxes.
    """
    from PIL import Image, ImageDraw

    if isinstance(data, str):
        with open(data) as f:
            data = json.load(f)
    h, w = int(data["imageHeight"]), int(data["imageWidth"])
    img = Image.new("L", (w, h), 0)
    draw = ImageDraw.Draw(img)
    for shape in data.get("shapes", []):
        if labels is not None and shape.get("label") not in labels:
            continue
        pts = [(float(x), float(y)) for x, y in shape["points"]]
        kind = shape.get("shape_type", "polygon")
        if kind == "rectangle" or len(pts) == 2:
            draw.rectangle([pts[0], pts[1]], fill=fill)
        elif len(pts) >= 3:
            draw.polygon(pts, fill=fill)
    return np.asarray(img, dtype=np.uint8)


def convert_labelme_dir(json_dir: str, out_dir: str,
                        labels: tuple[str, ...] = ("lane",),
                        val_fraction: float = 0.0,
                        seed: int = 42) -> dict:
    """Convert a directory of LabelMe JSONs into the dataset layout the
    trainer reads (reference README.md:1059-1084):

        out_dir/images[/train|/val]/<name>.jpg   (copied if embedded or
                                                  found next to the JSON)
        out_dir/masks[/train|/val]/<name>.png

    With ``val_fraction > 0`` the files are split deterministically
    (seeded shuffle) into train/ and val/ subdirs; otherwise everything
    lands flat in images/ + masks/ (both layouts are accepted by
    `train.data.resolve_datasets`). Returns a summary dict.
    """
    import base64
    import io
    import shutil

    from PIL import Image

    names = sorted(n for n in os.listdir(json_dir) if n.endswith(".json"))
    if not names:
        raise FileNotFoundError(f"no .json annotations in {json_dir}")
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(names))
    n_val = int(round(len(names) * val_fraction))
    val_set = {names[i] for i in order[:n_val]} if n_val else set()

    counts = {"train": 0, "val": 0}
    skipped = []
    for name in names:
        with open(os.path.join(json_dir, name)) as f:
            data = json.load(f)
        base = os.path.splitext(name)[0]
        split = "val" if name in val_set else "train"
        sub = split if n_val else ""
        img_dir = os.path.join(out_dir, "images", sub)
        mask_dir = os.path.join(out_dir, "masks", sub)
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(mask_dir, exist_ok=True)

        # the image: embedded base64 (imageData) or a file next to the JSON
        img_out = os.path.join(img_dir, base + ".jpg")
        if data.get("imageData"):
            img = Image.open(io.BytesIO(base64.b64decode(data["imageData"])))
            img.convert("RGB").save(img_out, quality=95)
        else:
            src = os.path.join(json_dir, data.get("imagePath", base + ".jpg"))
            if not os.path.exists(src):
                skipped.append(name)
                continue
            if src.lower().endswith((".jpg", ".jpeg")):
                shutil.copyfile(src, img_out)
            else:
                Image.open(src).convert("RGB").save(img_out, quality=95)

        mask = labelme_to_mask(data, labels)
        Image.fromarray(mask).save(os.path.join(mask_dir, base + ".png"))
        counts[split] += 1
    return {"train": counts["train"], "val": counts["val"],
            "skipped": skipped, "out_dir": out_dir}


# ---------------------------------------------------------------------------
# Video -> strided frames (rosbag-extraction analogue)
# ---------------------------------------------------------------------------


def extract_frames(video_path: str, out_dir: str, stride: int = 5,
                   limit: int | None = None, prefix: str = "frame") -> int:
    """Dump every `stride`-th frame of a video as JPEG files.

    Mirrors the reference's rosbag extraction recipe (README.md:903-917:
    keep every 5th frame "to avoid too many similar images"). Frames are
    written as ``{prefix}_{index:06d}.jpg`` with the original video frame
    index, so extractions at different strides line up. Returns the
    number of frames written.
    """
    import cv2

    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video: {video_path}")
    os.makedirs(out_dir, exist_ok=True)
    written = i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if i % stride == 0:
            cv2.imwrite(os.path.join(out_dir, f"{prefix}_{i:06d}.jpg"),
                        frame)
            written += 1
            if limit and written >= limit:
                break
        i += 1
    cap.release()
    return written


# ---------------------------------------------------------------------------
# COCO detection annotations -> TAL training batches
# ---------------------------------------------------------------------------


@dataclass
class CocoDetectionDataset:
    """COCO-format detection data as padded TAL ground-truth batches.

    Parses a COCO annotation JSON (``images`` / ``annotations`` with xywh
    ``bbox`` / ``categories`` — the format the reference's eval harness
    consumes, src/py_utils/coco_utils.py) and serves
    ``(imgs, gt_boxes, gt_classes, gt_valid)`` batches shaped exactly
    like `train.detect_task.make_gt_batch`, so `train_yolo(data=...)`
    and the mAP evaluator run on real data unchanged.

    Geometry: each image is letterboxed to `img_size` using
    `ops.letterbox.letterbox_params` — the same scale/pad arithmetic as
    the device inference path — and the boxes are mapped into the
    letterboxed frame. Category ids are remapped to contiguous
    ``[0, num_classes)`` in sorted-id order (COCO ids are sparse).
    """

    annotation_file: str
    image_dir: str
    img_size: tuple = (256, 256)
    max_objects: int = 8
    pad_value: int = 114
    # filled by __post_init__
    image_ids: list = field(default_factory=list, init=False)
    class_names: list = field(default_factory=list, init=False)
    truncated_images: int = field(default=0, init=False)

    def __post_init__(self):
        with open(self.annotation_file) as f:
            coco = json.load(f)
        cats = sorted(coco.get("categories", []), key=lambda c: c["id"])
        self._cat_to_idx = {c["id"]: i for i, c in enumerate(cats)}
        self.class_names = [c.get("name", str(c["id"])) for c in cats]
        self._images = {im["id"]: im for im in coco["images"]}
        self._anns: dict[int, list] = {im_id: [] for im_id in self._images}
        for ann in coco.get("annotations", []):
            if ann.get("iscrowd"):
                continue
            if ann["image_id"] in self._anns:
                self._anns[ann["image_id"]].append(ann)
        self.image_ids = sorted(self._images)

    @property
    def num_classes(self) -> int:
        return len(self.class_names)

    def __len__(self) -> int:
        return len(self.image_ids)

    def _load_sample(self, image_id: int):
        """-> (letterboxed RGB u8 [H,W,3], boxes xyxy f32 [M,4],
        classes i32 [M]) in letterboxed coordinates."""
        from PIL import Image

        info = self._images[image_id]
        path = os.path.join(self.image_dir, info["file_name"])
        img = Image.open(path).convert("RGB")
        w0, h0 = img.size
        p = letterbox_params((h0, w0), self.img_size)
        new_w, new_h = p.new_unpad_wh
        resized = np.asarray(
            img.resize((new_w, new_h), Image.BILINEAR), np.uint8)
        oh, ow = self.img_size
        canvas = np.full((oh, ow, 3), self.pad_value, np.uint8)
        top, _, left, _ = p.pad
        canvas[top:top + new_h, left:left + new_w] = resized

        boxes, classes = [], []
        for ann in self._anns[image_id]:
            x, y, bw, bh = ann["bbox"]
            if bw <= 0 or bh <= 0:
                continue
            cls = self._cat_to_idx.get(ann["category_id"])
            if cls is None:
                continue
            boxes.append([x * p.ratio + left, y * p.ratio + top,
                          (x + bw) * p.ratio + left,
                          (y + bh) * p.ratio + top])
            classes.append(cls)
        boxes = (np.asarray(boxes, np.float32) if boxes
                 else np.zeros((0, 4), np.float32))
        np.clip(boxes[:, 0::2], 0, ow, out=boxes[:, 0::2])
        np.clip(boxes[:, 1::2], 0, oh, out=boxes[:, 1::2])
        return canvas, boxes, np.asarray(classes, np.int32)

    def gt_batch(self, indices):
        """Padded ground truth for `train_step_tal` — same contract as
        `detect_task.make_gt_batch`.

        Annotations beyond ``max_objects`` are dropped; the first time that
        happens a warning is emitted and ``self.truncated_images`` counts
        affected loads thereafter (real COCO images often exceed 8 objects —
        raise ``max_objects`` rather than silently training on partial GT).
        """
        imgs, bs, cs, vs = [], [], [], []
        for i in indices:
            img, boxes, classes = self._load_sample(self.image_ids[int(i)])
            m = min(len(boxes), self.max_objects)
            if len(boxes) > self.max_objects:
                if self.truncated_images == 0:
                    import warnings
                    warnings.warn(
                        f"CocoDetectionDataset: image has {len(boxes)} "
                        f"annotations but max_objects={self.max_objects}; "
                        "excess ground truth is dropped from TAL training "
                        "(raise max_objects to keep it)", stacklevel=2)
                self.truncated_images += 1
            gb = np.zeros((self.max_objects, 4), np.float32)
            gc = np.zeros(self.max_objects, np.int32)
            gv = np.zeros(self.max_objects, np.float32)
            gb[:m] = boxes[:m]
            gc[:m] = classes[:m]
            gv[:m] = 1.0
            imgs.append(img)
            bs.append(gb)
            cs.append(gc)
            vs.append(gv)
        return np.stack(imgs), np.stack(bs), np.stack(cs), np.stack(vs)
