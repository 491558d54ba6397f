"""Lane-point regression training task.

The reference ships its point-regressor models only as compiled NPU blobs
(model/fp.rknn, model/resnet50.rknn — both stripped from the repo), with no
training code. To make the framework self-sufficient, this module derives
point labels from the synthetic lane dataset's exact masks and trains the
ResNet regressor end-to-end:

  * mode "xcoords": the lane's mean x at the 4 fixed bird's-eye rows
    y = [530, 582, 633, 685] (scaled to the image height), normalized to
    [0, 1] — the label the 4-x-coordinate model predicts (reference
    src/resnet50_node.py:25-29, :153-165);
  * mode "centerline": 6 (x, y) centerline points sampled at equally spaced
    rows (reference src/rknpu_inference.py:66-90, 12 outputs).

Loss is MSE on normalized coordinates (with a validity mask for rows where
no lane pixel exists).
"""

from __future__ import annotations

import os
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lanetpu.core.config import ResNetConfig
from lanetpu.models.resnet import FIXED_Y_COORDS, ResNetRegressor
from lanetpu.ops.normalize import normalize_image
from lanetpu.runtime.engine import save_checkpoint
from lanetpu.train.synthetic import (SyntheticLaneDataset, _wedge_region,
                                     generate_sample)


def points_from_mask(mask: np.ndarray, mode: str = "xcoords"):
    """Mask [H, W, 1] -> (labels, valid) normalized to [0, 1].

    xcoords: labels [4] = mean lane x at the scaled fixed rows.
    centerline: labels [12] = (x, y) at 6 equally spaced rows.
    """
    m = mask[..., 0] > 0.5
    h, w = m.shape
    if mode == "xcoords":
        rows = [int(round(y * (h / 685.0))) - 1 for y in FIXED_Y_COORDS]
        rows = [min(max(r, 0), h - 1) for r in rows]
        labels = np.zeros(len(rows), np.float32)
        valid = np.zeros(len(rows), np.float32)
        for i, r in enumerate(rows):
            xs = np.nonzero(m[r])[0]
            if len(xs):
                labels[i] = xs.mean() / w
                valid[i] = 1.0
        return labels, valid
    # centerline: 6 points
    rows = np.linspace(0.15, 0.95, 6)
    labels = np.zeros(12, np.float32)
    valid = np.zeros(12, np.float32)
    for i, fy in enumerate(rows):
        r = int(fy * (h - 1))
        xs = np.nonzero(m[r])[0]
        if len(xs):
            labels[2 * i] = xs.mean() / w
            labels[2 * i + 1] = fy
            valid[2 * i] = valid[2 * i + 1] = 1.0
    return labels, valid


def xcoords_from_lines(meta: dict, image_size=(224, 224)):
    """Painted-line 4-x labels (the round-5 xcoords convention).

    The round-4 convention derived the labels from the MASK (mean x of
    label pixels per row, `points_from_mask`), which weights wide
    soft-halo stripes by their lighting-dependent halo extent — measured
    val MAE 0.051 on the halo distribution. What the downstream
    controller steers on is the painted lane-line CENTER (reference
    src/resnet50_node.py:25-29, :153-165), a quantity the synthetic
    generator knows exactly, so labels now come from the true stripe
    geometry: per fixed row, the mean of the painted line centers that
    are in-frame and not wedge-occluded. The label is invariant to
    halo width, blur, degradation, and lighting — the regression target
    is well-posed again (VERDICT r4 item 3).
    """
    h, w = image_size
    rows = [int(round(y * (h / 685.0))) - 1 for y in FIXED_Y_COORDS]
    rows = [min(max(r, 0), h - 1) for r in rows]
    wedge = None
    if meta.get("wedged") and meta.get("wedge_params") is not None:
        wedge = _wedge_region((h, w), meta["wedge_params"])
    labels = np.zeros(len(rows), np.float32)
    valid = np.zeros(len(rows), np.float32)
    for i, r in enumerate(rows):
        centers = []
        for line in meta.get("lines", ()):
            x = float(line["xs"][r])
            if 0.0 <= x <= w - 1:
                if wedge is not None and wedge[r, int(round(x))]:
                    continue
                centers.append(x)
        if centers:
            labels[i] = float(np.mean(centers)) / w
            valid[i] = 1.0
    return labels, valid


def point_label_arrays(ds: SyntheticLaneDataset, mode: str):
    """Materialize (imgs, labels, valids) for a dataset under the current
    label convention: xcoords from painted-line geometry (re-rendered with
    meta — deterministic per (seed, index)), centerline from the mask."""
    imgs = np.stack([ds[i][0] for i in range(len(ds))])
    if mode == "xcoords":
        pairs = []
        for i in range(len(ds)):
            _, _, meta = generate_sample(ds.offset + i, ds.seed,
                                         ds.image_size, return_meta=True)
            pairs.append(xcoords_from_lines(meta, tuple(ds.image_size)))
    else:
        pairs = [points_from_mask(ds[i][1], mode) for i in range(len(ds))]
    labels, valids = zip(*pairs)
    return imgs, np.stack(labels), np.stack(valids)


def _batches(arrays, batch_size: int, rng: np.random.Generator,
             shuffle=True) -> Iterator:
    imgs, labels, valids = arrays
    order = np.arange(len(imgs))
    if shuffle:
        rng.shuffle(order)
    end = len(imgs) // batch_size * batch_size
    for i in range(0, end, batch_size):
        sel = order[i:i + batch_size]
        yield imgs[sel], labels[sel], valids[sel]


def train_points(mode: str = "xcoords", depth: int = 18, epochs: int = 10,
                 num_train: int = 256, num_val: int = 32, batch_size: int = 16,
                 image_size=(224, 224), learning_rate: float = 3e-4,
                 seed: int = 42, save_path: str | None = None,
                 compute_dtype=jnp.bfloat16, verbose: bool = True) -> dict:
    num_outputs = 4 if mode == "xcoords" else 12
    module = ResNetRegressor(
        config=ResNetConfig(depth=depth, num_outputs=num_outputs),
        dtype=compute_dtype)
    h, w = image_size
    variables = module.init(jax.random.PRNGKey(seed),
                            jnp.zeros((1, h, w, 3), jnp.float32))
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adamw(learning_rate, weight_decay=1e-4)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, imgs, labels, valid):
        x = normalize_image(imgs, dtype=compute_dtype)

        def loss_fn(p):
            out, new_state = module.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"])
            err = (out.astype(jnp.float32) - labels) ** 2 * valid
            return err.sum() / jnp.maximum(valid.sum(), 1.0), new_state

        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state["batch_stats"], opt_state, loss

    @jax.jit
    def eval_step(params, batch_stats, imgs, labels, valid):
        x = normalize_image(imgs, dtype=compute_dtype)
        out = module.apply({"params": params, "batch_stats": batch_stats},
                           x, train=False)
        err = jnp.abs(out.astype(jnp.float32) - labels) * valid
        return err.sum() / jnp.maximum(valid.sum(), 1.0)

    train_ds = SyntheticLaneDataset(num_train, seed=seed,
                                    image_size=image_size)
    val_ds = SyntheticLaneDataset(num_val, seed=seed + 1,
                                  image_size=image_size, offset=num_train)
    train_arrays = point_label_arrays(train_ds, mode)
    val_arrays = point_label_arrays(val_ds, mode)
    rng = np.random.default_rng(seed)
    history = []
    for epoch in range(epochs):
        losses = []
        for imgs, labels, valid in _batches(train_arrays, batch_size, rng):
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, jnp.asarray(imgs),
                jnp.asarray(labels), jnp.asarray(valid))
            losses.append(float(loss))
        maes = [float(eval_step(params, batch_stats, jnp.asarray(i),
                                jnp.asarray(l), jnp.asarray(v)))
                for i, l, v in _batches(val_arrays, batch_size, rng,
                                        shuffle=False)]
        record = {"epoch": epoch, "train_loss": float(np.mean(losses)),
                  "val_mae": float(np.mean(maes))}
        history.append(record)
        if verbose:
            print(f"epoch {epoch}: loss {record['train_loss']:.5f} "
                  f"val_mae {record['val_mae']:.4f} "
                  f"(~{record['val_mae'] * image_size[1]:.1f} px)")

    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        save_checkpoint(save_path,
                        {"params": params, "batch_stats": batch_stats},
                        {"arch": "resnet_regressor", "depth": depth,
                         "num_outputs": num_outputs, "mode": mode,
                         "label_convention": ("painted_line_centers"
                                              if mode == "xcoords"
                                              else "mask_mean_x"),
                         "val_mae": history[-1]["val_mae"]})
    return {"history": history, "params": params, "batch_stats": batch_stats,
            "module": module, "final_val_mae": history[-1]["val_mae"]}
