"""YOLO training task tests: data, assignment geometry, loss, smoke train."""

import numpy as np
import pytest

from lanetpu.train.detect_task import (
    _anchor_centers,
    assign_targets,
    make_batch,
    render_detection_sample,
    train_yolo,
    yolo_loss,
)


def test_render_sample_deterministic():
    a = render_detection_sample(3, seed=1, image_size=(128, 128))
    b = render_detection_sample(3, seed=1, image_size=(128, 128))
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    img, boxes, classes = a
    assert img.shape == (128, 128, 3)
    assert len(boxes) == len(classes) >= 1
    assert (boxes[:, 2] > boxes[:, 0]).all()


def test_anchor_centers_layout():
    centers, strides = _anchor_centers((64, 64), (8, 16, 32))
    assert len(centers) == 8 * 8 + 4 * 4 + 2 * 2
    # first anchor of the finest level at (4, 4)
    np.testing.assert_allclose(centers[0], [4.0, 4.0])
    assert strides[0] == 8 and strides[-1] == 32


def test_assignment_centers_inside_box():
    boxes = np.array([[16.0, 16.0, 48.0, 48.0]], np.float32)
    classes = np.array([2])
    cls_t, ltrb_t, pos = assign_targets(boxes, classes, (64, 64),
                                        num_classes=5)
    centers, strides = _anchor_centers((64, 64), (8, 16, 32))
    assert pos.any()
    # every positive anchor's center lies inside the box
    for i in np.nonzero(pos)[0]:
        cx, cy = centers[i]
        assert 16 < cx < 48 and 16 < cy < 48
        assert cls_t[i, 2] == 1.0
        # ltrb in stride units decodes back to the box
        l, t, r, b = ltrb_t[i] * strides[i]
        np.testing.assert_allclose(
            [cx - l, cy - t, cx + r, cy + b], boxes[0], atol=1e-4)


def test_assignment_empty():
    cls_t, ltrb_t, pos = assign_targets(np.zeros((0, 4), np.float32),
                                        np.zeros(0, np.int64), (64, 64),
                                        num_classes=3)
    assert not pos.any()


def test_loss_decreasing_toward_targets(rng):
    """Loss at the true target distribution is lower than at random logits."""
    import jax.numpy as jnp

    imgs, cls_t, ltrb_t, pos, _ = make_batch([0, 1], 42, (64, 64), 3)
    a = cls_t.shape[1]
    bins = 16

    def fake_outputs(level_sizes, cls_vals, dfl_vals):
        outs, off = [], 0
        for (h, w) in level_sizes:
            n = h * w
            outs.append((jnp.asarray(dfl_vals[:, off:off + n].reshape(
                2, h, w, 4 * bins)),
                jnp.asarray(cls_vals[:, off:off + n].reshape(2, h, w, -1))))
            off += n
        return outs

    sizes = [(8, 8), (4, 4), (2, 2)]
    rng_ = np.random.default_rng(0)
    rand_cls = rng_.standard_normal((2, a, 3)).astype(np.float32)
    rand_dfl = rng_.standard_normal((2, a, 4 * bins)).astype(np.float32)
    loss_rand, _ = yolo_loss(fake_outputs(sizes, rand_cls, rand_dfl),
                             jnp.asarray(cls_t), jnp.asarray(ltrb_t),
                             jnp.asarray(pos), bins)

    # near-perfect logits: +/-8 for cls, one-hot-ish DFL at the target bin
    good_cls = (cls_t * 16 - 8).astype(np.float32)
    tgt = np.clip(ltrb_t, 0, bins - 1 - 1e-3)
    good_dfl = np.zeros((2, a, 4, bins), np.float32)
    lo = np.floor(tgt).astype(int)
    for b_ in range(2):
        for i in range(a):
            for k in range(4):
                good_dfl[b_, i, k, lo[b_, i, k]] = 12.0
    loss_good, _ = yolo_loss(
        fake_outputs(sizes, good_cls, good_dfl.reshape(2, a, -1)),
        jnp.asarray(cls_t), jnp.asarray(ltrb_t), jnp.asarray(pos), bins)
    assert float(loss_good) < float(loss_rand) * 0.2


def test_train_yolo_smoke(tmp_path):
    """A tiny run must reduce the loss and write a loadable artifact."""
    from lanetpu.runtime.engine import load_engine

    path = str(tmp_path / "yolo.ltpu")
    result = train_yolo(num_classes=3, img_size=(64, 64), epochs=3,
                        num_train=16, batch_size=4, compute_dtype=np.float32,
                        save_path=path, verbose=False)
    losses = [h["loss"] for h in result["history"]]
    assert losses[-1] < losses[0]
    module, variables, meta = load_engine(path)
    assert meta["arch"] == "yolo" and meta["num_classes"] == 3


# ---------------------------------------------------------------------------
# Task-aligned assignment (TAL) + CIoU
# ---------------------------------------------------------------------------


def test_ciou_properties():
    import jax.numpy as jnp

    from lanetpu.train.detect_task import ciou

    a = jnp.asarray([[10.0, 10.0, 50.0, 50.0]])
    assert float(ciou(a, a)[0]) == pytest.approx(1.0, abs=1e-5)
    far = jnp.asarray([[200.0, 200.0, 240.0, 240.0]])
    assert float(ciou(a, far)[0]) < 0.0  # disjoint: penalty terms dominate
    near = jnp.asarray([[12.0, 12.0, 52.0, 52.0]])
    assert float(ciou(a, far)[0]) < float(ciou(a, near)[0]) < 1.0


def test_tal_assigns_best_aligned_anchor():
    import jax.numpy as jnp

    from lanetpu.train.detect_task import tal_assign

    centers, strides = _anchor_centers((64, 64), (8, 16, 32))
    a = len(centers)
    gt = jnp.asarray([[16.0, 16.0, 48.0, 48.0]])
    gt_cls = jnp.asarray([1], jnp.int32)
    gt_valid = jnp.asarray([1.0])
    # perfect box prediction at every anchor; class score peaks at one
    # in-box anchor -> that anchor must get the highest soft target
    pred_boxes = jnp.broadcast_to(gt[0], (a, 4))
    probs = np.full((a, 3), 0.05, np.float32)
    inside = [i for i, (cx, cy) in enumerate(centers)
              if 16 < cx < 48 and 16 < cy < 48]
    star = inside[len(inside) // 2]
    probs[star, 1] = 0.95
    pos, t_hat, tgt_boxes, tgt_cls = tal_assign(
        pred_boxes, jnp.asarray(probs), gt, gt_cls, gt_valid,
        jnp.asarray(centers))
    pos, t_hat = np.asarray(pos), np.asarray(t_hat)
    assert pos[star]
    assert t_hat.argmax() == star
    assert not pos[[i for i in range(a) if i not in inside]].any()
    np.testing.assert_allclose(np.asarray(tgt_boxes)[star], np.asarray(gt[0]))
    assert int(np.asarray(tgt_cls)[star]) == 1


def test_tal_assign_empty_gt():
    import jax.numpy as jnp

    from lanetpu.train.detect_task import tal_assign

    centers, _ = _anchor_centers((64, 64), (8, 16, 32))
    a = len(centers)
    pos, t_hat, _, _ = tal_assign(
        jnp.zeros((a, 4)), jnp.full((a, 3), 0.5),
        jnp.zeros((2, 4)), jnp.zeros(2, jnp.int32), jnp.zeros(2),
        jnp.asarray(centers))
    assert not np.asarray(pos).any()
    assert float(np.asarray(t_hat).sum()) == 0.0


def test_tal_loss_prefers_accurate_predictions():
    import jax.numpy as jnp

    from lanetpu.train.detect_task import make_gt_batch, yolo_loss_tal

    imgs, gb, gc, gv = make_gt_batch([0, 1], 42, (64, 64), 3)
    bins, c = 16, 3
    sizes = [(8, 8), (4, 4), (2, 2)]
    a = sum(h * w for h, w in sizes)
    centers, strides = _anchor_centers((64, 64), (8, 16, 32))

    def pack(cls_vals, dfl_vals):
        outs, off = [], 0
        for (h, w) in sizes:
            n = h * w
            outs.append((jnp.asarray(
                dfl_vals[:, off:off + n].reshape(2, h, w, 4 * bins)),
                jnp.asarray(cls_vals[:, off:off + n].reshape(2, h, w, -1))))
            off += n
        return outs

    rng_ = np.random.default_rng(0)
    rand = (rng_.standard_normal((2, a, c)).astype(np.float32),
            rng_.standard_normal((2, a, 4 * bins)).astype(np.float32))
    loss_rand, _ = yolo_loss_tal(pack(*rand), jnp.asarray(gb),
                                 jnp.asarray(gc), jnp.asarray(gv), (64, 64))

    # oracle logits: DFL peaked at the true ltrb bins, cls +8 at the true
    # class for in-box anchors
    cls_good = np.full((2, a, c), -8.0, np.float32)
    dfl_good = np.zeros((2, a, 4, bins), np.float32)
    for b_ in range(2):
        for m in range(gb.shape[1]):
            if gv[b_, m] == 0:
                continue
            x1, y1, x2, y2 = gb[b_, m]
            for i, ((cx, cy), s) in enumerate(zip(centers, strides)):
                if x1 < cx < x2 and y1 < cy < y2:
                    cls_good[b_, i, int(gc[b_, m])] = 8.0
                    lt = np.clip(np.array([cx - x1, cy - y1, x2 - cx,
                                           y2 - cy]) / s, 0, bins - 1 - 1e-3)
                    for k in range(4):
                        dfl_good[b_, i, k, int(round(lt[k]))] = 14.0
    loss_good, aux = yolo_loss_tal(
        pack(cls_good, dfl_good.reshape(2, a, -1)), jnp.asarray(gb),
        jnp.asarray(gc), jnp.asarray(gv), (64, 64))
    assert float(aux["num_pos"]) > 0
    assert float(loss_good) < float(loss_rand) * 0.5


def test_train_yolo_tal_smoke(tmp_path):
    result = train_yolo(num_classes=3, img_size=(64, 64), epochs=3,
                        num_train=16, batch_size=4, compute_dtype=np.float32,
                        verbose=False, assigner="tal")
    losses = [h["loss"] for h in result["history"]]
    assert losses[-1] < losses[0]


def test_hard_scene_distribution():
    """The de-saturated benchmark distribution: hard scenes must contain
    edge-truncated boxes, sub-0.15-scale objects, and pixels painted in
    distractor colors — and stay deterministic per (seed, index)."""
    from lanetpu.train.detect_task import (_DISTRACTOR_COLORS,
                                           render_detection_sample)

    saw_truncated = saw_small = saw_distractor = False
    for i in range(24):
        img, boxes, classes = render_detection_sample(
            i, 42, (256, 256), 11, hard=True)
        assert img.shape == (256, 256, 3) and img.dtype == np.uint8
        for b in boxes:
            assert 0 <= b[0] <= b[2] <= 256 and 0 <= b[1] <= b[3] <= 256
            wdt, hgt = b[2] - b[0], b[3] - b[1]
            if abs(wdt - hgt) > 2:  # clipped square/circle: unequal sides
                saw_truncated = True
            if max(wdt, hgt) < 0.15 * 256:
                saw_small = True
        flat = img.reshape(-1, 3).astype(np.int32)
        for c in _DISTRACTOR_COLORS:
            if (np.abs(flat - np.asarray(c)).sum(1) < 12).any():
                saw_distractor = True
                break
    assert saw_truncated and saw_small and saw_distractor

    a = render_detection_sample(3, 42, (256, 256), 11, hard=True)
    b = render_detection_sample(3, 42, (256, 256), 11, hard=True)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_easy_scene_unchanged_by_hard_refactor():
    """The easy distribution backs the shipped artifact gates; the hard-mode
    refactor must not perturb its RNG stream (same draw sequence)."""
    from lanetpu.train.detect_task import render_detection_sample

    img, boxes, classes = render_detection_sample(123, 42, (256, 256), 11)
    assert len(boxes) == len(classes) >= 1
    # boxes are full (unclipped) squares in easy mode
    for b in boxes:
        assert abs((b[2] - b[0]) - (b[3] - b[1])) < 1e-5
