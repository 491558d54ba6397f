"""OpenCV-parity tests for the image ops (SURVEY.md §7 'hard parts':
resize/warp sampling conventions must match cv2 closely enough that
thresholded masks agree)."""

import numpy as np
import pytest

from lanetpu.ops import (
    bgr_to_rgb,
    binarize,
    get_perspective_transform,
    letterbox,
    letterbox_params,
    normalize_image,
    resize_bilinear,
    sigmoid,
    unletterbox_boxes,
    warp_perspective,
)

cv2 = pytest.importorskip("cv2")


def test_resize_bilinear_matches_cv2_uint8(rng):
    img = rng.integers(0, 256, size=(117, 203, 3), dtype=np.uint8)
    ours = np.asarray(resize_bilinear(img, (224, 224)))
    ref = cv2.resize(img, (224, 224), interpolation=cv2.INTER_LINEAR)
    # cv2 uses 11-bit fixed point; allow 1 LSB on a tiny fraction of pixels
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.max() <= 2
    assert (diff > 1).mean() < 0.01


def test_resize_bilinear_matches_cv2_float(rng):
    img = rng.random((64, 96, 1), dtype=np.float32)
    ours = np.asarray(resize_bilinear(img, (224, 160)))
    ref = cv2.resize(img, (160, 224), interpolation=cv2.INTER_LINEAR)[..., None]
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_resize_identity_is_noop(rng):
    img = rng.integers(0, 256, size=(50, 60, 3), dtype=np.uint8)
    np.testing.assert_array_equal(np.asarray(resize_bilinear(img, (50, 60))), img)


def test_resize_batched(rng):
    imgs = rng.integers(0, 256, size=(4, 32, 48, 3), dtype=np.uint8)
    out = np.asarray(resize_bilinear(imgs, (16, 24)))
    assert out.shape == (4, 16, 24, 3)
    single = np.asarray(resize_bilinear(imgs[2], (16, 24)))
    np.testing.assert_array_equal(out[2], single)


def test_get_perspective_transform_matches_cv2():
    # The exact IPM quad from the reference (src/unet_ros_node.py:239-252).
    src = np.float32([[29, 347], [619, 368], [202, 238], [422, 248]])
    dst = np.float32([[300, 580], [755, 580], [300, 100], [755, 100]])
    ours = get_perspective_transform(src, dst)
    ref = cv2.getPerspectiveTransform(src, dst)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_warp_perspective_matches_cv2(rng):
    img = rng.integers(0, 256, size=(480, 640, 3), dtype=np.uint8)
    src = np.float32([[29, 347], [619, 368], [202, 238], [422, 248]])
    dst = np.float32([[300, 580], [755, 580], [300, 100], [755, 100]])
    m = cv2.getPerspectiveTransform(src, dst)
    ref = cv2.warpPerspective(img, m, (1055, 685))
    ours = np.asarray(warp_perspective(img, m, (1055, 685)))
    diff = np.abs(ours.astype(int) - ref.astype(int))
    # bilinear warp: cv2 uses 5-bit fixed-point fractional coords; tolerate
    # small per-pixel error and near-exact agreement overall
    assert (diff <= 8).mean() > 0.995
    assert np.median(diff) <= 1


def test_warp_nearest_runs(rng):
    img = rng.integers(0, 256, size=(48, 64, 1), dtype=np.uint8)
    m = np.eye(3)
    out = np.asarray(warp_perspective(img, m, (64, 48), nearest=True))
    np.testing.assert_array_equal(out, img)


def test_letterbox_matches_reference_geometry(rng):
    img = rng.integers(0, 256, size=(480, 640, 3), dtype=np.uint8)
    p = letterbox_params((480, 640), (640, 640))
    # reference math (src/py_utils/coco_utils.py:48-69)
    r = min(640 / 480, 640 / 640)
    assert p.ratio == r
    assert p.new_unpad_wh == (640, 480)
    assert p.pad == (80, 80, 0, 0)
    out = np.asarray(letterbox(img, (640, 640)))
    assert out.shape == (640, 640, 3)
    # padded rows are zero
    assert out[:80].max() == 0 and out[-80:].max() == 0
    # center rows: resized content
    ref = cv2.resize(img, (640, 480), interpolation=cv2.INTER_LINEAR)
    diff = np.abs(out[80:-80].astype(int) - ref.astype(int))
    assert diff.max() <= 2


def test_unletterbox_boxes_roundtrip():
    p = letterbox_params((480, 640), (640, 640))
    # box at letterbox coords
    boxes = np.array([[100.0, 180.0, 300.0, 400.0]])
    back = unletterbox_boxes(boxes, p)
    # manual inverse (reference coco_utils.py:87-107)
    assert np.allclose(back[0], [100.0, 100.0, 300.0, 320.0])


def test_binarize_and_sigmoid():
    x = np.array([[-10.0, 0.0, 10.0]])
    s = np.asarray(sigmoid(x))
    assert s[0, 0] < 0.01 and abs(s[0, 1] - 0.5) < 1e-6 and s[0, 2] > 0.99
    b = np.asarray(binarize(s, 0.5))
    np.testing.assert_array_equal(b, [[0, 0, 255]])


def test_normalize_image():
    img = np.full((2, 2, 3), 128, dtype=np.uint8)
    out = np.asarray(normalize_image(img))
    expected = (128.0 - np.array([123.675, 116.28, 103.53])) / np.array(
        [58.395, 57.12, 57.375])
    np.testing.assert_allclose(out[0, 0], expected, rtol=1e-5)


def test_bgr_to_rgb(rng):
    img = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    np.testing.assert_array_equal(np.asarray(bgr_to_rgb(img)), img[..., ::-1])
