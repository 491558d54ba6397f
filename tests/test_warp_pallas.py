"""Pallas warp kernel tests (interpreter mode on CPU)."""

import numpy as np
import pytest

from lanetpu.kernels.resample import warp_perspective_mxu
from lanetpu.kernels.warp_pallas import warp_perspective_pallas
from lanetpu.ops.warp import get_perspective_transform

IPM_SRC = ((29, 347), (619, 368), (202, 238), (422, 248))
IPM_DST = ((300, 580), (755, 580), (300, 100), (755, 100))


def _smooth(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    img = 127 + 60 * np.sin(xx / 20.0) + 50 * np.cos(yy / 15.0)
    return np.clip(img, 0, 255).astype(np.uint8)[..., None].repeat(3, -1)


def test_pallas_warp_identity():
    img = _smooth(32, 48)
    out = np.asarray(warp_perspective_pallas(img, np.eye(3), (48, 32),
                                             compute_dtype=np.float32,
                                             interpret=True))
    np.testing.assert_array_equal(out, img)


def test_pallas_warp_matches_einsum():
    img = _smooth(60, 80)
    m = get_perspective_transform(IPM_SRC, IPM_DST) @ np.diag([8, 8, 1.0])
    a = np.asarray(warp_perspective_pallas(img, m, (64, 48),
                                           compute_dtype=np.float32,
                                           interpret=True))
    b = np.asarray(warp_perspective_mxu(img, m, (64, 48)))
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_pallas_warp_batched():
    imgs = np.stack([_smooth(40, 50), _smooth(40, 50)[::-1].copy()])
    m = np.diag([0.8, 0.7, 1.0])
    out = np.asarray(warp_perspective_pallas(imgs, m, (40, 32),
                                             compute_dtype=np.float32,
                                             interpret=True))
    single = np.asarray(warp_perspective_pallas(imgs[1], m, (40, 32),
                                                compute_dtype=np.float32,
                                                interpret=True))
    assert out.shape == (2, 32, 40, 3)
    np.testing.assert_array_equal(out[1], single)
