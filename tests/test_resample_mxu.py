"""MXU resampling kernels must agree with the gather reference ops."""

import numpy as np
import pytest

from lanetpu.kernels.resample import (
    compose_warp_to,
    resize_bilinear_mxu,
    resize_matrix,
    warp_perspective_mxu,
)
from lanetpu.ops.resize import resize_bilinear
from lanetpu.ops.warp import get_perspective_transform, warp_perspective

IPM_SRC = ((29, 347), (619, 368), (202, 238), (422, 248))
IPM_DST = ((300, 580), (755, 580), (300, 100), (755, 100))


def test_resize_matrix_rows_sum_to_one():
    m = resize_matrix(685, 224)
    np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)
    m = resize_matrix(224, 685)  # upscale
    np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)


def test_resize_mxu_matches_gather_uint8(rng):
    img = rng.integers(0, 256, size=(2, 97, 143, 3), dtype=np.uint8)
    a = np.asarray(resize_bilinear_mxu(img, (224, 224)))
    b = np.asarray(resize_bilinear(img, (224, 224)))
    diff = np.abs(a.astype(int) - b.astype(int))
    # f32 accumulation-order differences flip round-at-.5 cases: allow 2 LSB
    # on a tiny fraction of pixels
    assert diff.max() <= 2
    assert (diff > 1).mean() < 0.01


def test_resize_mxu_matches_gather_float(rng):
    img = rng.random((1, 50, 70, 1), dtype=np.float32)
    a = np.asarray(resize_bilinear_mxu(img, (100, 35)))
    b = np.asarray(resize_bilinear(img, (100, 35)))
    np.testing.assert_allclose(a, b, atol=2e-3)


def _smooth_image(h=480, w=640):
    """Natural-image stand-in: smooth gradients + low-frequency texture.

    The two-pass warp samples along slanted scanlines — quality-equivalent
    to a direct bilinear gather but not bit-identical, so white-noise inputs
    (where adjacent pixels differ by ~85 on average) are the wrong test
    vector; real camera frames are locally smooth.
    """
    yy, xx = np.mgrid[0:h, 0:w]
    img = (127 + 60 * np.sin(xx / 40.0) + 50 * np.cos(yy / 33.0)
           + 0.1 * xx + 0.05 * yy)
    return np.clip(img, 0, 255).astype(np.uint8)[..., None].repeat(3, -1)


def test_warp_mxu_matches_gather_ipm():
    """Two-pass MXU warp vs direct gather warp on the real IPM homography."""
    img = _smooth_image()
    m = get_perspective_transform(IPM_SRC, IPM_DST)
    a = np.asarray(warp_perspective_mxu(img, m, (400, 300)))
    b = np.asarray(warp_perspective(img, m, (400, 300)))
    diff = np.abs(a.astype(int) - b.astype(int))
    valid = b.sum(axis=-1) > 0
    assert np.median(diff[valid]) <= 1
    assert np.percentile(diff[valid], 99) <= 4


def test_warp_mxu_identity():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(48, 64, 1), dtype=np.uint8)
    out = np.asarray(warp_perspective_mxu(img, np.eye(3), (64, 48)))
    np.testing.assert_array_equal(out, img)


def test_warp_mxu_batched(rng):
    img = rng.integers(0, 256, size=(3, 60, 80, 3), dtype=np.uint8)
    m = get_perspective_transform(IPM_SRC, IPM_DST) @ np.diag([0.2, 0.2, 1.0])
    out = np.asarray(warp_perspective_mxu(img, m, (100, 70)))
    single = np.asarray(warp_perspective_mxu(img[1], m, (100, 70)))
    assert out.shape == (3, 70, 100, 3)
    np.testing.assert_array_equal(out[1], single)


def test_composed_warp_close_to_chain():
    """Direct composed warp to 224x224 vs the reference's two-step chain
    (warp to 1055x685 then resize): small differences (single resampling),
    but structurally the same image."""
    img = _smooth_image()
    m = get_perspective_transform(IPM_SRC, IPM_DST)
    chain = np.asarray(resize_bilinear(
        warp_perspective(img, m, (1055, 685)), (224, 224))).astype(int)
    mc = compose_warp_to(m, (1055, 685), (224, 224))
    direct = np.asarray(warp_perspective_mxu(img, mc, (224, 224))).astype(int)
    # valid (non-border) region: compare where chain has content
    valid = chain.sum(axis=-1) > 0
    diff = np.abs(chain - direct)[valid]
    assert np.median(diff) <= 3
    corr = np.corrcoef(chain[valid].ravel(), direct[valid].ravel())[0, 1]
    assert corr > 0.99


# ---------------------------------------------------------------------------
# Correctness envelope: random-homography sweep + degenerate fallback
# ---------------------------------------------------------------------------


def _random_homography(rng, in_hw, out_wh, jitter, persp_scale):
    """Random projective map: a quad fit with corner jitter (fraction of
    the image size) + bounded perspective terms (|m20|, |m21| in 1/px)."""
    h, w = in_hw
    ow, oh = out_wh
    src = np.array([[0, 0], [w, 0], [w, h], [0, h]], np.float64)
    src += rng.uniform(-jitter, jitter, (4, 2)) * [w, h]
    dst = np.array([[0, 0], [ow, 0], [ow, oh], [0, oh]], np.float64)
    m = get_perspective_transform(src, dst)
    m[2, 0] = rng.uniform(-persp_scale, persp_scale)
    m[2, 1] = rng.uniform(-persp_scale, persp_scale)
    return m


def test_warp_envelope_random_homography_sweep():
    """Documented validity region (resample.warp_perspective_mxu docstring):
    near-axis-aligned maps (corner jitter <= 3%, perspective <= 1e-3/px)
    on worst-case (uniform noise) content -> mean <= 1.6 LSB and >= 98% of
    in-range pixels within 5 LSB of the gather warp. Oblique maps (15%
    jitter) degrade measurably — asserting that too keeps the envelope
    statement honest in both directions."""
    rng = np.random.default_rng(42)  # local: draws must not depend on
    img = rng.integers(0, 256, size=(1, 96, 128, 3), dtype=np.uint8)
    out_wh = (112, 80)

    def measure(m):
        a = np.asarray(warp_perspective_mxu(img, m, out_wh, fallback=False))
        b = np.asarray(warp_perspective(img, np.asarray(m, np.float32),
                                        out_wh))
        # compare only where both see in-range content (borders blend
        # against the implicit zero in slightly different order)
        interior = (a.astype(int) > 0) & (b.astype(int) > 0)
        if interior.sum() < 1000:
            return None
        diff = np.abs(a.astype(int) - b.astype(int))[interior]
        return diff.mean(), (diff <= 5).mean()

    inside_means = []
    for trial in range(8):
        m = _random_homography(rng, (96, 128), out_wh, jitter=0.03,
                               persp_scale=1e-3)
        try:
            r = measure(m)
        except ValueError:
            continue  # degenerate draws are exercised in the fallback test
        if r is None:
            continue
        mean, within5 = r
        inside_means.append(mean)
        assert mean <= 1.6, f"trial {trial}: mean {mean}"
        assert within5 >= 0.98, f"trial {trial}: within5 {within5}"
    assert len(inside_means) >= 4  # the sweep actually exercised the kernel

    # outside the envelope the approximation visibly degrades
    worst = 0.0
    for trial in range(4):
        m = _random_homography(rng, (96, 128), out_wh, jitter=0.15,
                               persp_scale=1e-3)
        try:
            r = measure(m)
        except ValueError:
            continue
        if r is not None:
            worst = max(worst, r[0])
    assert worst > 1.0  # oblique maps exceed the in-envelope bound


def test_warp_envelope_production_ipm_full_res():
    """Envelope case (b): the production IPM at full 480x640 -> 1055x685,
    on natural (locally smooth) content — median <= 1 / p99 <= 4 LSB.
    Noise content is documented OUT of envelope for this upscaling map
    (resample.warp_perspective_mxu docstring) and asserted so here."""
    img = _smooth_image()[None]
    m = get_perspective_transform(IPM_SRC, IPM_DST)
    a = np.asarray(warp_perspective_mxu(img, m, (1055, 685)))
    b = np.asarray(warp_perspective(img, np.asarray(m, np.float32),
                                    (1055, 685)))
    interior = (a.astype(int) > 0) & (b.astype(int) > 0)
    diff = np.abs(a.astype(int) - b.astype(int))[interior]
    assert np.median(diff) <= 1
    assert np.percentile(diff, 99) <= 4

    # honesty check: white noise through the same map is NOT tight
    rng = np.random.default_rng(3)
    noise = rng.integers(0, 256, size=(1, 480, 640, 3), dtype=np.uint8)
    an = np.asarray(warp_perspective_mxu(noise, m, (1055, 685)))
    bn = np.asarray(warp_perspective(noise, np.asarray(m, np.float32),
                                     (1055, 685)))
    ni = (an.astype(int) > 0) & (bn.astype(int) > 0)
    assert np.abs(an.astype(int) - bn.astype(int))[ni].mean() > 2.0


def test_degenerate_factorization_falls_back_to_gather(rng):
    """A 90-degree rotation makes m00 - m20*x' == 0 everywhere: the
    two-pass factorization must raise without fallback and transparently
    produce the exact gather result with fallback=True (the default)."""
    img = rng.integers(0, 256, size=(1, 64, 64, 3), dtype=np.uint8)
    rot90 = np.array([[0.0, -1.0, 63.0],
                      [1.0, 0.0, 0.0],
                      [0.0, 0.0, 1.0]])
    with pytest.raises(ValueError, match="degenerate"):
        warp_perspective_mxu(img, rot90, (64, 64), fallback=False)
    a = np.asarray(warp_perspective_mxu(img, rot90, (64, 64)))  # fallback
    b = np.asarray(warp_perspective(img, np.asarray(rot90, np.float32),
                                    (64, 64)))
    np.testing.assert_array_equal(a, b)
