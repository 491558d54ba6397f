"""End-to-end lane segmentation pipeline tests (CPU backend)."""

import numpy as np
import pytest

from lanetpu.core.config import PipelineConfig, UNetConfig
from lanetpu.models.unet import UNet
from lanetpu.runtime.lane import LaneSegmenter


@pytest.fixture(scope="module")
def segmenter():
    # gather-resample reference configuration (exact cv2-chain semantics)
    cfg = PipelineConfig(backend="cpu", compute_dtype="float32", batch_size=2,
                         use_mxu_resample=False)
    module = UNet(config=UNetConfig(features=(4, 8)))
    return LaneSegmenter(module=module, config=cfg)


def test_mxu_pipeline_close_to_gather_pipeline(segmenter, rng):
    """The MXU fast path must produce nearly the same masks as the gather
    reference path (mask IoU gate, SURVEY.md §7)."""
    from lanetpu.eval.metrics import iou_score

    cfg = PipelineConfig(backend="cpu", compute_dtype="float32", batch_size=2,
                         use_mxu_resample=True)
    fast = LaneSegmenter(module=segmenter.module,
                         variables=segmenter.variables, config=cfg)
    frame = rng.integers(0, 256, size=(2, 120, 160, 3), dtype=np.uint8)
    a = segmenter.predict_batch(frame)
    b = fast.predict_batch(frame)
    # same resize semantics (no warp involved): near-exact
    assert iou_score(a > 127, b > 127) > 0.995


def test_predict_shape_and_dtype(segmenter, rng):
    frame = rng.integers(0, 256, size=(120, 160, 3), dtype=np.uint8)
    mask, dt = segmenter.predict(frame)
    assert mask.shape == (120, 160)
    assert mask.dtype == np.uint8
    assert dt > 0


def test_predict_batch(segmenter, rng):
    frames = rng.integers(0, 256, size=(3, 96, 128, 3), dtype=np.uint8)
    masks = segmenter.predict_batch(frames)
    assert masks.shape == (3, 96, 128)
    # batch-of-1 equals single
    single = segmenter.predict_batch(frames[1:2])
    np.testing.assert_array_equal(masks[1], single[0])


def test_threshold_monotonic(segmenter, rng):
    """Higher threshold => fewer positive pixels."""
    frame = rng.integers(0, 256, size=(96, 128, 3), dtype=np.uint8)
    lo = segmenter.predict_batch(frame[None], threshold=0.1)
    hi = segmenter.predict_batch(frame[None], threshold=0.9)
    assert (lo > 0).sum() >= (hi > 0).sum()


def test_threshold_no_recompile(segmenter, rng):
    """Threshold is a traced scalar: changing it must not retrace."""
    frame = rng.integers(0, 256, size=(96, 128, 3), dtype=np.uint8)
    segmenter.predict_batch(frame[None], threshold=0.3)
    n_before = len(segmenter._jit_cache)
    segmenter.predict_batch(frame[None], threshold=0.7)
    assert len(segmenter._jit_cache) == n_before


def test_predict_warped_shapes(segmenter, rng):
    frame_bgr = rng.integers(0, 256, size=(480, 640, 3), dtype=np.uint8)
    mask, _ = segmenter.predict_warped(frame_bgr)
    ow, oh = segmenter.cfg.ipm_output_size
    assert mask.shape == (oh, ow)


def test_predict_prob_range(segmenter, rng):
    frames = rng.integers(0, 256, size=(1, 96, 128, 3), dtype=np.uint8)
    prob = segmenter.predict_prob(frames)
    assert prob.shape == (1, 224, 224)
    assert prob.min() >= 0.0 and prob.max() <= 1.0


def test_mask_matches_manual_reference(segmenter, rng):
    """The fused pipeline equals the step-by-step host composition
    (resize -> normalize -> unet -> sigmoid -> threshold -> resize)."""
    import jax.numpy as jnp

    from lanetpu.ops.normalize import normalize_image
    from lanetpu.ops.resize import resize_bilinear

    frame = rng.integers(0, 256, size=(100, 150, 3), dtype=np.uint8)
    mask = segmenter.predict_batch(frame[None])[0]

    x = resize_bilinear(jnp.asarray(frame[None]), (224, 224))
    x = normalize_image(x, segmenter.cfg.mean, segmenter.cfg.std)
    if segmenter.forward_fn is not None:  # folded-BN production forward
        logits = segmenter.forward_fn(segmenter.variables, x)
    else:
        logits = segmenter.module.apply(segmenter.variables, x, train=False)
    import jax

    prob = jax.nn.sigmoid(logits[..., 0].astype(jnp.float32))
    binary = (prob > 0.5).astype(jnp.uint8) * 255
    expected = np.asarray(resize_bilinear(binary[..., None], (100, 150))[..., 0])
    np.testing.assert_array_equal(mask, expected[0])
