"""Golden-asset parity: run the pipelines against the reference's bundled
camera frame (read-only asset) and check cross-path parity. Skipped when the
asset is unavailable (e.g. CI without the mount).

Parity is asserted on *probability maps* — a randomly initialized model's
sigmoid outputs hover at the 0.5 decision boundary, so thresholded-mask IoU
is not a meaningful statistic here (trained-model mask-IoU gates live in
tests/test_trainer.py::test_trained_model_quantizes_end_to_end).
"""

import os

import numpy as np
import pytest

GOLDEN = "/root/reference/test_images/frame_001410.jpg"

pytestmark = pytest.mark.skipif(not os.path.exists(GOLDEN),
                                reason="golden asset not mounted")


@pytest.fixture(scope="module")
def frame():
    from PIL import Image

    return np.asarray(Image.open(GOLDEN).convert("RGB"))


@pytest.fixture(scope="module")
def segmenters():
    from lanetpu.core.config import PipelineConfig, UNetConfig
    from lanetpu.models.unet import UNet
    from lanetpu.runtime.lane import LaneSegmenter

    module = UNet(config=UNetConfig(features=(4, 8)))
    ref = LaneSegmenter(module=module, config=PipelineConfig(
        compute_dtype="float32", use_mxu_resample=False))
    fast = LaneSegmenter(module=module, variables=ref.variables,
                         config=PipelineConfig(compute_dtype="float32",
                                               use_mxu_resample=True))
    return ref, fast


def test_golden_prob_paths_agree(segmenters, frame):
    """Gather (cv2-parity) path vs MXU fast path on the real frame:
    probability maps must be nearly identical (same resize semantics)."""
    ref, fast = segmenters
    a = ref.predict_prob(frame[None])[0]
    b = fast.predict_prob(frame[None])[0]
    assert np.abs(a - b).mean() < 5e-3
    assert np.abs(a - b).max() < 0.1


def test_golden_warped_pipeline_runs(segmenters, frame):
    ref, fast = segmenters
    mask, _ = fast.predict_warped(frame[..., ::-1])
    assert mask.shape == (685, 1055)
    assert mask.dtype == np.uint8
    assert set(np.unique(mask)).issubset(set(range(256)))


def test_golden_bf16_vs_fp32_prob_parity(frame):
    """bf16 compute (production) vs fp32 (golden) probability MAE gate on
    the golden frame (<0.05, the reference's quant-parity 'good' bar
    applied to the dtype axis)."""
    import jax.numpy as jnp

    from lanetpu.core.config import PipelineConfig, UNetConfig
    from lanetpu.models.unet import UNet
    from lanetpu.runtime.lane import LaneSegmenter

    module32 = UNet(config=UNetConfig(features=(4, 8)))
    seg32 = LaneSegmenter(module=module32, config=PipelineConfig(
        compute_dtype="float32"))
    module16 = UNet(config=UNetConfig(features=(4, 8)), dtype=jnp.bfloat16)
    seg16 = LaneSegmenter(module=module16, variables=seg32.variables,
                          config=PipelineConfig(compute_dtype="bfloat16"))
    a = seg32.predict_prob(frame[None])[0]
    b = seg16.predict_prob(frame[None])[0]
    assert np.abs(a - b).mean() < 0.05
