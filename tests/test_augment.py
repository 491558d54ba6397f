"""On-device augmentation tests (README.md:2035-2055 pipeline parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lanetpu.train.augment import (
    augment_batch,
    hsv_to_rgb,
    preprocess_eval_batch,
    rgb_to_hsv,
)
from lanetpu.ops.normalize import IMAGENET_MEAN, IMAGENET_STD


def test_hsv_roundtrip(rng):
    rgb = jnp.asarray(rng.random((8, 8, 3)).astype(np.float32))
    back = hsv_to_rgb(rgb_to_hsv(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-5)


def test_hsv_known_values():
    red = jnp.asarray([[[1.0, 0.0, 0.0]]])
    hsv = np.asarray(rgb_to_hsv(red))[0, 0]
    assert hsv[0] == pytest.approx(0.0)      # hue 0
    assert hsv[1] == pytest.approx(1.0)      # full saturation
    assert hsv[2] == pytest.approx(1.0)      # full value
    gray = jnp.asarray([[[0.5, 0.5, 0.5]]])
    hsv = np.asarray(rgb_to_hsv(gray))[0, 0]
    assert hsv[1] == pytest.approx(0.0)


def test_augment_batch_shapes_and_mask_binary(rng):
    imgs = rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)
    masks = (rng.random((4, 32, 32, 1)) > 0.7).astype(np.float32)
    x, y = augment_batch(jnp.asarray(imgs), jnp.asarray(masks),
                         jax.random.PRNGKey(0))
    assert x.shape == (4, 32, 32, 3)
    assert y.shape == (4, 32, 32, 1)
    # masks stay binary through geometric transforms (nearest sampling)
    uniq = np.unique(np.asarray(y))
    assert set(np.round(uniq, 6)).issubset({0.0, 1.0})


def test_augment_deterministic_per_key(rng):
    imgs = jnp.asarray(rng.integers(0, 256, (2, 16, 16, 3), dtype=np.uint8))
    masks = jnp.zeros((2, 16, 16, 1))
    a1, _ = augment_batch(imgs, masks, jax.random.PRNGKey(7))
    a2, _ = augment_batch(imgs, masks, jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    a3, _ = augment_batch(imgs, masks, jax.random.PRNGKey(8))
    assert not np.array_equal(np.asarray(a1), np.asarray(a3))


def test_augment_geometry_applies_to_both(rng):
    """When a flip/rotation fires, image and mask transform together: a mask
    tracking a bright blob must keep tracking it after augmentation."""
    imgs = np.zeros((8, 32, 32, 3), np.uint8)
    masks = np.zeros((8, 32, 32, 1), np.float32)
    imgs[:, 4:12, 20:28] = 255  # bright blob
    masks[:, 4:12, 20:28] = 1.0
    x, y = augment_batch(jnp.asarray(imgs), jnp.asarray(masks),
                         jax.random.PRNGKey(3))
    x = np.asarray(x)
    y = np.asarray(y)
    for i in range(8):
        if y[i].sum() == 0:
            continue
        # normalized image inside the mask should be brighter than outside
        inside = x[i][y[i][..., 0] > 0.5].mean()
        outside = x[i][y[i][..., 0] <= 0.5].mean()
        assert inside > outside


def test_eval_preprocess_is_pure_normalize(rng):
    imgs = rng.integers(0, 256, (2, 8, 8, 3), dtype=np.uint8)
    masks = np.zeros((2, 8, 8, 1), np.float32)
    x, y = preprocess_eval_batch(jnp.asarray(imgs), jnp.asarray(masks))
    expected = (imgs.astype(np.float32) - np.array(IMAGENET_MEAN)) / np.array(
        IMAGENET_STD)
    np.testing.assert_allclose(np.asarray(x), expected, rtol=1e-5, atol=1e-5)
