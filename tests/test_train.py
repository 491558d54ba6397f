"""Loss + train-step tests: parity with the reference loss math and
loss-goes-down smoke training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lanetpu.core.config import TrainConfig, UNetConfig
from lanetpu.models.unet import UNet
from lanetpu.train.losses import (
    bce_dice_loss,
    bce_with_logits,
    compute_dice_metric,
    dice_loss,
    focal_loss,
)
from lanetpu.train.steps import create_train_state, make_eval_step, make_train_step


def test_bce_matches_torch_formula(rng):
    """Cross-check vs torch BCEWithLogitsLoss (torch is CPU-available)."""
    torch = pytest.importorskip("torch")
    logits = rng.standard_normal((2, 8, 8, 1)).astype(np.float32)
    targets = (rng.random((2, 8, 8, 1)) > 0.5).astype(np.float32)
    ours = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(targets),
                                 pos_weight=3.0))
    ref = torch.nn.BCEWithLogitsLoss(pos_weight=torch.tensor([3.0]))(
        torch.tensor(logits), torch.tensor(targets)).item()
    assert abs(ours - ref) < 1e-5


def test_dice_loss_perfect_prediction():
    targets = jnp.ones((1, 4, 4, 1))
    logits = jnp.full((1, 4, 4, 1), 20.0)  # sigmoid ~ 1
    assert float(dice_loss(logits, targets)) < 1e-3


def test_bce_dice_combination():
    logits = jnp.zeros((1, 4, 4, 1))
    targets = jnp.ones((1, 4, 4, 1))
    total, bce, dice = bce_dice_loss(logits, targets, 0.5, 0.5)
    assert abs(float(total) - 0.5 * float(bce) - 0.5 * float(dice)) < 1e-6


def test_focal_loss_down_weights_easy(rng):
    targets = jnp.ones((1, 8, 8, 1))
    easy = jnp.full((1, 8, 8, 1), 5.0)
    hard = jnp.full((1, 8, 8, 1), -5.0)
    assert float(focal_loss(easy, targets)) < float(focal_loss(hard, targets))


def test_dice_metric_range(rng):
    logits = jnp.asarray(rng.standard_normal((1, 8, 8, 1)).astype(np.float32))
    targets = jnp.asarray((rng.random((1, 8, 8, 1)) > 0.5).astype(np.float32))
    d = float(compute_dice_metric(logits, targets))
    assert 0.0 <= d <= 1.0


def test_train_step_reduces_loss():
    cfg = TrainConfig(features=(4, 8), image_size=(32, 32), batch_size=2,
                      learning_rate=1e-2, compute_dtype="float32")
    module = UNet(config=UNetConfig(features=cfg.features))
    state = create_train_state(module, jax.random.PRNGKey(0), cfg,
                               steps_per_epoch=10)
    step = jax.jit(make_train_step(cfg))

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    # learnable target: bright blob in the middle
    masks = np.zeros((2, 32, 32, 1), np.float32)
    masks[:, 8:24, 8:24] = 1.0
    masks = jnp.asarray(masks)

    losses = []
    for _ in range(12):
        state, metrics = step(state, images, masks)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 12


def test_train_step_updates_batch_stats():
    cfg = TrainConfig(features=(4,), image_size=(16, 16))
    module = UNet(config=UNetConfig(features=cfg.features))
    state = create_train_state(module, jax.random.PRNGKey(0), cfg)
    step = jax.jit(make_train_step(cfg))
    images = jnp.ones((1, 16, 16, 3))
    masks = jnp.ones((1, 16, 16, 1))
    before = jax.tree_util.tree_leaves(state.batch_stats)[0].copy()
    state, _ = step(state, images, masks)
    after = jax.tree_util.tree_leaves(state.batch_stats)[0]
    assert not np.allclose(before, after)


def test_eval_step_runs():
    cfg = TrainConfig(features=(4,), image_size=(16, 16))
    module = UNet(config=UNetConfig(features=cfg.features))
    state = create_train_state(module, jax.random.PRNGKey(0), cfg)
    eval_step = jax.jit(make_eval_step(cfg))
    m = eval_step(state, jnp.ones((1, 16, 16, 3)), jnp.ones((1, 16, 16, 1)))
    assert "dice" in m and "loss" in m
