"""Segmentation losses in jnp.

Parity targets:
  * BCEDiceLoss (reference README.md:1855-1907): 0.5*BCEWithLogits(pos_weight)
    + 0.5*(1 - Dice), Dice smooth = 1e-6, computed on sigmoid probabilities
    flattened over the whole batch;
  * FocalLoss (reference README.md:1914-1939): alpha=0.25, gamma=2.
All functions take logits [B, H, W, 1] (or any shape) and {0,1} targets of
the same shape and return scalars.
"""

import jax
import jax.numpy as jnp


def bce_with_logits(logits, targets, pos_weight: float | None = None):
    """Numerically-stable binary cross-entropy on logits.

    Matches torch.nn.BCEWithLogitsLoss (README.md:1866): with pos_weight w,
    loss = -[w * t * log s + (1 - t) * log (1 - s)], mean-reduced.
    """
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    w_pos = 1.0 if pos_weight is None else pos_weight
    loss = -(w_pos * targets * log_p + (1.0 - targets) * log_not_p)
    return jnp.mean(loss)


def dice_loss(logits, targets, smooth: float = 1e-6):
    """1 - Dice coefficient over the flattened batch (README.md:1879-1888)."""
    probs = jax.nn.sigmoid(logits.astype(jnp.float32)).reshape(-1)
    targets = targets.astype(jnp.float32).reshape(-1)
    intersection = jnp.sum(probs * targets)
    dice = (2.0 * intersection + smooth) / (jnp.sum(probs) + jnp.sum(targets) + smooth)
    return 1.0 - dice


def bce_dice_loss(logits, targets, bce_weight: float = 0.5,
                  dice_weight: float = 0.5, pos_weight: float | None = None,
                  smooth: float = 1e-6):
    """Combined loss; returns (total, bce, dice) for monitoring, matching the
    reference's 3-tuple return (README.md:1893)."""
    bce = bce_with_logits(logits, targets, pos_weight)
    dice = dice_loss(logits, targets, smooth)
    return bce_weight * bce + dice_weight * dice, bce, dice


def focal_loss(logits, targets, alpha: float = 0.25, gamma: float = 2.0):
    """Focal loss on logits (README.md:1914-1939)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    probs = jax.nn.sigmoid(logits)
    ce = -(targets * jax.nn.log_sigmoid(logits)
           + (1.0 - targets) * jax.nn.log_sigmoid(-logits))
    p_t = probs * targets + (1.0 - probs) * (1.0 - targets)
    alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
    return jnp.mean(alpha_t * (1.0 - p_t) ** gamma * ce)


def compute_dice_metric(logits, targets, threshold: float = 0.5,
                        smooth: float = 1e-6):
    """Hard-Dice validation metric (reference README.md:2115-2120)."""
    preds = (jax.nn.sigmoid(logits.astype(jnp.float32)) > threshold).astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    intersection = jnp.sum(preds * targets)
    return (2.0 * intersection + smooth) / (jnp.sum(preds) + jnp.sum(targets) + smooth)
