"""Train/eval steps and optimizer assembly.

Optimization recipe parity with the reference's documented training loop
(README.md:2060-2253): AdamW(lr=1e-4, weight_decay=1e-4) with
CosineAnnealingWarmRestarts(T0=10 epochs) and BCE+Dice loss, plus a linear
warmup option (README.md:1553 warmup_epochs). BatchNorm statistics ride in
`batch_stats` and are updated by the train step (the torch equivalent is
implicit in model.train()).

All steps are pure functions of (state, batch) so they jit/pjit cleanly; the
sharded multi-chip variants live in `lanetpu.parallel`.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from lanetpu.core.config import TrainConfig
from lanetpu.train.losses import bce_dice_loss, compute_dice_metric, focal_loss


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)


def warm_restart_cosine(base_lr: float, t0_steps: int, min_lr: float = 1e-6,
                        warmup_steps: int = 0, num_cycles: int = 32):
    """Linear warmup then cosine annealing with warm restarts (T_mult=1),
    the jnp equivalent of torch CosineAnnealingWarmRestarts(T0)
    (reference README.md:2177)."""
    schedules = []
    boundaries = []
    t = 0
    if warmup_steps > 0:
        schedules.append(optax.linear_schedule(0.0, base_lr, warmup_steps))
        t += warmup_steps
        boundaries.append(t)
    for _ in range(num_cycles):
        schedules.append(
            optax.cosine_decay_schedule(base_lr, t0_steps, alpha=min_lr / base_lr))
        t += t0_steps
        boundaries.append(t)
    return optax.join_schedules(schedules, boundaries[:-1])


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int):
    t0_steps = max(1, cfg.cosine_t0 * steps_per_epoch)
    warmup_steps = cfg.warmup_epochs * steps_per_epoch
    if cfg.scheduler == "cosine":
        lr = warm_restart_cosine(cfg.learning_rate, t0_steps, cfg.min_lr,
                                 warmup_steps)
    else:
        lr = cfg.learning_rate
    return optax.adamw(lr, weight_decay=cfg.weight_decay)


def create_train_state(module, rng, cfg: TrainConfig,
                       steps_per_epoch: int = 100) -> TrainState:
    h, w = cfg.image_size
    variables = module.init(rng, jnp.zeros((1, h, w, cfg.in_channels),
                                           jnp.float32), train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    tx = make_optimizer(cfg, steps_per_epoch)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        apply_fn=module.apply,
        tx=tx,
    )


def _loss_from_cfg(cfg: TrainConfig, logits, masks):
    if cfg.loss_type == "focal":
        loss = focal_loss(logits, masks, cfg.focal_alpha, cfg.focal_gamma)
        return loss, (loss, jnp.zeros(()))
    total, bce, dice = bce_dice_loss(
        logits, masks, cfg.bce_weight, cfg.dice_weight, cfg.pos_weight)
    if cfg.loss_type == "bce":
        return bce, (bce, dice)
    if cfg.loss_type == "dice":
        return dice, (bce, dice)
    return total, (bce, dice)


def make_train_step(cfg: TrainConfig):
    """Returns train_step(state, images, masks) -> (state, metrics).

    images: [B, H, W, C] float32 normalized; masks: [B, H, W, 1] {0,1}.
    """

    def train_step(state: TrainState, images, masks):
        def loss_fn(params):
            variables = {"params": params}
            mutable = []
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            out = state.apply_fn(variables, images, train=True, mutable=mutable)
            logits, new_model_state = (out if mutable else (out, {}))
            loss, aux = _loss_from_cfg(cfg, logits, masks)
            return loss, (aux, new_model_state, logits)

        (loss, (aux, new_model_state, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = state.tx.update(grads, state.opt_state,
                                                 state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_model_state.get("batch_stats", state.batch_stats),
            opt_state=new_opt_state,
        )
        bce, dice = aux
        metrics = {
            "loss": loss,
            "bce": bce,
            "dice_loss": dice,
            "dice": compute_dice_metric(logits, masks),
        }
        return new_state, metrics

    return train_step


def make_distill_train_step(cfg: TrainConfig, teacher_fn: Callable):
    """Knowledge-distillation step: train_step(state, teacher_vars, images,
    masks) -> (state, metrics).

    ``teacher_fn(teacher_vars, images) -> probs [B, H, W]`` runs the frozen
    teacher on the SAME augmented batch inside the jitted step (one XLA
    program: teacher forward + student forward/backward fuse). Loss =
    (1 - alpha) * cfg hard-label loss + alpha * BCE(student, teacher probs).
    Teacher variables are threaded as jit ARGUMENTS, not closed over, so
    they are never embedded as program constants.
    """
    alpha = cfg.distill_alpha

    def train_step(state: TrainState, teacher_vars, images, masks):
        t_prob = jax.lax.stop_gradient(teacher_fn(teacher_vars, images))

        def loss_fn(params):
            variables = {"params": params}
            mutable = []
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            out = state.apply_fn(variables, images, train=True, mutable=mutable)
            logits, new_model_state = (out if mutable else (out, {}))
            hard_loss, aux = _loss_from_cfg(cfg, logits, masks)
            s = logits[..., 0].astype(jnp.float32)
            # soft-target BCE in the numerically stable logit form
            soft = jnp.mean(jnp.maximum(s, 0.0) - s * t_prob
                            + jnp.log1p(jnp.exp(-jnp.abs(s))))
            loss = (1.0 - alpha) * hard_loss + alpha * soft
            return loss, (aux, soft, new_model_state, logits)

        (loss, (aux, soft, new_model_state, logits)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(state.params))
        updates, new_opt_state = state.tx.update(grads, state.opt_state,
                                                 state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_model_state.get("batch_stats", state.batch_stats),
            opt_state=new_opt_state,
        )
        bce, dice = aux
        metrics = {
            "loss": loss,
            "bce": bce,
            "dice_loss": dice,
            "distill_bce": soft,
            "dice": compute_dice_metric(logits, masks),
        }
        return new_state, metrics

    return train_step


def make_eval_step(cfg: TrainConfig):
    def eval_step(state: TrainState, images, masks):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        logits = state.apply_fn(variables, images, train=False)
        loss, (bce, dice_l) = _loss_from_cfg(cfg, logits, masks)
        return {
            "loss": loss,
            "dice": compute_dice_metric(logits, masks),
        }

    return eval_step
