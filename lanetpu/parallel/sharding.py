"""pjit-sharded train/predict programs over a (data, spatial) mesh.

Design follows the XLA GSPMD recipe: annotate the shardings of inputs and
state, let the compiler insert the collectives (gradient all-reduce over
``data``, conv halo exchanges over ``spatial``), and keep the step function
identical to the single-chip one in `lanetpu.train.steps`.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh

from lanetpu.core.config import TrainConfig
from lanetpu.parallel.mesh import batch_sharding, replicated
from lanetpu.train.steps import TrainState, make_train_step


def shard_train_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Replicate model/optimizer state across the mesh (pure data parallel
    keeps params resident on every chip; a 2M-param U-Net is ~8 MB in f32,
    far below HBM pressure, so ZeRO-style sharding isn't warranted)."""
    rep = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep) if hasattr(x, "shape") else x, state)


def make_parallel_train_step(cfg: TrainConfig, mesh: Mesh, spatial: bool = True):
    """Jit the train step over the mesh.

    images/masks arrive sharded [B@data, H@spatial, W, C]; the state is
    replicated. XLA emits: halo exchanges for 3x3 convs across `spatial`,
    an all-reduce of gradients across `data` (and `spatial`, since both
    shard the loss reduction), then replicated optimizer updates.
    """
    base_step = make_train_step(cfg)
    data_sh = batch_sharding(mesh, spatial)
    rep = replicated(mesh)

    return jax.jit(
        base_step,
        in_shardings=(rep, data_sh, data_sh),
        out_shardings=(rep, rep),
    )


def make_parallel_predict(predict_fn, mesh: Mesh, spatial: bool = True,
                          donate: bool = False):
    """Jit an inference fn(frames) -> masks over the mesh (frame-batch DP)."""
    data_sh = batch_sharding(mesh, spatial)
    return jax.jit(
        predict_fn,
        in_shardings=(data_sh,),
        out_shardings=data_sh,
        donate_argnums=(0,) if donate else (),
    )
