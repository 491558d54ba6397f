"""Training loop with checkpointing, early stopping, and device prefetch.

Loop parity with the reference's documented train/validate functions
(README.md:2060-2253): per-epoch train + validate, Dice-based best
checkpoint, periodic every-N-epoch saves, early stop with patience, seed 42
determinism. TPU-native substitutions: optax AdamW + warm-restart cosine,
on-device augmentation (`augment_batch`), host->device prefetch of the next
batch while the current step runs, msgpack/orbax checkpoints.
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from lanetpu.core.config import TrainConfig, UNetConfig
from lanetpu.models.unet import UNet
from lanetpu.runtime.engine import save_checkpoint
from lanetpu.train.augment import augment_batch, preprocess_eval_batch
from lanetpu.train.steps import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from lanetpu.train.synthetic import SyntheticLaneDataset


def _prefetch(iterator: Iterator, device) -> Iterator:
    """One-deep host->device prefetch: the next batch's H2D copy overlaps
    with the current step's compute (the training-side analogue of the
    double-buffered streaming pipeline, README.md:4316-4341)."""
    pending = None
    for batch in iterator:
        nxt = tuple(jax.device_put(jnp.asarray(x), device) for x in batch)
        if pending is not None:
            yield pending
        pending = nxt
    if pending is not None:
        yield pending


class Trainer:
    def __init__(self, cfg: TrainConfig | None = None, module=None):
        self.cfg = cfg or TrainConfig()
        self.module = module or UNet(
            config=UNetConfig(features=tuple(self.cfg.features),
                              s2d=self.cfg.s2d))
        self.device = jax.devices()[0]

        if not self.cfg.synthetic and self.cfg.data_root and os.path.isdir(
                self.cfg.data_root):
            # on-disk paired image/mask dataset (reference LaneDataset,
            # README.md:1996-2030)
            from lanetpu.train.data import resolve_datasets

            self.train_ds, self.val_ds = resolve_datasets(
                self.cfg.data_root, tuple(self.cfg.image_size))
        else:
            self.train_ds = SyntheticLaneDataset(
                self.cfg.num_train, seed=self.cfg.seed,
                image_size=tuple(self.cfg.image_size))
            self.val_ds = SyntheticLaneDataset(
                self.cfg.num_val, seed=self.cfg.seed + 1,
                image_size=tuple(self.cfg.image_size),
                offset=self.cfg.num_train)
            self.real_pool_used = 0
            if self.cfg.real_pool > 0:
                from lanetpu.eval.real import assets_present
                from lanetpu.train.realpool import (MixedDataset,
                                                    RealCropLaneDataset)

                if assets_present():
                    self.train_ds = MixedDataset(
                        self.train_ds,
                        RealCropLaneDataset(self.cfg.real_pool,
                                            seed=self.cfg.seed + 7,
                                            image_size=tuple(
                                                self.cfg.image_size),
                                            white_thr=self.cfg.real_pool_thr))
                    self.real_pool_used = self.cfg.real_pool
                else:
                    # the run would otherwise silently train synthetic-only
                    # while its recorded recipe claims a real pool
                    import logging

                    logging.getLogger("lanetpu").warning(
                        "real_pool=%d requested but reference demo assets "
                        "are not mounted — training synthetic-only "
                        "(real_pool_used=0 recorded in checkpoint meta)",
                        self.cfg.real_pool)

        steps_per_epoch = max(1, len(self.train_ds) // self.cfg.batch_size)
        self.steps_per_epoch = steps_per_epoch
        self.state: TrainState = create_train_state(
            self.module, jax.random.PRNGKey(self.cfg.seed), self.cfg,
            steps_per_epoch)
        if self.cfg.init_checkpoint:
            # warm start (continuation training): take params/batch_stats
            # from the checkpoint, keep a fresh optimizer/schedule
            from lanetpu.runtime.engine import load_checkpoint

            _, variables = load_checkpoint(self.cfg.init_checkpoint)
            self.state = self.state.replace(
                params=variables["params"],
                batch_stats=variables.get("batch_stats",
                                          self.state.batch_stats))
        self._teacher_vars = None
        if self.cfg.distill_checkpoint:
            from lanetpu.quant.fold import fold_unet_batchnorm
            from lanetpu.quant.functional_unet import unet_forward_folded
            from lanetpu.runtime.engine import load_checkpoint
            from lanetpu.train.steps import make_distill_train_step

            meta_t, vars_t = load_checkpoint(self.cfg.distill_checkpoint)
            feats_t = tuple(meta_t["features"])
            s2d_t = int(meta_t.get("s2d", 1))
            sig_t = bool(meta_t.get("final_sigmoid", False))
            folded = (fold_unet_batchnorm(vars_t, feats_t)
                      if "batch_stats" in vars_t else vars_t)

            def teacher_fn(tv, x):
                out = unet_forward_folded(tv, x, feats_t,
                                          final_sigmoid=sig_t, s2d=s2d_t)
                p = out[..., 0].astype(jnp.float32)
                return p if sig_t else jax.nn.sigmoid(p)

            self._teacher_vars = jax.device_put(folded, self.device)
            self._train_step = jax.jit(
                make_distill_train_step(self.cfg, teacher_fn))
        else:
            self._train_step = jax.jit(make_train_step(self.cfg))
        self._eval_step = jax.jit(make_eval_step(self.cfg))
        self.history: list[dict] = []

    # ------------------------------------------------------------------

    def train_epoch(self, epoch: int, rng: np.random.Generator) -> dict:
        key = jax.random.PRNGKey(self.cfg.seed * 1000 + epoch)
        metrics_acc = []
        batches = self.train_ds.batches(self.cfg.batch_size, shuffle=True,
                                        rng=rng)
        for i, (imgs, masks) in enumerate(_prefetch(batches, self.device)):
            key, sub = jax.random.split(key)
            x, y = augment_batch(imgs, masks, sub)
            if self._teacher_vars is not None:
                self.state, metrics = self._train_step(
                    self.state, self._teacher_vars, x, y)
            else:
                self.state, metrics = self._train_step(self.state, x, y)
            metrics_acc.append(metrics)
        stacked = {k: float(np.mean([float(m[k]) for m in metrics_acc]))
                   for k in metrics_acc[0]}
        return stacked

    def validate(self) -> dict:
        metrics_acc = []
        batches = self.val_ds.batches(self.cfg.batch_size, shuffle=False,
                                      drop_last=False)
        for imgs, masks in _prefetch(batches, self.device):
            x, y = preprocess_eval_batch(imgs, masks)
            metrics_acc.append(self._eval_step(self.state, x, y))
        return {k: float(np.mean([float(m[k]) for m in metrics_acc]))
                for k in metrics_acc[0]}

    # ------------------------------------------------------------------

    def _checkpoint_meta(self) -> dict:
        mcfg = self.module.config
        meta = {
            "arch": "unet",
            "in_channels": mcfg.in_channels,
            "out_channels": mcfg.out_channels,
            "features": list(mcfg.features),
            "final_sigmoid": mcfg.final_sigmoid,
            "s2d": mcfg.s2d,
        }
        if self.cfg.real_pool > 0:
            meta["real_pool_used"] = getattr(self, "real_pool_used", 0)
            meta["real_pool_thr"] = self.cfg.real_pool_thr
        if self.cfg.distill_checkpoint:
            meta["distilled_from"] = self.cfg.distill_checkpoint
        return meta

    def save(self, path: str, extra: dict | None = None):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        variables = {"params": self.state.params}
        if self.state.batch_stats:
            variables["batch_stats"] = self.state.batch_stats
        meta = self._checkpoint_meta()
        if extra:
            meta.update(extra)
        save_checkpoint(path, variables, meta)

    def warmup(self, verbose: bool = True):
        """Compile the train + eval steps on one tiny-but-real batch BEFORE
        the epoch loop, with prints on both sides — on remote/tunneled
        backends the first train-step compile can take many minutes of
        local silence, which is otherwise indistinguishable from a hung
        client (round-3 lesson: a legitimate compile was killed as a
        'wedge' twice)."""
        import time as _t

        batches = self.train_ds.batches(self.cfg.batch_size, shuffle=False)
        imgs, masks = next(iter(batches))
        # exact same preprocessing as train_epoch so the program is the one
        # the epoch loop will reuse (a different shape/dtype would compile
        # a second, wasted program)
        x, y = augment_batch(imgs, masks, jax.random.PRNGKey(0))
        if verbose:
            print("compiling train step (first call; minutes-long remote "
                  "compiles are normal here)...", flush=True)
        t0 = _t.perf_counter()
        if self._teacher_vars is not None:
            state, _ = self._train_step(self.state, self._teacher_vars, x, y)
        else:
            state, _ = self._train_step(self.state, x, y)
        np.asarray(jax.tree_util.tree_leaves(state.params)[0][..., :1])
        if verbose:
            print(f"train step compiled in {_t.perf_counter() - t0:.1f}s",
                  flush=True)

    def fit(self, epochs: int | None = None, verbose: bool = True) -> dict:
        """Run the full loop. Returns {best_dice, best_epoch, history}."""
        cfg = self.cfg
        epochs = epochs or cfg.epochs
        rng = np.random.default_rng(cfg.seed)
        best_dice, best_epoch, since_best = -1.0, -1, 0
        tb = None
        if cfg.tensorboard_dir:
            from lanetpu.utils.tbwriter import TBWriter

            tb = TBWriter(cfg.tensorboard_dir)
        self.warmup(verbose)

        for epoch in range(epochs):
            t0 = time.time()
            train_m = self.train_epoch(epoch, rng)
            val_m = self.validate()
            dt = time.time() - t0
            record = {"epoch": epoch, "time_s": round(dt, 2),
                      **{f"train_{k}": v for k, v in train_m.items()},
                      **{f"val_{k}": v for k, v in val_m.items()}}
            self.history.append(record)
            if tb is not None:
                tb.add_scalars(
                    {f"train/{k}": v for k, v in train_m.items()}
                    | {f"val/{k}": v for k, v in val_m.items()}, epoch)
                tb.flush()
            if verbose:
                print(f"epoch {epoch}: train loss {train_m['loss']:.4f} "
                      f"dice {train_m['dice']:.4f} | val loss "
                      f"{val_m['loss']:.4f} dice {val_m['dice']:.4f} "
                      f"({dt:.1f}s)")

            improved = val_m["dice"] > best_dice + cfg.min_delta
            if improved:
                best_dice, best_epoch, since_best = val_m["dice"], epoch, 0
                if cfg.save_dir:
                    self.save(os.path.join(cfg.save_dir, "best_model.ltpu"),
                              {"val_dice": best_dice, "epoch": epoch})
            else:
                since_best += 1

            if cfg.save_dir and (epoch + 1) % cfg.save_every_n_epochs == 0:
                self.save(os.path.join(cfg.save_dir,
                                       f"checkpoint_epoch_{epoch + 1}.ltpu"),
                          {"epoch": epoch})

            if cfg.early_stopping and since_best >= cfg.patience:
                if verbose:
                    print(f"early stop at epoch {epoch} "
                          f"(best dice {best_dice:.4f} @ {best_epoch})")
                break

        if tb is not None:
            tb.close()
        if cfg.save_dir:
            self.save(os.path.join(cfg.save_dir, "last_model.ltpu"),
                      {"epoch": epoch})
            with open(os.path.join(cfg.save_dir, "history.json"), "w") as f:
                json.dump(self.history, f, indent=2)
        return {"best_dice": best_dice, "best_epoch": best_epoch,
                "history": self.history}
