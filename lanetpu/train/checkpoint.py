"""Orbax-backed checkpoint/resume for full training state.

Capability parity with the reference's documented checkpointing
(README.md:2204-2232): best-metric checkpoint with epoch + optimizer state,
periodic saves, last-model, and resume — implemented on orbax so sharded
(pjit) training states round-trip with their shardings intact. The
lightweight inference artifact (.ltpu msgpack) remains
`runtime.engine.save_checkpoint`; this module is for *resumable training*.
"""

from __future__ import annotations

import os
import jax
import numpy as np


class TrainCheckpointer:
    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state, extra: dict | None = None,
             wait: bool = True):
        """Save the full TrainState pytree (+ small metadata dict)."""
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
        }
        args = self._ocp.args.Composite(
            state=self._ocp.args.StandardSave(payload),
            meta=self._ocp.args.JsonSave(extra or {}),
        )
        self.manager.save(step, args=args)
        if wait:
            self.manager.wait_until_finished()

    def latest_step(self):
        return self.manager.latest_step()

    def restore(self, state_template, step: int | None = None):
        """Restore into the shape/sharding of `state_template`.

        Returns (state, meta) — state is the template with restored arrays.
        """
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            return None, None
        template = {
            "params": state_template.params,
            "batch_stats": state_template.batch_stats,
            "opt_state": state_template.opt_state,
            "step": np.asarray(state_template.step),
        }
        restored = self.manager.restore(
            step,
            args=self._ocp.args.Composite(
                state=self._ocp.args.StandardRestore(template),
                meta=self._ocp.args.JsonRestore(),
            ),
        )
        payload = restored["state"]
        state = state_template.replace(
            params=payload["params"],
            batch_stats=payload["batch_stats"],
            opt_state=payload["opt_state"],
            step=jax.numpy.asarray(payload["step"]),
        )
        return state, restored["meta"]

    def close(self):
        self.manager.close()
