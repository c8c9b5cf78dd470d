"""Checkpoint/resume via orbax.

TPU-native replacement for Lightning's ModelCheckpoint
(/root/reference/train.py:67-74): saves the full TrainState (step, params,
optimizer state) and restores it for crash-resume. Unlike the reference —
whose monitored metric is never logged, so only `last.ckpt` ever matters —
this manager actually tracks the latest step and can retain periodic copies.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 1,
                 keep_every_n_steps: Optional[int] = None):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        opts = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            keep_period=keep_every_n_steps or None,
            create=True)
        self._mgr = ocp.CheckpointManager(self._dir, options=opts)

    @property
    def directory(self) -> str:
        return self._dir

    def save(self, step: int, state: Any, wait: bool = False) -> None:
        self._mgr.save(int(step), args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure/shardings of `template`."""
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self._dir}")
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
