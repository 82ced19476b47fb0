"""Native checkpointing via Orbax.

Replaces the reference's Lightning ModelCheckpoint + torch pickle
(reference: configs/callbacks/model_checkpoint.yaml — every N epochs,
top-k, save_last; resume via ``trainer.fit(ckpt_path=...)``,
train.py:79).  Stores params + optimizer state + step + the JSON config, so
``load_from_checkpoint``-style re-instantiation works without the pickle's
embedded hyperparameters.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import orbax.checkpoint as ocp

from emojivoice_tpu import config as cfglib


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 10, save_interval_steps: int = 1):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                create=True,
            ),
        )

    def save(self, step: int, state: Any, cfg: Optional[cfglib.RootConfig] = None, force: bool = False):
        """Multiprocess note: call from EVERY process — orbax coordinates
        internally and writes once; a single-process call under
        jax.distributed deadlocks its sync barrier.  The config sidecar is
        written by process 0 only."""
        import jax

        if cfg is not None and jax.process_index() == 0:
            with open(os.path.join(self.directory, "config.json"), "w") as f:
                json.dump(cfglib.to_dict(cfg), f, indent=2)
        self._mgr.save(step, args=ocp.args.StandardSave(state), force=force)
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        """Steps currently retained (max_to_keep pruning applied)."""
        return list(self._mgr.all_steps())

    def restore(self, step: Optional[int] = None, template: Any = None) -> Any:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoints in {self.directory}")
        if template is not None:
            return self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return self._mgr.restore(step)

    def load_config(self) -> cfglib.RootConfig:
        with open(os.path.join(self.directory, "config.json")) as f:
            return cfglib.from_dict(cfglib.RootConfig, json.load(f))

    def close(self):
        self._mgr.close()
