"""Checkpoint / resume (SURVEY.md §5.3-5.4).

The reference used periodic `tf.train.Saver` checkpoints with
restore-on-restart.  Here: orbax `CheckpointManager` with async saves, storing
params, batch stats, optimizer state, step, and a config fingerprint that is
validated on restore (silent hparam drift between runs is a real failure mode
the reference had no guard against)."""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional, Tuple

import orbax.checkpoint as ocp

from sstts.config import Config


class CheckpointManager:
    def __init__(self, cfg: Config, workdir: str | Path):
        self.cfg = cfg
        self.dir = Path(workdir).absolute() / cfg.training.checkpoint_dir
        self.dir.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=cfg.training.keep_checkpoints,
                enable_async_checkpointing=True,
            ),
        )
        fp_path = self.dir / "config.json"
        fingerprint = cfg.fingerprint()
        if fp_path.exists():
            stored = fp_path.read_text()
            if stored != fingerprint:
                raise ValueError(
                    f"checkpoint dir {self.dir} was created with a different "
                    "config; refusing to mix. Delete it or change checkpoint_dir."
                )
        else:
            fp_path.write_text(fingerprint)

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def restore_latest(self, target: Any) -> Tuple[Optional[int], Any]:
        """Returns (step, state) of the newest checkpoint, or (None, target)."""
        step = self._mgr.latest_step()
        if step is None:
            return None, target
        state = self._mgr.restore(step, args=ocp.args.StandardRestore(target))
        return step, state

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
