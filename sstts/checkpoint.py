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
        """Returns (step, state) of the newest checkpoint, or (None, target).

        The optional `ema_params` tree (training.ema_decay) is adapted in
        both directions when the stored tree and the target disagree:
        an EMA-enabled target reading a pre-EMA checkpoint restores
        without EMA and seeds `ema_params` from the restored params
        (standard Polyak warm start); an EMA-less target reading an EMA
        checkpoint restores the stored EMA tree and keeps it on the state
        (so `inference.use_ema` works without the serving config knowing
        how the run was trained).  Any other tree mismatch re-raises.
        """
        step = self._mgr.latest_step()
        if step is None:
            return None, target
        if hasattr(target, "ema_params") and hasattr(target, "replace"):
            import jax

            stored = self._stored_ema_kind(step)
            want = target.ema_params is not None
            if stored == "absent":
                # Checkpoint written before the TrainState had the field:
                # orbax requires tree congruence, so restore through a
                # dict template without it and rebuild the state.
                d = {
                    "step": target.step,
                    "params": target.params,
                    "batch_stats": target.batch_stats,
                    "opt_state": target.opt_state,
                }
                got = self._mgr.restore(
                    step, args=ocp.args.StandardRestore(d)
                )
                return step, target.replace(
                    **got,
                    ema_params=(
                        jax.tree.map(lambda p: p, got["params"])
                        if want
                        else None
                    ),
                )
            if stored == "none" and want:
                # EMA run resuming a non-EMA checkpoint: restore without
                # the EMA leaves, then seed EMA at the restored params.
                alt = target.replace(ema_params=None)
                state = self._mgr.restore(
                    step, args=ocp.args.StandardRestore(alt)
                )
                return step, state.replace(
                    ema_params=jax.tree.map(lambda p: p, state.params)
                )
            if stored == "tree" and not want:
                # EMA-less target reading an EMA checkpoint: extend the
                # template with params-shaped leaves and keep the restored
                # EMA available to the caller (inference.use_ema).
                alt = target.replace(
                    ema_params=jax.tree.map(lambda p: p, target.params)
                )
                return step, self._mgr.restore(
                    step, args=ocp.args.StandardRestore(alt)
                )
        state = self._mgr.restore(step, args=ocp.args.StandardRestore(target))
        return step, state

    def stored_has_ema(self, step: Optional[int] = None) -> bool:
        """Whether the stored checkpoint carries a real `ema_params` tree
        (read from the on-disk pytree metadata — no restore needed)."""
        return self._stored_ema_kind(step) == "tree"

    def _stored_ema_kind(self, step: Optional[int] = None) -> str:
        """'absent' (pre-field checkpoint), 'none' (saved with EMA off —
        orbax records an explicit None entry), 'tree' (real EMA leaves),
        or 'unknown' (metadata unreadable — caller restores plainly)."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            return "unknown"
        meta = self.dir / str(step) / "default" / "_METADATA"
        try:
            tree = json.loads(meta.read_text()).get("tree_metadata", {})
        except (OSError, ValueError):
            return "unknown"
        if not isinstance(tree, dict):
            return "unknown"
        for k, v in tree.items():
            if k == "('ema_params',)":
                vt = (v or {}).get("value_metadata", {}).get("value_type")
                return "none" if vt == "None" else "tree"
            if k.startswith("('ema_params',"):
                return "tree"
        return "absent"

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
