"""Metrics logging and observability (SURVEY.md §5.5).

The reference logged TensorBoard scalars/images/audio through TF-1 summaries.
Here: structured stdout + an append-only JSONL metrics file (always on), with
TensorBoard event files via `tf.summary` when TensorFlow is importable (it is
in the baked image, but stays a lazy optional dependency)."""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(self, workdir: str | Path, use_tensorboard: bool = True):
        self.workdir = Path(workdir)
        self.workdir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.workdir / "metrics.jsonl", "a", buffering=1)
        self._tb = None
        if use_tensorboard:
            try:
                import tensorflow as tf  # lazy; heavyweight import

                self._tb = tf.summary.create_file_writer(
                    str(self.workdir / "tb")
                )
            except Exception:
                self._tb = None
        self._t0 = time.time()

    def log(self, step: int, metrics: Dict[str, Any], prefix: str = "train") -> None:
        record = {
            "step": int(step),
            "wall_s": round(time.time() - self._t0, 3),
            "prefix": prefix,
        }
        for k, v in metrics.items():
            record[k] = float(v) if hasattr(v, "__float__") else v
        self._jsonl.write(json.dumps(record) + "\n")
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default(step=int(step)):
                for k, v in metrics.items():
                    try:
                        tf.summary.scalar(f"{prefix}/{k}", float(v))
                    except (TypeError, ValueError):
                        pass
        scalars = ", ".join(
            f"{k}={float(v):.4f}" for k, v in metrics.items()
            if hasattr(v, "__float__")
        )
        print(f"[{prefix}] step {step}: {scalars}", flush=True)

    def log_image(self, step: int, tag: str, image) -> None:
        """image: (H, W, C) uint8/float array; TensorBoard only."""
        if self._tb is None:
            return
        import numpy as np
        import tensorflow as tf

        img = np.asarray(image)
        if img.ndim == 3:
            img = img[None]
        with self._tb.as_default(step=int(step)):
            tf.summary.image(tag, img)

    def log_audio(self, step: int, tag: str, wav, sample_rate: int) -> None:
        if self._tb is None:
            return
        import numpy as np
        import tensorflow as tf

        w = np.asarray(wav, dtype=np.float32).reshape(1, -1, 1)
        peak = np.abs(w).max()
        if peak > 1.0:
            w = w / peak
        with self._tb.as_default(step=int(step)):
            tf.summary.audio(tag, w, sample_rate)

    def close(self) -> None:
        self._jsonl.close()
