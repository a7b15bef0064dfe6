"""Metrics logging: JSONL always, stdout summary, wandb when available.

The reference's only observability layer is wandb (A1_train.py:357-372,
328-333); here wandb is optional (absent in hermetic environments) and a
local JSONL stream is the source of truth.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricsLogger:
    def __init__(self, log_dir: str = "results",
                 run_name: Optional[str] = None, use_wandb: bool = False,
                 wandb_project: str = "fill_missings_transformer"):
        os.makedirs(log_dir, exist_ok=True)
        self.run_name = run_name or f"run_{int(time.time())}"
        self.path = os.path.join(log_dir, f"{self.run_name}.metrics.jsonl")
        self._f = open(self.path, "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb
                wandb.init(project=wandb_project, name=self.run_name)
            except Exception:
                self._wandb = None

    def log(self, step: int, **metrics):
        rec = {"step": step, "time": time.time(), **metrics}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_artifact(self, path: str, name: Optional[str] = None):
        """Model-artifact upload on new best (reference A1_train.py:323-326);
        a JSONL pointer always, a wandb Artifact when available."""
        self._f.write(json.dumps({"artifact": path,
                                  "time": time.time()}) + "\n")
        self._f.flush()
        if self._wandb is not None:
            art = self._wandb.Artifact(
                name=name or f"model_{self.run_name}", type="model")
            if os.path.isdir(path):
                art.add_dir(path)
            else:
                art.add_file(path)
            self._wandb.log_artifact(art)

    def close(self):
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()


class Stopwatch:
    """Step-time / throughput meter (frames/sec) for the benchmark path."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self.frames = 0
        self.steps = 0

    def tick(self, frames: int):
        self.frames += frames
        self.steps += 1

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    @property
    def frames_per_sec(self) -> float:
        return self.frames / max(self.elapsed, 1e-9)
