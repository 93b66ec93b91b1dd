"""Metrics logging: JSONL always, wandb when installed and enabled.

The reference logs to wandb on rank 0 (tools/main_ldm.py:120-121,
trainers_ldm_cond.py:959-961); here every host-0 metric lands in
``metrics.jsonl`` in the run dir (machine-readable for dashboards) and is
forwarded to wandb if the package is importable and ``wandb: True``.
Also exposes the jax.profiler trace hook (SURVEY §5: tracing absent in the
reference; wired in from the start here).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


def host_rss_gb() -> float:
    """Resident set size of this process in GB (0.0 if unreadable).

    Leak telemetry: long tunneled-TPU runs showed monotonic host RSS growth
    tied to eval/save cycles (OOM at 130GB after ~3h); logging RSS beside
    every epoch/save makes the growth attributable from metrics.jsonl.
    """
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return round(int(line.split()[1]) / 1024 / 1024, 2)
    except OSError:  # pragma: no cover
        pass
    return 0.0


def trim_host_heap() -> None:
    """Return freed glibc heap pages to the kernel (``malloc_trim(0)``).

    The save/eval cycles device_get multi-GB payloads; glibc keeps the
    freed arenas mapped, which reads as monotonic RSS growth on long
    tunneled-TPU runs (round-2 postmortem: OOM at 130GB host RSS). Calling
    malloc_trim after each save/eval returns those pages. No-op if libc
    is unavailable (non-glibc platforms).
    """
    try:
        import ctypes

        ctypes.CDLL("libc.so.6").malloc_trim(0)
    except OSError:  # pragma: no cover
        pass


class MetricsLogger:
    def __init__(self, run_dir: str, use_wandb: bool = False,
                 project: str = "ldmseg-tpu", name: Optional[str] = None):
        import jax

        self.enabled = jax.process_index() == 0
        self.path = os.path.join(run_dir, "metrics.jsonl")
        self._wandb = None
        if self.enabled and use_wandb:
            try:
                import wandb

                wandb.init(project=project, name=name)
                self._wandb = wandb
            except ImportError:
                print("wandb requested but not installed; JSONL logging only")

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None) -> None:
        if not self.enabled:
            return
        record = {"time": time.time()}
        if step is not None:
            record["step"] = step
        record.update({k: float(v) if hasattr(v, "item") or isinstance(v, (int, float)) else v
                       for k, v in metrics.items()})
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_image(self, name: str, path: str, step: Optional[int] = None) -> None:
        """Forward a visualization written to ``path`` as a wandb image
        panel (reference trainers_ldm_cond.py:1446-1477); the JSONL records
        the file path so offline runs keep an index of the panels."""
        if not self.enabled:
            return
        record = {"time": time.time(), f"image/{name}": path}
        if step is not None:
            record["step"] = step
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self._wandb is not None:
            self._wandb.log({name: self._wandb.Image(path)}, step=step)

    def finish(self):
        if self._wandb is not None:
            self._wandb.finish()


class ProfilerHook:
    """Capture a jax.profiler trace for steps [start, start+steps)."""

    def __init__(self, run_dir: str, start: int = 10, steps: int = 5,
                 enabled: bool = False):
        self.dir = os.path.join(run_dir, "profile")
        self.start = start
        self.stop = start + steps
        self.enabled = enabled
        self._active = False

    def step(self, step_idx: int) -> None:
        if not self.enabled:
            return
        import jax

        if step_idx == self.start and not self._active:
            os.makedirs(self.dir, exist_ok=True)
            jax.profiler.start_trace(self.dir)
            self._active = True
        elif step_idx >= self.stop and self._active:
            jax.profiler.stop_trace()
            self._active = False
            print(f"Profiler trace written to {self.dir}")
