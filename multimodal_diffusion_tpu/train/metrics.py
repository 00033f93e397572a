"""Metric writers: JSONL always; TensorBoard when available.

The reference logs two scalars to TensorBoard on rank 0
(trainer.py:109-111, 390-394).  We keep those tags (`train/loss_main`,
`train/loss_align`) and add throughput counters, with a dependency-free JSONL
sink as the primary record (SURVEY §5: observability was TB-only upstream).
"""

from __future__ import annotations

import json
import time
from typing import Dict

from ..utils.io import ensure_dir


class MetricWriter:
    def __init__(self, log_dir, use_tensorboard: bool = True):
        self.dir = ensure_dir(log_dir)
        self._jsonl = open(self.dir / "metrics.jsonl", "a", buffering=1)
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=str(self.dir))
            except Exception:
                self._tb = None

    def write(self, step: int, scalars: Dict[str, float]) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in scalars.items():
                tag = k if "/" in k else f"train/{k}"
                self._tb.add_scalar(tag, float(v), int(step))

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
