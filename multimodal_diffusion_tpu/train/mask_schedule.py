"""Any->any target selection (parity with reference mask_schedule.py:9-26):
normalized Bernoulli pick of "video" vs "audio" per batch.  Host-side (it
feeds a traced 0/1 scalar into the jitted step)."""

from __future__ import annotations

import random
from typing import Dict


class Any2AnySchedule:
    def __init__(self, probs: Dict[str, float], seed: int | None = None):
        pv = float(probs.get("video", 0.5))
        pa = float(probs.get("audio", 0.5))
        total = pv + pa
        if total <= 0:
            raise ValueError("Sum of probabilities must be > 0")
        self.pv = pv / total
        self.pa = pa / total
        self._rng = random.Random(seed)

    def sample_target(self) -> str:
        return "video" if self._rng.random() < self.pv else "audio"
