"""Per-modality diffusion schedule objects.

Parity with reference `avdiff/models/schedules.py:37-109` (ModalitySchedule +
build_schedules_from_config).  Unlike the reference — where this cleaner
layer exists but the trainer/sampler bypass it (SURVEY §2.12.6) — the
wrapper here delegates to exactly the same ops the hot paths use
(ops/schedule), so there is one numerical source of truth either way.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import schedule as S


@dataclasses.dataclass
class ModalitySchedule:
    kind: str
    steps: int
    betas: np.ndarray
    alphas: np.ndarray
    alphas_cumprod: np.ndarray

    @classmethod
    def make(cls, *, kind: str = "cosine", steps: int = 1000,
             min_beta: float = 1e-4, max_beta: float = 2e-2) -> "ModalitySchedule":
        betas = S.make_beta_schedule(steps=steps, kind=kind,
                                     min_beta=min_beta, max_beta=max_beta)
        alphas, abar = S.alphas_cumprod_from_betas(betas)
        return cls(kind=kind, steps=int(steps), betas=betas, alphas=alphas,
                   alphas_cumprod=abar)

    # ---------- forward process ----------

    def q_sample(self, z0, t, noise: Optional[jnp.ndarray] = None,
                 key: Optional[jax.Array] = None):
        return S.q_sample(z0, t, jnp.asarray(self.alphas_cumprod),
                          eps=noise, key=key)

    # ---------- reverse (DDIM) ----------

    def ddim_step(self, z_t, t, t_prev, eps_hat, eta: float = 0.0,
                  noise=None, key=None):
        return S.ddim_step(z_t, t, t_prev, eps_hat,
                           jnp.asarray(self.alphas_cumprod), eta=eta,
                           noise=noise, key=key)

    def make_sampling_schedule(self, steps_sample: int) -> np.ndarray:
        return S.make_sampling_schedule(self.steps, steps_sample)

    def timestep_embedding(self, t, dim: int, max_period: int = 10_000):
        return S.timestep_embedding(t, dim=dim, max_period=max_period)


def build_schedules_from_config(cfg: Dict) -> Dict[str, ModalitySchedule]:
    """{"video": ..., "audio": ...} from the `diffusion:` config block."""
    out = {}
    for mod in ("video", "audio"):
        c = cfg["diffusion"][mod]
        out[mod] = ModalitySchedule.make(
            kind=c.get("schedule", "cosine"),
            steps=int(c.get("steps", 1000)),
            min_beta=float(c.get("min_beta", 1e-4)),
            max_beta=float(c.get("max_beta", 2e-2)),
        )
    return out
