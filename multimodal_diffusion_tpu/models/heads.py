"""Epsilon-prediction heads (Flax).

Capability parity with the reference `avdiff/models/heads/noise_heads.py`:
  * NoisePredictionHead (noise_heads.py:45-89) — single-modality MLP.
  * MultiModalNoiseHead (noise_heads.py:94-229) — per-modality input
    projection -> optional shared trunk (Dense->LayerNorm->act->Dropout
    blocks) -> optional per-modality trunk -> per-modality output Dense,
    dict-in/dict-out keyed by modality, with a `share_parameters` option.

Heads map contextualized tokens [B, N, d] to per-token epsilon in RAW token
space (video 256 = 8*2*4*4, audio 32 = 8*4 at mvp config; SURVEY §2.A).
Pure Dense stacks — XLA fuses the LN/GELU epilogues into the matmuls, so no
custom kernels are needed here.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any

_ACTS = {
    # exact (erf) GELU == torch nn.GELU default (checkpoint portability)
    "gelu": lambda x: nn.gelu(x, approximate=False),
    "relu": nn.relu,
    "leaky_relu": lambda x: nn.leaky_relu(x, negative_slope=0.1),
}


def _act(name: str):
    name = (name or "gelu").lower()
    if name not in _ACTS:
        raise ValueError(f"Unsupported activation: {name}")
    return _ACTS[name]


def _dense(features: int, name: str, dtype: Dtype) -> nn.Dense:
    return nn.Dense(
        features,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=nn.initializers.xavier_uniform(),
        name=name,
    )


class _TrunkBlock(nn.Module):
    """Dense -> LayerNorm -> act -> Dropout (reference noise_heads.py:136-142)."""

    width: int
    dropout: float
    activation: str
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = _dense(self.width, "dense", self.dtype)(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32)(x)
        x = _act(self.activation)(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class NoisePredictionHead(nn.Module):
    """MLP eps-predictor: [..., input_dim] -> [..., output_dim]."""

    output_dim: int
    hidden_dim: Optional[int] = None
    num_layers: int = 2
    dropout: float = 0.0
    activation: str = "gelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.num_layers <= 1:
            return _dense(self.output_dim, "out", self.dtype)(x)
        hidden = self.hidden_dim or x.shape[-1]
        for i in range(self.num_layers - 1):
            x = _TrunkBlock(
                hidden, self.dropout, self.activation, self.dtype, name=f"block_{i}"
            )(x, deterministic)
        return _dense(self.output_dim, "out", self.dtype)(x)


class MultiModalNoiseHead(nn.Module):
    """Shared + modality-specific eps heads; dict-in / dict-out.

    Any subset of `modalities` may be present in the input dict; absent
    modalities are skipped (reference noise_heads.py:197-199).
    """

    output_dims: Mapping[str, int]  # e.g. {"video": 256, "audio": 32}
    hidden_dim: int = 512
    num_shared_layers: int = 2
    num_modality_specific_layers: int = 1
    dropout: float = 0.1
    activation: str = "gelu"
    share_parameters: bool = False
    modalities: Sequence[str] = ("video", "audio")
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        inputs: Dict[str, Optional[jnp.ndarray]],
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        # Parameters must exist for every configured modality regardless of
        # which ones are present in this call (stable checkpoint schema), so
        # declare all submodules up front.
        in_proj = {
            m: _dense(self.hidden_dim, f"input_proj_{m}", self.dtype)
            for m in self.modalities
        }
        shared = [
            _TrunkBlock(self.hidden_dim, self.dropout, self.activation, self.dtype,
                        name=f"shared_{i}")
            for i in range(max(0, self.num_shared_layers))
        ]
        n_spec_hidden = max(0, self.num_modality_specific_layers - 1)
        if self.share_parameters:
            spec_shared = [
                _TrunkBlock(self.hidden_dim, self.dropout, self.activation,
                            self.dtype, name=f"spec_shared_{i}")
                for i in range(n_spec_hidden)
            ]
            spec = {m: spec_shared for m in self.modalities}
        else:
            spec = {
                m: [
                    _TrunkBlock(self.hidden_dim, self.dropout, self.activation,
                                self.dtype, name=f"spec_{m}_{i}")
                    for i in range(n_spec_hidden)
                ]
                for m in self.modalities
            }
        out_proj = {
            m: _dense(int(self.output_dims[m]), f"out_proj_{m}", self.dtype)
            for m in self.modalities
        }

        outputs: Dict[str, jnp.ndarray] = {}
        for m in self.modalities:
            x = inputs.get(m)
            if x is None:
                continue
            x = in_proj[m](x)
            for blk in shared:
                x = blk(x, deterministic)
            if self.num_modality_specific_layers > 0:
                for blk in spec[m]:
                    x = blk(x, deterministic)
            outputs[m] = out_proj[m](x)
        if not outputs:
            raise ValueError("MultiModalNoiseHead: no modalities present in inputs")
        return outputs
