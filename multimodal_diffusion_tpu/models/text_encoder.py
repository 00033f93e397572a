"""Byte-level text encoder (CLIP-role conditioning tower).

BASELINE.json config #2 calls for "VAE latents + CLIP conditioning".  This
environment has no network access for pretrained CLIP weights, so the
conditioning tower is a from-scratch byte-level transformer with the same
interface (token embeddings [B, L, d] + pooled embedding [B, d]); swap in
real CLIP weights later by matching this module's output contract.

Reuses the MMDiT encoder stack — one transformer implementation serves the
denoiser, the text tower, and the pixel DiT.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .mmdit import MMDiT, MMDiTConfig

PAD_ID = 256
BOS_ID = 257
EOS_ID = 258
VOCAB = 259


def tokenize_text(texts: Sequence[str], max_len: int = 77) -> np.ndarray:
    """UTF-8 bytes + BOS/EOS, padded/truncated to max_len: [B, max_len] int32."""
    out = np.full((len(texts), max_len), PAD_ID, np.int32)
    for i, t in enumerate(texts):
        ids = [BOS_ID] + list(t.encode("utf-8"))[: max_len - 2] + [EOS_ID]
        out[i, : len(ids)] = ids
    return out


@dataclasses.dataclass(frozen=True)
class TextEncoderConfig:
    width: int = 256
    max_len: int = 77
    core: MMDiTConfig = dataclasses.field(
        default_factory=lambda: MMDiTConfig(
            d_model=256, n_layers=4, n_heads=4, mlp_ratio=4.0, dropout=0.0
        )
    )
    dtype: Any = jnp.float32


class TextEncoder(nn.Module):
    cfg: TextEncoderConfig

    @nn.compact
    def __call__(self, ids: jnp.ndarray,
                 deterministic: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """ids: [B, L] int32 -> (token_embs [B, L, d], pooled [B, d]).

        Pooled = mean over non-pad positions (pad positions are also masked
        out of attention via key_padding_mask)."""
        c = self.cfg
        emb = nn.Embed(VOCAB, c.width, dtype=c.dtype,
                       param_dtype=jnp.float32,
                       embedding_init=nn.initializers.normal(0.02))(ids)
        pos = self.param("pos", nn.initializers.normal(0.02),
                         (c.max_len, c.width), jnp.float32)
        L = ids.shape[1]
        h = emb + pos[:L].astype(emb.dtype)[None]
        pad_mask = ids == PAD_ID  # True = PAD
        h = MMDiT(c.core, name="core")(h, pad_mask, deterministic)
        keep = (~pad_mask).astype(jnp.float32)[..., None]
        pooled = jnp.sum(h.astype(jnp.float32) * keep, axis=1) / jnp.clip(
            jnp.sum(keep, axis=1), 1.0, None
        )
        return h, pooled.astype(h.dtype)
