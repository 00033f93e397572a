#!/usr/bin/env python3
"""Port a reference (PyTorch) checkpoint into this framework's param tree.

The reference trainer saves {step, core, head, adapt_v, adapt_a, vid_vae,
aud_codec, opt, ema} state_dicts (reference trainer.py:407-423).  This tool
maps every tensor into the flax parameter tree used here, so models trained
with the PyTorch reference sample unchanged on TPU:

    python tools/port_reference_checkpoint.py \
        --ckpt runs/av_mvp/checkpoints/av_mvp_latest.pt \
        --config configs/mvp.yaml --out runs/ported/ckpt [--ema]

Weight-layout rules (torch -> flax):
    Linear   [out, in]             -> kernel [in, out] (transpose)
    Conv1d   [out, in, k]          -> kernel [k, in, out]
    Conv3d   [out, in, kt, kh, kw] -> kernel [kt, kh, kw, in, out]
    MultiheadAttention in_proj [3d, d] -> fused qkv kernel [d, 3d]
    LayerNorm/GroupNorm weight/bias -> scale/bias
Our extra embedding tables (modality + positional, absent upstream) are
zeroed so they are exact no-ops for ported checkpoints.

Numerical equivalence of the ported forward pass is proven in
tests/test_reference_port.py (exact GELU + torch-default norm epsilons are
used everywhere for this reason).
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path
from typing import Any, Dict

import numpy as np

# porting is pure host work (torch -> numpy -> orbax); never let jax touch
# the (possibly busy/tunneled) TPU for it.  sitecustomize pre-imports jax
# with the env latched, so the env var alone is not enough (tests/conftest
# has the same note) — set the config as well, before first backend use.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


# ---------------------------------------------------------------------------
# pure numpy mapping (no torch needed once tensors are numpy)
# ---------------------------------------------------------------------------


def _lin(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _conv(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    w = sd[f"{prefix}.weight"]
    # torch [out, in, *k] -> flax [*k, in, out]
    axes = tuple(range(2, w.ndim)) + (1, 0)
    out = {"kernel": np.ascontiguousarray(np.transpose(w, axes))}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _norm(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _rms(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": sd[f"{prefix}.scale"]}


def port_core(sd: Dict[str, np.ndarray], n_layers: int,
              norm: str = "rmsnorm") -> Dict[str, Any]:
    """Reference MMDiT state_dict -> our core param subtree."""
    norm_name = "RMSNorm" if norm.lower() == "rmsnorm" else "LayerNorm"
    norm_map = _rms if norm.lower() == "rmsnorm" else _norm
    core: Dict[str, Any] = {}
    for i in range(n_layers):
        blk = f"blocks.{i}"
        in_w = sd[f"{blk}.attn.mha.in_proj_weight"]  # [3d, d]
        qkv = {"kernel": np.ascontiguousarray(in_w.T)}
        if f"{blk}.attn.mha.in_proj_bias" in sd:
            qkv["bias"] = sd[f"{blk}.attn.mha.in_proj_bias"]
        core[f"block_{i}"] = {
            f"{norm_name}_0": norm_map(sd, f"{blk}.norm1"),
            f"{norm_name}_1": norm_map(sd, f"{blk}.norm2"),
            "attn": {
                "qkv": qkv,
                "out": _lin(sd, f"{blk}.attn.mha.out_proj"),
            },
            "mlp": {
                "fc1": _lin(sd, f"{blk}.mlp.fc1"),
                "fc2": _lin(sd, f"{blk}.mlp.fc2"),
            },
        }
    core[f"{norm_name}_0"] = norm_map(sd, "final_norm")
    return core


def port_head(sd: Dict[str, np.ndarray], num_shared_layers: int = 2,
              modalities=("video", "audio")) -> Dict[str, Any]:
    """Reference MultiModalNoiseHead state_dict -> our head subtree.

    Reference blocks are Sequential(Linear, LayerNorm, act, Dropout), so
    torch keys are shared.{i}.0.* (Linear) and shared.{i}.1.* (LayerNorm)."""
    head: Dict[str, Any] = {}
    for m in modalities:
        head[f"input_proj_{m}"] = _lin(sd, f"input_proj.{m}")
        head[f"out_proj_{m}"] = _lin(sd, f"out_proj.{m}")
    for i in range(num_shared_layers):
        head[f"shared_{i}"] = {
            "dense": _lin(sd, f"shared.{i}.0"),
            "LayerNorm_0": _norm(sd, f"shared.{i}.1"),
        }
    return head


def port_adapter(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    return {"proj": _lin(sd, "proj")}


def port_vid_vae(sd: Dict[str, np.ndarray], enc_blocks: int = 2,
                 dec_blocks: int = 2, variational: bool = False) -> Dict[str, Any]:
    """Reference VideoVAE state_dict -> our vid_vae subtree.

    Reference blocks are Sequential(Conv3d, GELU, GroupNorm): keys
    enc_net.{i}.0.* (conv) and enc_net.{i}.2.* (GroupNorm)."""
    vae: Dict[str, Any] = {}
    for i in range(enc_blocks):
        vae[f"enc_{i}"] = {
            "Conv_0": _conv(sd, f"enc_net.{i}.0"),
            "GroupNorm_0": _norm(sd, f"enc_net.{i}.2"),
        }
    for i in range(dec_blocks):
        vae[f"dec_{i}"] = {
            "Conv_0": _conv(sd, f"dec_net.{i}.0"),
            "GroupNorm_0": _norm(sd, f"dec_net.{i}.2"),
        }
    if variational:
        vae["to_mu"] = _conv(sd, "to_mu")
        vae["to_logv"] = _conv(sd, "to_logv")
    else:
        vae["to_lat"] = _conv(sd, "to_lat")
    vae["from_lat"] = _conv(sd, "from_lat")
    vae["to_img"] = _conv(sd, "to_img")
    return vae


def port_aud_codec(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference AudioCodec state_dict -> our aud_codec subtree.

    Reference `pre` is Sequential of two _conv1d_block (each Sequential
    (Conv1d, GELU)) -> pre.{0,1}.0.*; `smooth` is Sequential(Conv, GELU,
    Conv, GELU, Conv) -> smooth.{0,2,4}.*."""
    return {
        "pre0": _conv(sd, "pre.0.0"),
        "pre1": _conv(sd, "pre.1.0"),
        "to_lat": _conv(sd, "to_lat"),
        "from_lat": _conv(sd, "from_lat"),
        "smooth0": _conv(sd, "smooth.0"),
        "smooth1": _conv(sd, "smooth.2"),
        "smooth2": _conv(sd, "smooth.4"),
    }


def zero_embed_subtree(template_embed: Dict[str, Any]) -> Dict[str, Any]:
    """Zero our modality/positional tables (absent upstream) -> exact no-ops."""
    import jax

    return jax.tree_util.tree_map(lambda x: np.zeros_like(np.asarray(x)),
                                  template_embed)


def port_reference_state(
    ref_state: Dict[str, Dict[str, np.ndarray]],
    cfg: Dict,
    template_params: Dict[str, Any],
    use_ema: bool = False,
) -> Dict[str, Any]:
    """Full reference checkpoint dict -> our params tree.

    ref_state: {"core": state_dict, "head": ..., "adapt_v": ..., ...} with
    numpy tensors.  template_params supplies the embed subtree shapes."""
    core_cfg = cfg["model"]["core"]
    core_sd = ref_state["ema"] if (use_ema and "ema" in ref_state) else ref_state["core"]
    video_cfg = cfg["video"]
    enc_blocks = int(video_cfg.get("encoder", {}).get("blocks", 2))
    dec_blocks = int(video_cfg.get("decoder", {}).get("blocks", 2))
    params = {
        "core": port_core(core_sd, int(core_cfg["n_layers"]),
                          str(core_cfg.get("norm", "rmsnorm"))),
        "head": port_head(ref_state["head"]),
        "adapt_v": port_adapter(ref_state["adapt_v"]),
        "adapt_a": port_adapter(ref_state["adapt_a"]),
        "vid_vae": port_vid_vae(ref_state["vid_vae"], enc_blocks, dec_blocks,
                                bool(video_cfg.get("variational", False))),
        "aud_codec": port_aud_codec(ref_state["aud_codec"]),
        "embed": zero_embed_subtree(template_params["embed"]),
    }
    return params


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Port a PyTorch reference checkpoint to this framework."
    )
    ap.add_argument("--ckpt", type=Path, required=True,
                    help="reference .pt checkpoint (trainer.save_checkpoint)")
    ap.add_argument("--config", type=str, nargs="+", required=True)
    ap.add_argument("--out", type=Path, required=True,
                    help="output orbax checkpoint directory")
    ap.add_argument("--ema", action="store_true",
                    help="port the EMA core instead of the live core")
    args = ap.parse_args(argv)

    import torch  # only needed to read the .pt

    import jax
    import jax.numpy as jnp
    from flax.core import meta

    from multimodal_diffusion_tpu.models.diffusion import (
        AVDiffusionConfig, AVDiffusionModel,
    )
    from multimodal_diffusion_tpu.train.checkpoint import CheckpointManager
    from multimodal_diffusion_tpu.train.trainer import minimal_init_shapes
    from multimodal_diffusion_tpu.ops import schedule as S
    from multimodal_diffusion_tpu.utils.io import load_config

    cfg = load_config(*args.config)
    raw = torch.load(args.ckpt, map_location="cpu", weights_only=True)
    ref_state = {
        k: {kk: vv.numpy() for kk, vv in v.items()}
        for k, v in raw.items()
        if isinstance(v, dict) and k != "opt"
    }
    step = int(raw.get("step", 0))

    model = AVDiffusionModel(AVDiffusionConfig.from_config(cfg))
    mini = minimal_init_shapes(cfg)
    _, abar = S.alphas_cumprod_from_betas(
        S.make_beta_schedule(int(cfg["diffusion"]["video"]["steps"])))
    template = meta.unbox(model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros(mini["video"]), jnp.zeros(mini["audio"]),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
        jnp.zeros(mini["z_video"]), jnp.zeros(mini["z_audio"]),
        jnp.asarray(abar), jnp.asarray(abar),
    )["params"])

    params = port_reference_state(ref_state, cfg, template, use_ema=args.ema)

    # shape check against the template
    import jax.tree_util as jtu

    t_shapes = jtu.tree_map(lambda x: np.asarray(x).shape, template)
    p_shapes = jtu.tree_map(lambda x: np.asarray(x).shape, params)
    if t_shapes != p_shapes:
        raise SystemExit("shape mismatch between ported and template params "
                         "(check config matches the checkpoint)")

    mgr = CheckpointManager(args.out)
    mgr.save(step, {"step": step, "params": params, "opt_state": {},
                    "ema_core": {}}, wait=True)
    mgr.close()
    print(f"[ok] ported step {step} -> {args.out}")


if __name__ == "__main__":
    main()
