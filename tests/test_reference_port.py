"""Checkpoint-portability proof: weights ported from randomly-initialized
PyTorch reference modules produce numerically equivalent forward passes here
(fp32, exact GELU, torch-default norm epsilons).

Requires /root/reference (skipped elsewhere).  The reference code is only
IMPORTED to generate ground truth — nothing is copied."""

import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference absent")

if REF.exists():
    sys.path.insert(0, str(REF))

import jax
import jax.numpy as jnp

from tools.port_reference_checkpoint import (
    port_adapter, port_aud_codec, port_core, port_head, port_vid_vae,
)

ATOL = 2e-5
RTOL = 1e-4


def _sd(module):
    import torch

    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


@pytest.mark.parametrize("norm", ["rmsnorm", "layernorm"])
def test_mmdit_forward_parity(norm):
    import torch
    from avdiff.models.mmdt import MMDiT as RefMMDiT

    from multimodal_diffusion_tpu.models.mmdit import MMDiT, MMDiTConfig

    torch.manual_seed(0)
    ref = RefMMDiT(d_model=64, n_layers=2, n_heads=4, mlp_ratio=2.0,
                   dropout=0.0, attn_dropout=0.0, norm=norm).eval()
    params = port_core(_sd(ref), n_layers=2, norm=norm)

    x = np.random.default_rng(0).standard_normal((2, 17, 64)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()

    ours = MMDiT(MMDiTConfig(d_model=64, n_layers=2, n_heads=4, mlp_ratio=2.0,
                             dropout=0.0, norm=norm))
    out = ours.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=RTOL, atol=ATOL)


def test_head_forward_parity():
    import torch
    from avdiff.models.heads.noise_heads import MultiModalNoiseHead as RefHead

    from multimodal_diffusion_tpu.models.heads import MultiModalNoiseHead

    torch.manual_seed(1)
    ref = RefHead(input_dims={"video": 64, "audio": 64},
                  output_dims={"video": 16, "audio": 8},
                  hidden_dim=32, num_shared_layers=2,
                  num_modality_specific_layers=1, dropout=0.0).eval()
    params = port_head(_sd(ref))

    rng = np.random.default_rng(1)
    hv = rng.standard_normal((2, 9, 64)).astype(np.float32)
    ha = rng.standard_normal((2, 5, 64)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref({"video": torch.from_numpy(hv),
                       "audio": torch.from_numpy(ha)})

    ours = MultiModalNoiseHead(output_dims={"video": 16, "audio": 8},
                               hidden_dim=32, dropout=0.0)
    out = ours.apply({"params": params},
                     {"video": jnp.asarray(hv), "audio": jnp.asarray(ha)})
    for m in ("video", "audio"):
        np.testing.assert_allclose(np.asarray(out[m]), ref_out[m].numpy(),
                                   rtol=RTOL, atol=ATOL)


def test_video_vae_parity():
    import torch
    from avdiff.models.encoders.vae_video3d import VideoVAE as RefVAE

    from multimodal_diffusion_tpu.models.vae_video3d import (
        VideoVAE, VideoVAEConfig,
    )

    torch.manual_seed(2)
    cfg_dict = {"latent": {"channels": 4, "t_down": 2, "s_down": 4},
                "encoder": {"base": 8, "blocks": 2},
                "decoder": {"base": 8, "blocks": 2}}
    ref = RefVAE.from_config(cfg_dict).eval()
    params = port_vid_vae(_sd(ref), enc_blocks=2, dec_blocks=2)

    x = np.random.default_rng(2).uniform(0, 1, (1, 3, 4, 16, 16)).astype(np.float32)
    with torch.no_grad():
        z_ref = ref.encode(torch.from_numpy(x)).numpy()
        x_ref = ref.decode(torch.from_numpy(z_ref)).numpy()

    ours = VideoVAE(VideoVAEConfig(lat_ch=4, t_down=2, s_down=4, enc_base=8,
                                   dec_base=8, enc_blocks=2, dec_blocks=2))
    z = ours.apply({"params": params}, jnp.asarray(x), method=ours.encode)
    np.testing.assert_allclose(np.asarray(z), z_ref, rtol=RTOL, atol=ATOL)
    x_hat = ours.apply({"params": params}, jnp.asarray(z_ref),
                       method=ours.decode)
    np.testing.assert_allclose(np.asarray(x_hat), x_ref, rtol=RTOL, atol=1e-4)


def test_audio_codec_parity():
    import torch
    from avdiff.models.encoders.audio_codec import AudioCodec as RefCodec

    from multimodal_diffusion_tpu.models.audio_codec import (
        AudioCodec, AudioCodecConfig,
    )

    torch.manual_seed(3)
    cfg_dict = {"sr": 8000,
                "codec": {"hop_samples": 80, "hidden": 16, "smooth_kernel": 7},
                "latent": {"channels": 4, "frames_per_clip": 20}}
    ref = RefCodec.from_config(cfg_dict).eval()
    params = port_aud_codec(_sd(ref))

    wav = np.random.default_rng(3).uniform(-1, 1, (2, 1, 1600)).astype(np.float32)
    with torch.no_grad():
        z_ref = ref.encode(torch.from_numpy(wav)).numpy()
        y_ref = ref.decode(torch.from_numpy(z_ref)).numpy()

    ours = AudioCodec(AudioCodecConfig(lat_ch=4, sr=8000, hop_samples=80,
                                       hidden=16, smooth_kernel=7,
                                       frames_per_clip=20))
    z = ours.apply({"params": params}, jnp.asarray(wav), method=ours.encode)
    np.testing.assert_allclose(np.asarray(z), z_ref, rtol=RTOL, atol=ATOL)
    y = ours.apply({"params": params}, jnp.asarray(z_ref), method=ours.decode)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=RTOL, atol=ATOL)


def test_full_denoise_path_parity():
    """Reference trainer-style forward (adapters -> ADD t-emb -> core ->
    heads, trainer.py:317-363) == our denoise_tokens with zeroed embedding
    tables and ported weights."""
    import torch
    from avdiff.models.heads.noise_heads import MultiModalNoiseHead as RefHead
    from avdiff.models.mmdt import MMDiT as RefMMDiT
    from avdiff.utils import schedule_utils as rsu

    from multimodal_diffusion_tpu.models.diffusion import (
        AVDiffusionConfig, AVDiffusionModel,
    )
    from multimodal_diffusion_tpu.models.mmdit import MMDiTConfig
    from multimodal_diffusion_tpu.models.vae_video3d import VideoVAEConfig
    from multimodal_diffusion_tpu.models.audio_codec import AudioCodecConfig
    from tools.port_reference_checkpoint import zero_embed_subtree

    torch.manual_seed(4)
    d = 64
    Dv, Da = 16, 8  # raw token dims: Cv*t*h*w = 2*2*2*2, Ca*l = 2*4
    ref_core = RefMMDiT(d_model=d, n_layers=2, n_heads=4, mlp_ratio=2.0,
                        dropout=0.0, norm="rmsnorm").eval()
    ref_head = RefHead(input_dims={"video": d, "audio": d},
                       output_dims={"video": Dv, "audio": Da},
                       hidden_dim=32, num_shared_layers=2,
                       num_modality_specific_layers=1, dropout=0.0).eval()
    adapt_v = torch.nn.Linear(Dv, d)
    adapt_a = torch.nn.Linear(Da, d)

    rng = np.random.default_rng(4)
    B, Nv, Na = 2, 6, 5
    tok_v = rng.standard_normal((B, Nv, Dv)).astype(np.float32)
    tok_a = rng.standard_normal((B, Na, Da)).astype(np.float32)
    t_v = np.array([3, 7], np.int64)
    t_a = np.array([9, 1], np.int64)

    # ---- reference forward (the trainer's exact recipe) ----
    with torch.no_grad():
        Xv = adapt_v(torch.from_numpy(tok_v))
        Xa = adapt_a(torch.from_numpy(tok_a))
        Xv = Xv + rsu.timestep_embedding(torch.from_numpy(t_v), d).unsqueeze(1)
        Xa = Xa + rsu.timestep_embedding(torch.from_numpy(t_a), d).unsqueeze(1)
        X = torch.cat([Xv, Xa], dim=1)
        H = ref_core(X)
        eps_ref = ref_head({"video": H[:, :Nv], "audio": H[:, Nv:]})

    # ---- ours with ported weights ----
    mcfg = AVDiffusionConfig(
        width=d, tube=(2, 2, 2), chunk=(4, 4),
        vae=VideoVAEConfig(lat_ch=2, t_down=2, s_down=4, enc_base=8,
                           dec_base=8, enc_blocks=1, dec_blocks=1),
        codec=AudioCodecConfig(lat_ch=2, hidden=8, frames_per_clip=24),
        core=MMDiTConfig(d_model=d, n_layers=2, n_heads=4, mlp_ratio=2.0,
                         dropout=0.0, norm="rmsnorm"),
        head_hidden=32, head_dropout=0.0, out_dim_v=Dv, out_dim_a=Da,
    )
    model = AVDiffusionModel(mcfg)
    template = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(tok_v), jnp.asarray(tok_a),
        jnp.asarray(t_v, jnp.int32), jnp.asarray(t_a, jnp.int32),
        (3, 2, 1),  # video grid with Nv = 6 tokens
        method=model.denoise_tokens,
    )["params"]
    from flax.core import meta

    template = meta.unbox(template)
    params = dict(template)
    params["core"] = port_core(_sd(ref_core), n_layers=2, norm="rmsnorm")
    params["head"] = port_head(_sd(ref_head))
    # reference adapters wrap a Linear as `self.proj` (trainer.py:36-42)
    params["adapt_v"] = port_adapter(
        {f"proj.{k}": v for k, v in _sd(adapt_v).items()})
    params["adapt_a"] = port_adapter(
        {f"proj.{k}": v for k, v in _sd(adapt_a).items()})
    params["embed"] = zero_embed_subtree(template["embed"])

    out = model.apply(
        {"params": params},
        jnp.asarray(tok_v), jnp.asarray(tok_a),
        jnp.asarray(t_v, jnp.int32), jnp.asarray(t_a, jnp.int32),
        (3, 2, 1),
        method=model.denoise_tokens,
    )
    np.testing.assert_allclose(np.asarray(out["eps_v"]),
                               eps_ref["video"].numpy(), rtol=RTOL, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["eps_a"]),
                               eps_ref["audio"].numpy(), rtol=RTOL, atol=1e-4)
