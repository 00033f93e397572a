"""AVDiffusionModel — the joint audio<->video latent diffusion system (Flax).

Composes the full denoiser path used by BOTH training and sampling:

    latents --tokenize--> raw tokens --adapters--> width-d tokens
      (+ modality embedding, + positional embeddings, + timestep embedding)
      --[cfg keep-mask]--> MMDiT core --> per-modality noise heads --> eps

Capability parity: reference trainer hot path (trainer.py:317-363) and
sampler hot path (sample_clip.py:316-389).  The rebuild deliberately fixes
reference defect SURVEY §2.12.2: the reference trainer ADDs a width-d
timestep embedding while its sampler CONCATs a 256-d one, producing
incompatible adapter shapes; here there is exactly ONE convention — the
trainer's ADD — shared by both entry points, so checkpoints round-trip
(verified in tests/test_sampler.py).

Also fixes §2.12.6: `ModalityEmbedding` and positional embeddings from
models/adapters.py are the real hot path (gated by `embeddings.*` config keys
the reference parsed but ignored).

Parameter tree is keyed {vid_vae, aud_codec, adapt_v, adapt_a, core, head,
embed} to preserve the reference checkpoint schema (trainer.py:407-423).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import tokenize as tk
from .adapters import (
    LinearAdapter,
    ModalityEmbedding,
    PositionalEmbedding1D,
    PositionalEmbedding3D,
    TimestepEmbedder,
)
from .audio_codec import AudioCodec, AudioCodecConfig
from .heads import MultiModalNoiseHead
from .mmdit import MMDiT, MMDiTConfig
from .vae_video3d import VideoVAE, VideoVAEConfig


@dataclasses.dataclass(frozen=True)
class AVDiffusionConfig:
    """Derived from the merged YAML tree (same key paths as the reference —
    configs/mvp.yaml; see SURVEY §2.A for the canonical shape ledger)."""

    width: int = 512
    tube: Tuple[int, int, int] = (2, 4, 4)  # (t, h, w)
    chunk: Tuple[int, int] = (4, 4)  # (length, stride)
    vae: VideoVAEConfig = dataclasses.field(default_factory=VideoVAEConfig)
    codec: AudioCodecConfig = dataclasses.field(default_factory=AudioCodecConfig)
    core: MMDiTConfig = dataclasses.field(default_factory=MMDiTConfig)
    head_hidden: int = 512
    head_dropout: float = 0.1
    head_activation: str = "gelu"
    # model.heads.*.num_layers -> shared-trunk depth (was parsed-and-ignored,
    # hardcoded 2; reference noise_heads.py:162-172 configures trunk depth)
    head_num_layers: int = 2
    out_dim_v: int = 256
    out_dim_a: int = 32
    timestep_dim: int = 256  # recorded for config parity; ADD convention uses width
    # embeddings.timestep_embed: "sinusoidal" (parameterless, reference
    # trainer convention) | "mlp" (sinusoidal -> SiLU MLP refinement, the
    # reference's TimestepEmbedder mlp mode, adapters.py:137-158).  Was
    # parsed-and-ignored before; "sinusoidal" keeps the exact old compute
    # and parameter tree.
    timestep_mode: str = "sinusoidal"
    use_modality_embed: bool = True
    posenc_video: str = "learned_3d"  # "learned_3d" | "sin" | "none"
    posenc_audio: str = "learned_1d"  # "learned_1d" | "sin" | "none"
    # prediction parameterization per modality: "eps" (reference convention)
    # | "x0" | "v" — config keys diffusion.{video,audio}.param
    param_v: str = "eps"
    param_a: str = "eps"
    # mouth-crop conditioning stream (conditioning.mouth_crop.*): a second,
    # VAE-free video conditioning path — raw pixels from a fixed mouth-region
    # box are tube-patched directly into extra conditioning tokens
    # (lipreading-grade signal for the silent-video -> speech task).  The
    # tokens are pure conditioning: active only when video is the
    # conditioning modality, zeroed under CFG drop, ignored by the heads.
    mouth_enabled: bool = False
    mouth_box: Tuple[int, int, int, int] = (64, 112, 32, 96)  # h0, h1, w0, w1
    mouth_tube: Tuple[int, int, int] = (2, 8, 8)  # (t, h, w) on PIXELS
    # model.latent_rmsnorm: per-sample RMS normalization of BOTH encoders'
    # latents.  With a jointly-trained autoencoder the encoder can collapse
    # its output scale (measured on the 50k specificity run: z_audio std
    # 0.005) — x0-prediction then becomes trivially accurate, the diffusion
    # SNR drops ~-46 dB at every t, and the denoiser transmits no per-clip
    # information (corr_gen == corr_shuf).  Forcing rms(z)==1 per sample
    # removes the collapse direction entirely; the decoder trains on
    # unit-scale latents, which is exactly what DDIM hands it at sampling
    # time.  Default False = reference semantics / old checkpoints.
    latent_rmsnorm: bool = False
    # model.encoder_stopgrad: stop the DIFFUSION loss's gradient at the
    # encoder outputs, so the encoders train on reconstruction (+alignment)
    # only — the one-run equivalent of two-stage latent-diffusion training
    # (VAE first, denoiser second).  Why: with joint training the denoising
    # objective is minimized by making its own targets predictable, i.e. by
    # collapsing the latents; latent_rmsnorm removes the SCALE collapse
    # direction, but round-3's v2 run showed the encoder then routes the
    # same collapse through a shared-mean direction instead (measured with
    # tools/latent_probe.py: pairwise cosine between different clips' unit-rms
    # latents 0.9997 at 5k steps -> 0.99996 at 20k, per-clip deviation ~0.4%
    # of magnitude = ~-48 dB under the diffusion noise).  Stopping the
    # diffusion gradient removes the incentive entirely: reconstruction is
    # the encoders' only trainer, and recon is only solvable with latents
    # that distinguish clips.  Requires training.recon_loss_weight > 0
    # (validate_config enforces this).  Default False = reference semantics
    # (/root/reference/avdiff/models/train/trainer.py:297-301 backprops the
    # diffusion loss into both encoders — with NO recon loss at all).
    encoder_stopgrad: bool = False
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, cfg: Dict, dtype: Any = jnp.float32,
                    remat: bool = False, mesh: Any = None) -> "AVDiffusionConfig":
        tok = cfg["tokenizer"]
        tube = tok["video"]["tube"]
        chunk = tok["audio"]["chunk"]
        heads = cfg["model"]["heads"]
        emb = cfg.get("embeddings", {})
        posenc = emb.get("posenc", {})
        mouth = (cfg.get("conditioning", {}) or {}).get("mouth_crop", {}) or {}
        mtube = mouth.get("tube", {}) or {}
        # sequence parallelism: `parallel.context > 1` routes the MMDiT
        # through ring attention over the mesh's 'context' axis
        core_extra = {}
        par = cfg.get("parallel", {}) or {}
        n_context = int(par.get("context", 1))
        n_pipe = int(par.get("pipe", 1))
        if n_context > 1:
            if mesh is None or "context" not in getattr(mesh, "axis_names", ()):
                raise ValueError(
                    "parallel.context > 1 requires a mesh with a 'context' "
                    "axis (make_mesh_from_config builds one)"
                )
            core_extra = {"mesh": mesh, "context_axis": "context",
                          "context_flash":
                              bool(par.get("context_flash", False))}
        if n_pipe > 1:
            if n_context > 1:
                raise ValueError(
                    "parallel.pipe and parallel.context cannot be combined")
            if mesh is None or "pipe" not in getattr(mesh, "axis_names", ()):
                raise ValueError(
                    "parallel.pipe > 1 requires a mesh with a 'pipe' axis "
                    "(make_mesh_from_config builds one)"
                )
            core_extra = {
                "mesh": mesh,
                "pipe_axis": "pipe",
                "pipe_microbatches": int(par.get("pipe_microbatches", 4)),
            }
        return cls(
            width=int(tok["width"]),
            tube=(int(tube["t"]), int(tube["h"]), int(tube["w"])),
            chunk=(int(chunk["length"]), int(chunk["stride"])),
            vae=VideoVAEConfig.from_dict(cfg["video"], dtype=dtype),
            codec=AudioCodecConfig.from_dict(cfg["audio"], dtype=dtype),
            core=MMDiTConfig.from_dict(cfg["model"]["core"], dtype=dtype,
                                       remat=remat, **core_extra),
            head_hidden=int(heads["video"]["hidden_dim"]),
            head_num_layers=int(heads["video"].get("num_layers", 2)),
            head_dropout=float(cfg["model"]["core"].get("dropout", 0.1)),
            head_activation=heads["video"].get("activation", "gelu"),
            out_dim_v=int(heads["video"]["out_dim"]),
            out_dim_a=int(heads["audio"]["out_dim"]),
            timestep_dim=int(emb.get("timestep_dim", 256)),
            timestep_mode=str(emb.get("timestep_embed", "sinusoidal")),
            use_modality_embed=bool(emb.get("use_modality_embed", True)),
            posenc_video=str(posenc.get("video", "learned_3d")),
            posenc_audio=str(posenc.get("audio", "learned_1d")),
            param_v=str(cfg["diffusion"]["video"].get("param", "eps")),
            param_a=str(cfg["diffusion"]["audio"].get("param", "eps")),
            mouth_enabled=bool(mouth.get("enabled", False)),
            mouth_box=tuple(int(x) for x in mouth.get(
                "box", (64, 112, 32, 96))),
            mouth_tube=(int(mtube.get("t", 2)), int(mtube.get("h", 8)),
                        int(mtube.get("w", 8))),
            latent_rmsnorm=bool(cfg["model"].get("latent_rmsnorm", False)),
            encoder_stopgrad=bool(cfg["model"].get("encoder_stopgrad", False)),
            dtype=dtype,
        )

    @property
    def token_dim_video(self) -> int:
        t, h, w = self.tube
        return self.vae.lat_ch * t * h * w

    @property
    def token_dim_audio(self) -> int:
        return self.codec.lat_ch * self.chunk[0]

    @property
    def token_dim_mouth(self) -> int:
        t, h, w = self.mouth_tube
        return 3 * t * h * w

    @property
    def mouth_crop_hw(self) -> Tuple[int, int]:
        h0, h1, w0, w1 = self.mouth_box
        return (h1 - h0, w1 - w0)


class _Embeddings(nn.Module):
    """Modality + positional embeddings, grouped under one param key."""

    cfg: AVDiffusionConfig

    def setup(self):
        c = self.cfg
        mods = ("video", "audio", "mouth") if c.mouth_enabled else (
            "video", "audio")
        if c.use_modality_embed:
            self.modality = ModalityEmbedding(c.width, modalities=mods,
                                              dtype=c.dtype)
        if c.posenc_video != "none":
            self.pos_v = PositionalEmbedding3D(
                c.width,
                mode="learned" if c.posenc_video.startswith("learned") else "sin",
                dtype=c.dtype,
            )
        if c.posenc_audio != "none":
            self.pos_a = PositionalEmbedding1D(
                c.width,
                mode="learned" if c.posenc_audio.startswith("learned") else "sin",
                dtype=c.dtype,
            )
        if c.mouth_enabled:
            self.pos_m = PositionalEmbedding3D(
                c.width,
                mode="learned" if c.posenc_video.startswith("learned") else "sin",
                dtype=c.dtype,
            )

    def mouth(self, Xm: jnp.ndarray,
              grid_m: Tuple[int, int, int]) -> jnp.ndarray:
        c = self.cfg
        if c.use_modality_embed:
            Xm = self.modality(Xm, "mouth")
        return Xm + self.pos_m(*grid_m)

    def __call__(
        self, Xv: jnp.ndarray, Xa: jnp.ndarray, video_grid: Tuple[int, int, int]
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        c = self.cfg
        if c.use_modality_embed:
            Xv = self.modality(Xv, "video")
            Xa = self.modality(Xa, "audio")
        if c.posenc_video != "none":
            Xv = Xv + self.pos_v(*video_grid)
        if c.posenc_audio != "none":
            Xa = Xa + self.pos_a(Xa.shape[1])
        return Xv, Xa


class AVDiffusionModel(nn.Module):
    cfg: AVDiffusionConfig

    def setup(self):
        c = self.cfg
        self.vid_vae = VideoVAE(c.vae)
        self.aud_codec = AudioCodec(c.codec)
        self.adapt_v = LinearAdapter(c.width, dtype=c.dtype)
        self.adapt_a = LinearAdapter(c.width, dtype=c.dtype)
        if c.mouth_enabled:
            self.adapt_m = LinearAdapter(c.width, dtype=c.dtype)
        self.embed = _Embeddings(c)
        if c.timestep_mode not in ("sinusoidal", "mlp"):
            raise ValueError(
                f"embeddings.timestep_embed must be sinusoidal|mlp, got "
                f"{c.timestep_mode!r}")
        # parameterless in sinusoidal mode (identical compute + param tree
        # to the old inline timestep_embedding adds)
        self.t_embed = TimestepEmbedder(
            dim=c.width, mode="mlp" if c.timestep_mode == "mlp" else "sin",
            dtype=c.dtype)
        self.core = MMDiT(c.core)
        self.head = MultiModalNoiseHead(
            output_dims={"video": c.out_dim_v, "audio": c.out_dim_a},
            hidden_dim=c.head_hidden,
            num_shared_layers=c.head_num_layers,
            num_modality_specific_layers=1,
            dropout=c.head_dropout,
            activation=c.head_activation,
            dtype=c.dtype,
        )

    # ------------------ codec passthroughs ------------------

    def _latent_norm(self, z: jnp.ndarray) -> jnp.ndarray:
        """Per-sample RMS normalization (cfg.latent_rmsnorm): projects out
        the encoder's scale-collapse direction (see AVDiffusionConfig)."""
        if not self.cfg.latent_rmsnorm:
            return z
        axes = tuple(range(1, z.ndim))
        ms = jnp.mean(jnp.square(z), axis=axes, keepdims=True)
        return z * jax.lax.rsqrt(ms + 1e-8)

    def encode_video(self, x: jnp.ndarray, rng: Optional[jax.Array] = None):
        return self._latent_norm(self.vid_vae.encode(x, rng))

    def decode_video(self, z: jnp.ndarray, out_size=None):
        return self.vid_vae.decode(z, out_size)

    def encode_audio(self, wav: jnp.ndarray):
        return self._latent_norm(self.aud_codec.encode(wav))

    def decode_audio(self, z: jnp.ndarray):
        return self.aud_codec.decode(z)

    # ------------------ tokenization (static shims) ------------------

    def tokenize_video(self, z_v: jnp.ndarray) -> jnp.ndarray:
        t, h, w = self.cfg.tube
        return tk.tube_patch_video(z_v, t, h, w)

    def tokenize_audio(self, z_a: jnp.ndarray) -> jnp.ndarray:
        l, s = self.cfg.chunk
        return tk.audio_tokens_from_latent(z_a, l, s)

    def untokenize_video(self, tok: jnp.ndarray, latent_shape) -> jnp.ndarray:
        t, h, w = self.cfg.tube
        _, C, T, H, W = latent_shape
        return tk.tube_unpatch_video(tok, C, T, H, W, t, h, w)

    def untokenize_audio(self, tok: jnp.ndarray, latent_shape) -> jnp.ndarray:
        l, s = self.cfg.chunk
        _, C, F = latent_shape
        return tk.audio_latent_from_tokens(tok, C, l, F, s)

    def mouth_tokens(self, video: jnp.ndarray) -> jnp.ndarray:
        """Raw pixels [B, 3, T, H, W] -> mouth-crop tokens [B, Nm, Dm].

        Crops cfg.mouth_box from each frame and tube-patches the PIXELS
        (no VAE in this path: the spatial bottleneck that costs the main
        stream its lip detail is exactly what this stream exists to avoid).
        Pixel values are shifted to [-0.5, 0.5] so zero = CFG-dropped."""
        c = self.cfg
        h0, h1, w0, w1 = c.mouth_box
        crop = video[:, :, :, h0:h1, w0:w1] - 0.5
        t, h, w = c.mouth_tube
        return tk.tube_patch_video(crop, t, h, w)

    def mouth_grid(self, T: int) -> Tuple[int, int, int]:
        c = self.cfg
        t, h, w = c.mouth_tube
        ch, cw = c.mouth_crop_hw
        return (T // t, ch // h, cw // w)

    # ------------------ denoiser ------------------

    def embed_tokens(
        self,
        tok_v: jnp.ndarray,  # [B, Nv, Dv] raw video tokens
        tok_a: jnp.ndarray,  # [B, Na, Da] raw audio tokens
        t_v: jnp.ndarray,  # [B] int timesteps
        t_a: jnp.ndarray,  # [B]
        video_grid: Tuple[int, int, int],
        keep_v: Optional[jnp.ndarray] = None,  # [B] 0/1 CFG keep multipliers
        keep_a: Optional[jnp.ndarray] = None,
        tok_m: Optional[jnp.ndarray] = None,  # [B, Nm, Dm] mouth-crop tokens
        keep_m: Optional[jnp.ndarray] = None,
        mouth_grid: Optional[Tuple[int, int, int]] = None,
    ) -> Tuple[jnp.ndarray, int]:
        """Project + embed + timestep-ADD + CFG keep-mask; returns (X, Nv).

        The keep multiplier is applied AFTER all embeddings, matching the
        reference's zeroing of fully-embedded tokens (trainer.py:341-349,
        sample_clip.py:338,377).  Mouth tokens (if the stream is enabled and
        provided) are appended after audio; heads never see them."""
        c = self.cfg
        Xv = self.adapt_v(tok_v)
        Xa = self.adapt_a(tok_a)
        Xv, Xa = self.embed(Xv, Xa, video_grid)
        # ADD width-d timestep embedding (trainer convention,
        # trainer.py:45-49); sinusoidal mode is the parameterless fp32
        # table, mlp mode refines it (embeddings.timestep_embed).
        Xv = Xv + self.t_embed(t_v).astype(Xv.dtype)[:, None, :]
        Xa = Xa + self.t_embed(t_a).astype(Xa.dtype)[:, None, :]
        if keep_v is not None:
            Xv = Xv * keep_v.astype(Xv.dtype)[:, None, None]
        if keep_a is not None:
            Xa = Xa * keep_a.astype(Xa.dtype)[:, None, None]
        parts = [Xv, Xa]
        if tok_m is not None:
            if not c.mouth_enabled:
                raise ValueError("mouth tokens passed but conditioning."
                                 "mouth_crop.enabled is false")
            Xm = self.adapt_m(tok_m)
            Xm = self.embed.mouth(Xm, mouth_grid)
            # clean conditioning: embedded at t=0 like the frozen prompt
            Xm = Xm + self.t_embed(
                jnp.zeros_like(t_v)).astype(Xm.dtype)[:, None, :]
            if keep_m is not None:
                Xm = Xm * keep_m.astype(Xm.dtype)[:, None, None]
            parts.append(Xm)
        return jnp.concatenate(parts, axis=1), Xv.shape[1]

    def denoise_tokens(
        self,
        tok_v: jnp.ndarray,
        tok_a: jnp.ndarray,
        t_v: jnp.ndarray,
        t_a: jnp.ndarray,
        video_grid: Tuple[int, int, int],
        keep_v: Optional[jnp.ndarray] = None,
        keep_a: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        tok_m: Optional[jnp.ndarray] = None,
        keep_m: Optional[jnp.ndarray] = None,
        mouth_grid: Optional[Tuple[int, int, int]] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Full denoiser pass; returns predictions and contextualized features
        {'eps_v', 'eps_a', 'h_v', 'h_a'} (h_* feed the alignment loss).
        eps_* are the model outputs under cfg.param_{v,a} (eps by default).
        Mouth tokens attend in the core but have no head output."""
        X, Nv = self.embed_tokens(tok_v, tok_a, t_v, t_a, video_grid,
                                  keep_v, keep_a, tok_m, keep_m, mouth_grid)
        Na = tok_a.shape[1]
        H = self.core(X, deterministic=deterministic)
        Hv, Ha = H[:, :Nv, :], H[:, Nv : Nv + Na, :]
        eps = self.head({"video": Hv, "audio": Ha}, deterministic=deterministic)
        out = {"eps_v": eps["video"], "eps_a": eps["audio"],
               "h_v": Hv, "h_a": Ha}
        if tok_m is not None:
            # contextualized mouth tokens: 16 Hz-rate features for the
            # fine-grained sync loss (training.sync_loss_source: mouth)
            out["h_m"] = H[:, Nv + Na : Nv + Na + tok_m.shape[1], :]
        return out

    def denoise_latents(
        self,
        z_v: jnp.ndarray,  # [B, Cv, T', H', W'] noised video latent
        z_a: jnp.ndarray,  # [B, Ca, Fa] noised audio latent
        t_v: jnp.ndarray,
        t_a: jnp.ndarray,
        keep_v: Optional[jnp.ndarray] = None,
        keep_a: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """Latent-space wrapper: tokenize -> denoise -> fold eps back to latent
        shapes.  Returns {'eps_v' [lat], 'eps_a' [lat], 'h_v', 'h_a'}."""
        t, h, w = self.cfg.tube
        grid = (z_v.shape[2] // t, z_v.shape[3] // h, z_v.shape[4] // w)
        out = self.denoise_tokens(
            self.tokenize_video(z_v),
            self.tokenize_audio(z_a),
            t_v, t_a, grid, keep_v, keep_a, deterministic,
        )
        return {
            "eps_v": self.untokenize_video(out["eps_v"], z_v.shape),
            "eps_a": self.untokenize_audio(out["eps_a"], z_a.shape),
            "h_v": out["h_v"],
            "h_a": out["h_a"],
        }

    def __call__(
        self,
        video: jnp.ndarray,  # [B, 3, T, H, W]
        audio: jnp.ndarray,  # [B, 1, L]
        t_v: jnp.ndarray,
        t_a: jnp.ndarray,
        noise_v: jnp.ndarray,  # [B, Cv, T', H', W'] (pre-drawn latent noise)
        noise_a: jnp.ndarray,  # [B, Ca, Fa]
        alpha_bar_v: jnp.ndarray,
        alpha_bar_a: jnp.ndarray,
        keep_v: Optional[jnp.ndarray] = None,
        keep_a: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        keep_m: Optional[jnp.ndarray] = None,
        with_recon: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """End-to-end training forward: encode -> q_sample -> denoise.

        `with_recon=True` additionally decodes the CLEAN latents back to
        pixel/waveform space (out['recon_v'/'recon_a']) for the auxiliary
        reconstruction loss — the only gradient path into the decoders.

        Used for module init and by train/trainer.py; returns token-space
        predictions AND token-space targets under cfg.param_{v,a} (the loss
        lives in token space like the reference, trainer.py:317-370).

        If the mouth-crop stream is enabled, tokens are cut from the CLEAN
        input pixels; pass keep_m (normally (1-target_is_video) * keep) so
        the stream is zeroed whenever video is the target (it would leak the
        denoising target) or video conditioning is CFG-dropped."""
        from ..ops.schedule import prediction_target, q_sample

        z_v0 = self.encode_video(video)
        z_a0 = self.encode_audio(audio)
        if self.is_initializing():
            # touch the decoders so init creates the FULL parameter tree
            # (training never decodes, but sampling restores from the same
            # checkpoint schema and needs decoder params present)
            self.decode_video(z_v0)
            self.decode_audio(z_a0)
        # Denoising path: optionally stop-gradded latents (see
        # cfg.encoder_stopgrad) — the recon path below keeps the live z so
        # reconstruction remains the encoders' gradient source.
        z_v0_d, z_a0_d = z_v0, z_a0
        if self.cfg.encoder_stopgrad:
            z_v0_d = jax.lax.stop_gradient(z_v0)
            z_a0_d = jax.lax.stop_gradient(z_a0)
        z_vt, eps_v = q_sample(z_v0_d, t_v, alpha_bar_v, eps=noise_v)
        z_at, eps_a = q_sample(z_a0_d, t_a, alpha_bar_a, eps=noise_a)
        t, h, w = self.cfg.tube
        grid = (z_vt.shape[2] // t, z_vt.shape[3] // h, z_vt.shape[4] // w)
        tok_m = mgrid = None
        if self.cfg.mouth_enabled:
            tok_m = self.mouth_tokens(video)
            # grid from the ACTUAL crop extent (the box clips to the frame,
            # e.g. under the trainer's minimal-shape init)
            h0, h1, w0, w1 = self.cfg.mouth_box
            mt_, mh_, mw_ = self.cfg.mouth_tube
            ch = min(h1, video.shape[3]) - min(h0, video.shape[3])
            cw = min(w1, video.shape[4]) - min(w0, video.shape[4])
            mgrid = (video.shape[2] // mt_, ch // mh_, cw // mw_)
            if keep_m is None:
                keep_m = jnp.zeros((video.shape[0],), jnp.float32)
        out = self.denoise_tokens(
            self.tokenize_video(z_vt),
            self.tokenize_audio(z_at),
            t_v, t_a, grid, keep_v, keep_a, deterministic,
            tok_m=tok_m, keep_m=keep_m, mouth_grid=mgrid,
        )
        out["eps_true_v"] = self.tokenize_video(
            prediction_target(z_v0_d, eps_v, t_v, alpha_bar_v, self.cfg.param_v))
        out["eps_true_a"] = self.tokenize_audio(
            prediction_target(z_a0_d, eps_a, t_a, alpha_bar_a, self.cfg.param_a))
        if with_recon:
            out["recon_v"] = self.decode_video(
                z_v0, out_size=tuple(video.shape[2:]))
            out["recon_a"] = self.decode_audio(z_a0)
        return out
