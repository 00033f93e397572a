"""AVTrainer — joint A<->V diffusion training, TPU-native.

Capability parity with the reference `avdiff/models/train/trainer.py`
(AVTrainer: trainer.py:88-423): any->any target schedule, per-modality cosine
DDPM noising, CFG condition-drop, eps-MSE on the target modality, optional
alignment loss, AdamW + global-norm clip, EMA of the core, periodic scalar
logging and checkpointing with a "latest" pointer.

TPU-native redesign (SURVEY §7):
  * ONE jitted train step containing encode -> q_sample -> denoise -> loss ->
    grad -> optimizer -> EMA; the only host work per step is feeding the
    batch.  RNG lives in the TrainState and is split on device.
  * DDP/NCCL is replaced by a ('data','model') Mesh: the batch is sharded
    over 'data' and XLA emits the gradient all-reduce over ICI
    (reference trainer.py:206-211 -> parallel/mesh.py).
  * bf16 compute / fp32 params via the model dtype — no GradScaler
    (reference trainer.py:102-103 is CUDA-AMP specific).
  * grad accumulation is implemented (optax.MultiSteps); the reference only
    parsed `grad_accum_steps` (SURVEY §2.12.5).
  * warmup+cosine LR schedule is implemented (reference parsed-only).
  * the loss honors has_video/has_audio validity masks (fixes §2.12.8).
  * checkpoints carry {params, opt_state, ema, step} and a real resume path
    (the reference had none, SURVEY §5).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import meta

from ..models.diffusion import AVDiffusionConfig, AVDiffusionModel
from ..ops import schedule as S
from ..parallel.mesh import make_mesh_from_config
from ..parallel.sharding import infer_param_shardings, replicated, shard_batch
from .losses import (alignment_loss, mse_targets_only,
                     reconstruction_loss, sync_contrastive_loss)
from .mask_schedule import Any2AnySchedule


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray  # int32 scalar
    params: Any
    opt_state: Any
    ema_core: Any  # EMA shadow of params['core'] (reference EMA scope,
    # trainer.py:158 — core only)
    rng: jax.Array


@dataclasses.dataclass
class TrainerBundle:
    """Everything the CLI needs: model, mesh, state, jitted step."""

    model: AVDiffusionModel
    mesh: Any
    state: TrainState
    train_step: Any
    tx: optax.GradientTransformation
    latent_shapes: Dict[str, Tuple[int, ...]]
    abar_v: jnp.ndarray
    abar_a: jnp.ndarray
    eval_step: Any = None
    # recon-free variant of train_step, present iff training.recon_every > 1:
    # the recon VAE decode (~8.7 ms of the 91 ms d=1024/16L step) runs only
    # every K-th step; run_training alternates host-side (two compiled
    # executables, no lax.cond branch bloat in one program)
    train_step_norecon: Any = None


# ---------------------------------------------------------------------------
# construction helpers
# ---------------------------------------------------------------------------


def compute_dtype_from_config(cfg: Dict):
    mp = str(cfg.get("mixed_precision", "fp32")).lower()
    if mp in {"bf16", "bfloat16"}:
        return jnp.bfloat16
    if mp in {"fp16", "float16"}:
        # TPUs prefer bf16; honor the request but bf16 is the native type
        return jnp.bfloat16
    return jnp.float32


def make_lr_schedule(cfg: Dict) -> optax.Schedule:
    opt = cfg["training"]["optimizer"]
    sched = cfg["training"].get("scheduler", {}) or {}
    lr = float(opt["lr"])
    if str(sched.get("name", "none")).lower() == "cosine":
        warmup = int(sched.get("warmup_steps", 0))
        total = int(cfg["training"].get("max_steps", 100_000))
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=lr,
            warmup_steps=max(1, warmup),
            decay_steps=max(total, warmup + 1),
            end_value=0.0,
        )
    return optax.constant_schedule(lr)


def _scale_by_adam_mv(b1: float, b2: float, eps: float, mv_dtype):
    """Adam moment scaling with BOTH moments stored in `mv_dtype` (bf16
    halves optimizer-state HBM traffic — the d=1024/16L step decomposition
    priced the Adam m/v read+write at ~8 ms of a 91 ms step).  All
    arithmetic is fp32 (accumulate-then-round: the bf16 rounding happens
    once per step on the STORED state, never inside the update math);
    master params stay fp32.  optax.adamw's `mu_dtype` covers only the
    first moment, so this is hand-rolled on optax.ScaleByAdamState."""

    def init(params):
        z = lambda p: jnp.zeros(jnp.shape(p), mv_dtype)  # noqa: E731
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(z, params),
            nu=jax.tree_util.tree_map(z, params),
        )

    def update(updates, state, params=None):
        del params
        f32 = jnp.float32
        mu = jax.tree_util.tree_map(
            lambda g, m: (b1 * m.astype(f32)
                          + (1.0 - b1) * g.astype(f32)).astype(mv_dtype),
            updates, state.mu)
        nu = jax.tree_util.tree_map(
            lambda g, v: (b2 * v.astype(f32)
                          + (1.0 - b2) * jnp.square(g.astype(f32))
                          ).astype(mv_dtype),
            updates, state.nu)
        count = optax.safe_int32_increment(state.count)
        bc1 = 1.0 - b1 ** count.astype(f32)
        bc2 = 1.0 - b2 ** count.astype(f32)
        out = jax.tree_util.tree_map(
            lambda m, v: (m.astype(f32) / bc1)
            / (jnp.sqrt(v.astype(f32) / bc2) + eps),
            mu, nu)
        return out, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: Dict) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    t = cfg["training"]
    opt = t["optimizer"]
    lr_sched = make_lr_schedule(cfg)
    betas = opt.get("betas", (0.9, 0.95))
    b1, b2 = float(betas[0]), float(betas[1])
    eps = float(opt.get("eps", 1e-8))
    wd = float(opt.get("weight_decay", 0.05))
    mv = str(opt.get("mv_dtype", "fp32")).lower()
    if mv in ("fp32", "float32", ""):
        adamw = optax.adamw(learning_rate=lr_sched, b1=b1, b2=b2, eps=eps,
                            weight_decay=wd)
    elif mv in ("bf16", "bfloat16"):
        # same decoupled-weight-decay composition as optax.adamw
        adamw = optax.chain(
            _scale_by_adam_mv(b1, b2, eps, jnp.bfloat16),
            optax.add_decayed_weights(wd),
            optax.scale_by_learning_rate(lr_sched),
        )
    else:
        raise ValueError(
            f"training.optimizer.mv_dtype must be fp32|bf16, got {mv!r}")
    tx = optax.chain(
        optax.clip_by_global_norm(float(t.get("grad_clip_norm", 1.0))),
        adamw,
    )
    accum = int(cfg["data"].get("grad_accum_steps", 1))
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx, lr_sched


def minimal_init_shapes(cfg: Dict) -> Dict[str, Tuple[int, ...]]:
    """Smallest input shapes that exercise every parameter: batch 1, one
    tube of video (T = t_down * tube_t, H/W = s_down * tube_h/w), audio long
    enough to pool to frames_per_clip."""
    vl = cfg["video"]["latent"]
    al = cfg["audio"]["latent"]
    tube = cfg["tokenizer"]["video"]["tube"]
    Cv, td, sd = int(vl["channels"]), int(vl["t_down"]), int(vl["s_down"])
    Ca, Fa = int(al["channels"]), int(al["frames_per_clip"])
    T = td * int(tube["t"])
    H = sd * int(tube["h"])
    W = sd * int(tube["w"])
    mouth = (cfg.get("conditioning", {}) or {}).get("mouth_crop", {}) or {}
    if mouth.get("enabled", False):
        # frames must contain the mouth box (and T divide its tube) so the
        # init-time crop matches the real token layout
        h0, h1, w0, w1 = (int(x) for x in mouth.get("box", (64, 112, 32, 96)))
        mt = int((mouth.get("tube", {}) or {}).get("t", 2))
        unit_h, unit_w = sd * int(tube["h"]), sd * int(tube["w"])
        H = max(H, -(-h1 // unit_h) * unit_h)
        W = max(W, -(-w1 // unit_w) * unit_w)
        while T % mt:
            T += td * int(tube["t"])
    L = max(Fa, int(cfg["tokenizer"]["audio"]["chunk"]["length"]) * Fa // 4 + Fa)
    return {
        "video": (1, 3, T, H, W),
        "audio": (1, 1, L),
        "z_video": (1, Cv, T // td, H // sd, W // sd),
        "z_audio": (1, Ca, Fa),
    }


def latent_shapes_from_config(cfg: Dict, batch_size: int) -> Dict[str, Tuple[int, ...]]:
    """Static latent shapes (SURVEY §2.A ledger)."""
    T = int(round(cfg["data"]["clip_seconds"] * cfg["video"]["fps"]))
    H, W = (int(x) for x in cfg["video"]["size"])
    L = int(round(cfg["data"]["clip_seconds"] * cfg["audio"]["sr"]))
    vl = cfg["video"]["latent"]
    al = cfg["audio"]["latent"]
    Cv, td, sd = int(vl["channels"]), int(vl["t_down"]), int(vl["s_down"])
    Ca, Fa = int(al["channels"]), int(al["frames_per_clip"])
    return {
        "video": (batch_size, 3, T, H, W),
        "audio": (batch_size, 1, L),
        "z_video": (batch_size, Cv, T // td, H // sd, W // sd),
        "z_audio": (batch_size, Ca, Fa),
    }


# ---------------------------------------------------------------------------
# the train step
# ---------------------------------------------------------------------------


def build_train_step(
    model: AVDiffusionModel,
    tx: optax.GradientTransformation,
    abar_v: jnp.ndarray,
    abar_a: jnp.ndarray,
    z_video_shape: Tuple[int, ...],
    z_audio_shape: Tuple[int, ...],
    T_v: int,
    T_a: int,
    cfg_drop_prob: float,
    align_weight: float,
    ema_decay: float,
    use_ema: bool,
    recon_weight: float = 0.0,
    clean_cond_prob: float = 0.0,
    sync_weight: float = 0.0,
    sync_tau: float = 0.1,
    sync_source: str = "video",
    ema_scope: str = "core",
):
    """Returns train_step(state, batch, target_is_video) -> (state, metrics).

    Reference hot loop: trainer.py:254-403.  All randomness (timesteps,
    noise, CFG drop, dropout) is drawn on device from state.rng.

    clean_cond_prob: per-sample probability of forcing the CONDITIONING
    modality's timestep to 0.  Sampling always conditions on the clean
    prompt at t=0 (infer/ddim.py `t_zero`), but independent uniform t
    draws hit that configuration with probability ~1/T — the denoiser is
    never trained where it is used.  A clean-conditioning mixture puts the
    inference configuration in the training distribution while keeping
    the any-to-any joint objective (reference semantics = 0.0).
    """

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   target_is_video: jnp.ndarray):
        (rng, k_tv, k_ta, k_nv, k_na, k_drop, k_dropout, k_vae,
         k_clean) = jax.random.split(state.rng, 9)
        video = batch["video"]
        if video.dtype == jnp.uint8:
            # on-device preprocessing: the host ships uint8 [B, T, H, W, 3];
            # cast/normalize/transpose here so XLA fuses it into the VAE's
            # first conv (4x fewer host->device bytes than float32)
            video = video.astype(jnp.float32).transpose(0, 4, 1, 2, 3) / 255.0
        batch = dict(batch, video=video)
        B = batch["video"].shape[0]
        t_v = jax.random.randint(k_tv, (B,), 0, T_v)
        t_a = jax.random.randint(k_ta, (B,), 0, T_a)
        if clean_cond_prob > 0.0:
            clean = jax.random.uniform(k_clean, (B,)) < clean_cond_prob
            is_v = target_is_video.astype(bool)
            # zero the CONDITIONING modality's t (video conditions when the
            # target is audio, and vice versa)
            t_v = jnp.where(clean & jnp.logical_not(is_v), 0, t_v)
            t_a = jnp.where(clean & is_v, 0, t_a)
        noise_v = jax.random.normal(k_nv, z_video_shape, jnp.float32)
        noise_a = jax.random.normal(k_na, z_audio_shape, jnp.float32)

        # CFG condition drop: zero the NON-target modality's (embedded)
        # tokens with prob cfg_drop_prob per sample (trainer.py:341-349).
        drop = (jax.random.uniform(k_drop, (B,)) < cfg_drop_prob).astype(jnp.float32)
        keep_nontarget = 1.0 - drop
        w_v = target_is_video.astype(jnp.float32)
        keep_v = w_v * 1.0 + (1.0 - w_v) * keep_nontarget  # video kept if target
        keep_a = w_v * keep_nontarget + (1.0 - w_v) * 1.0
        # mouth-crop stream (if enabled): clean-video conditioning — active
        # only when video is the CONDITIONING modality (else it would leak
        # the target), dropped together with video conditioning under CFG
        keep_m = (1.0 - w_v) * keep_nontarget

        def loss_fn(params):
            out = model.apply(
                {"params": params},
                batch["video"],
                batch["audio"],
                t_v,
                t_a,
                noise_v,
                noise_a,
                abar_v,
                abar_a,
                keep_v,
                keep_a,
                deterministic=False,
                keep_m=keep_m,
                with_recon=recon_weight > 0.0,
                rngs={"dropout": k_dropout, "vae": k_vae},
            )
            loss_main = mse_targets_only(
                out["eps_v"], out["eps_a"], out["eps_true_v"], out["eps_true_a"],
                target_is_video,
                has_video=batch.get("has_video"),
                has_audio=batch.get("has_audio"),
            )
            loss_align = alignment_loss(out["h_v"], out["h_a"], weight=align_weight)
            # temporal sync supervision (training.sync_loss_weight): InfoNCE
            # across time WITHIN each clip — time-chunk counts come from
            # static grids, so this traces once.  sync_loss_source "mouth"
            # supervises the 16 Hz mouth-token features (8x finer than the
            # main video grid's ~375 ms chunks — word-level timing), gated
            # per sample by keep_m (a dropped/target-side stream carries no
            # timing); "video" is the main latent-grid stream (v4 behavior).
            if sync_source == "mouth":
                loss_sync = sync_contrastive_loss(
                    out["h_m"], out["h_a"],
                    video_time_chunks=(batch["video"].shape[2]
                                       // model.cfg.mouth_tube[0]),
                    weight=sync_weight, tau=sync_tau, sample_weight=keep_m)
            else:
                loss_sync = sync_contrastive_loss(
                    out["h_v"], out["h_a"],
                    video_time_chunks=z_video_shape[2] // model.cfg.tube[0],
                    weight=sync_weight, tau=sync_tau)
            if recon_weight > 0.0:
                loss_recon = reconstruction_loss(
                    out["recon_v"], batch["video"], out["recon_a"],
                    batch["audio"], weight=recon_weight,
                    has_video=batch.get("has_video"),
                    has_audio=batch.get("has_audio"))
            else:
                loss_recon = jnp.asarray(0.0, jnp.float32)
            return (loss_main + loss_align + loss_recon + loss_sync,
                    (loss_main, loss_align, loss_recon, loss_sync))

        (loss, (loss_main, loss_align, loss_recon, loss_sync)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(state.params))
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        if use_ema:
            # training.ema.scope: "core" shadows params['core'] (reference
            # scope, SURVEY §2.12.7); "all" shadows the full tree so EMA
            # sampling also smooths heads/adapters/decoders
            ema_target = new_params if ema_scope == "all" else new_params["core"]
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + p.astype(e.dtype) * (1.0 - ema_decay),
                state.ema_core,
                ema_target,
            )
        else:
            new_ema = state.ema_core

        metrics = {
            "loss": loss,
            "loss_main": loss_main,
            "loss_align": loss_align,
            "loss_recon": loss_recon,
            "loss_sync": loss_sync,
            "grad_norm": optax.global_norm(grads),
        }
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema_core=new_ema,
            rng=rng,
        )
        return new_state, metrics

    return train_step


def build_eval_step(
    model: AVDiffusionModel,
    abar_v: jnp.ndarray,
    abar_a: jnp.ndarray,
    z_video_shape: Tuple[int, ...],
    z_audio_shape: Tuple[int, ...],
    T_v: int,
    T_a: int,
):
    """Deterministic validation step: per-modality eps-MSE, no CFG drop, no
    dropout, fixed per-call RNG.  (The reference parsed `val_every` but left
    validation unwired — trainer.py:139 `loader_val = None`.)"""

    def eval_step(params, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        video = batch["video"]
        if video.dtype == jnp.uint8:
            video = video.astype(jnp.float32).transpose(0, 4, 1, 2, 3) / 255.0
        k_tv, k_ta, k_nv, k_na = jax.random.split(rng, 4)
        B = video.shape[0]
        t_v = jax.random.randint(k_tv, (B,), 0, T_v)
        t_a = jax.random.randint(k_ta, (B,), 0, T_a)
        noise_v = jax.random.normal(k_nv, z_video_shape, jnp.float32)
        noise_a = jax.random.normal(k_na, z_audio_shape, jnp.float32)
        out = model.apply(
            {"params": params},
            video,
            batch["audio"],
            t_v,
            t_a,
            noise_v,
            noise_a,
            abar_v,
            abar_a,
            deterministic=True,
        )
        loss_v = mse_targets_only(
            out["eps_v"], out["eps_a"], out["eps_true_v"], out["eps_true_a"],
            jnp.asarray(1.0), batch.get("has_video"), batch.get("has_audio"))
        if model.cfg.mouth_enabled:
            # audio-target loss with the mouth conditioning ACTIVE (the
            # sampling-time v2a configuration); the first forward keeps it
            # zeroed so loss_v never sees clean target pixels.  This is a
            # second full forward (~2x eval cost) — acceptable because
            # validation is opt-in (val_every) and bounded to n_batches;
            # sharing the encodes would need a split model API for a
            # non-hot path
            out_m = model.apply(
                {"params": params}, video, batch["audio"], t_v, t_a,
                noise_v, noise_a, abar_v, abar_a, deterministic=True,
                keep_m=jnp.ones((B,), jnp.float32),
            )
            loss_a = mse_targets_only(
                out_m["eps_v"], out_m["eps_a"],
                out_m["eps_true_v"], out_m["eps_true_a"],
                jnp.asarray(0.0), batch.get("has_video"),
                batch.get("has_audio"))
        else:
            loss_a = mse_targets_only(
                out["eps_v"], out["eps_a"], out["eps_true_v"],
                out["eps_true_a"],
                jnp.asarray(0.0), batch.get("has_video"),
                batch.get("has_audio"))
        return {"val_loss_video": loss_v, "val_loss_audio": loss_a,
                "val_loss": 0.5 * (loss_v + loss_a)}

    return eval_step


def run_validation(bundle: "TrainerBundle", batches, n_batches: int = 8,
                   seed: int = 0, params=None) -> Dict[str, float]:
    """Average the eval step over up to n_batches; returns host floats.

    `params` defaults to the bundle's initial params; pass the live training
    params explicitly when validating mid-run (run_training hands them to
    val_fn)."""
    if bundle.eval_step is None:
        raise RuntimeError("bundle has no eval_step")
    params = params if params is not None else bundle.state.params
    key = jax.random.PRNGKey(seed)
    acc: Dict[str, list] = {}
    for i, batch in enumerate(batches):
        if i >= n_batches:
            break
        key, sub = jax.random.split(key)
        host_batch = {
            "video": batch["video"],
            "audio": batch["audio"],
            "has_video": batch["has_video"],
            "has_audio": batch["has_audio"],
        }
        dev_batch = shard_batch(bundle.mesh, host_batch)
        m = bundle.eval_step(params, dev_batch, sub)
        for k, v in jax.device_get(m).items():
            acc.setdefault(k, []).append(float(v))
    return {k: float(np.mean(v)) for k, v in acc.items()}


# ---------------------------------------------------------------------------
# top-level builder
# ---------------------------------------------------------------------------


def create_trainer(
    cfg: Dict,
    rng: Optional[jax.Array] = None,
    mesh=None,
    batch_size: Optional[int] = None,
) -> TrainerBundle:
    dtype = compute_dtype_from_config(cfg)
    mesh = mesh if mesh is not None else make_mesh_from_config(cfg)
    mdl_cfg = AVDiffusionConfig.from_config(
        cfg, dtype=dtype,
        remat=bool(cfg.get("parallel", {}).get("remat_core", False)),
        mesh=mesh,
    )
    model = AVDiffusionModel(mdl_cfg)
    # codec timing diagnostic (reference check_consistency semantics)
    cc = mdl_cfg.codec
    if cc.frames_per_clip:
        dur_est = cc.frames_per_clip * cc.hop_samples / float(cc.sr)
        want = float(cfg["data"].get("clip_seconds", dur_est))
        if abs(dur_est - want) > 0.02:
            import warnings

            warnings.warn(
                f"[AudioCodec] frames_per_clip x hop = {dur_est:.3f}s does not "
                f"match clip_seconds={want:.3f}s; check audio latent config.")

    if batch_size is None:
        per_chip = int(cfg["data"]["batch_size"])
        batch_size = per_chip * mesh.shape["data"]
    shapes = latent_shapes_from_config(cfg, batch_size)

    # diffusion schedules (host-built, device-resident fp32)
    dv, da = cfg["diffusion"]["video"], cfg["diffusion"]["audio"]
    T_v, T_a = int(dv["steps"]), int(da["steps"])
    _, abar_v = S.alphas_cumprod_from_betas(
        S.make_beta_schedule(T_v, dv["schedule"], float(dv["min_beta"]), float(dv["max_beta"]))
    )
    _, abar_a = S.alphas_cumprod_from_betas(
        S.make_beta_schedule(T_a, da["schedule"], float(da["min_beta"]), float(da["max_beta"]))
    )
    abar_v = jnp.asarray(abar_v)
    abar_a = jnp.asarray(abar_a)

    # Init params at MINIMAL input shapes: parameter shapes are independent
    # of batch/T/H/W/L (convs + token models), and initializer statistics
    # depend only on kernel fan-in — so a tiny dummy avoids compiling the
    # full-resolution VAE forward just to draw weights (measured: 174 s at
    # mvp scale on-device vs ~2 s minimal).
    rng = rng if rng is not None else jax.random.PRNGKey(int(cfg.get("seed", 0)))
    rng, init_rng = jax.random.split(rng)
    mini = minimal_init_shapes(cfg)
    t0 = jnp.zeros((1,), jnp.int32)
    init_fn = partial(
        model.init,
        video=jnp.zeros(mini["video"], jnp.float32),
        audio=jnp.zeros(mini["audio"], jnp.float32),
        t_v=t0,
        t_a=t0,
        noise_v=jnp.zeros(mini["z_video"], jnp.float32),
        noise_a=jnp.zeros(mini["z_audio"], jnp.float32),
        alpha_bar_v=abar_v,
        alpha_bar_a=abar_a,
        deterministic=True,
    )
    variables = init_fn({"params": init_rng})
    boxed_params = variables["params"]
    param_shardings = infer_param_shardings(mesh, boxed_params)
    params = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), meta.unbox(boxed_params), param_shardings
    )

    tx, _ = make_optimizer(cfg)
    opt_state = jax.jit(tx.init)(params)  # inherits param shardings

    ema_cfg = cfg["training"].get("ema", {"use_ema": True, "decay": 0.999})
    use_ema = bool(ema_cfg.get("use_ema", True))
    ema_scope = str(ema_cfg.get("scope", "core"))
    if ema_scope not in ("core", "all"):
        raise ValueError(
            f"training.ema.scope must be core|all, got {ema_scope!r}")
    sync_source = str(cfg["training"].get("sync_loss_source", "video"))
    if sync_source not in ("video", "mouth"):
        raise ValueError(
            f"training.sync_loss_source must be video|mouth, got "
            f"{sync_source!r}")
    if (sync_source == "mouth"
            and float(cfg["training"].get("sync_loss_weight", 0.0)) > 0.0
            and not model.cfg.mouth_enabled):
        raise ValueError(
            "training.sync_loss_source: mouth requires "
            "conditioning.mouth_crop.enabled: true")
    ema_src = params if ema_scope == "all" else params["core"]
    ema_shard = param_shardings if ema_scope == "all" else param_shardings["core"]
    # EMA shadow must carry the SAME committed shardings as the core params,
    # or the second train step recompiles when the updated shadow comes back
    # with computed shardings (measured: one 110 s re-jit without this).
    ema_core = (
        jax.tree_util.tree_map(
            # copy=True: device_put of the identical array would ALIAS the
            # param buffer, and donating state would then donate one buffer
            # twice (runtime error)
            lambda x, s: jax.device_put(jnp.array(x, copy=True), s),
            ema_src, ema_shard,
        )
        if use_ema
        else {}
    )

    state = TrainState(
        step=jax.device_put(jnp.asarray(0, jnp.int32), replicated(mesh)),
        params=params,
        opt_state=opt_state,
        ema_core=ema_core,
        rng=jax.device_put(rng, replicated(mesh)),
    )

    recon_weight = float(cfg["training"].get("recon_loss_weight", 0.0))
    recon_every = cfg["training"].get("recon_every", 1)
    recon_every = 1 if recon_every is None else int(recon_every)
    if recon_every < 1:
        raise ValueError(
            f"training.recon_every must be >= 1, got {recon_every}")
    step_kw = dict(
        cfg_drop_prob=float(cfg["training"].get("cfg_drop_prob", 0.1)),
        align_weight=float(cfg["training"].get("align_loss_weight", 0.0)),
        ema_decay=float(ema_cfg.get("decay", 0.999)),
        use_ema=use_ema,
        clean_cond_prob=float(cfg["training"].get("clean_cond_prob", 0.0)),
        sync_weight=float(cfg["training"].get("sync_loss_weight", 0.0)),
        sync_tau=float(cfg["training"].get("sync_tau", 0.1)),
        sync_source=sync_source,
        ema_scope=ema_scope,
    )
    step_fn = build_train_step(
        model, tx, abar_v, abar_a, shapes["z_video"], shapes["z_audio"],
        T_v, T_a, recon_weight=recon_weight, **step_kw,
    )
    train_step = jax.jit(step_fn, donate_argnums=(0,))
    train_step_norecon = None
    if recon_weight > 0.0 and recon_every > 1:
        train_step_norecon = jax.jit(
            build_train_step(
                model, tx, abar_v, abar_a, shapes["z_video"],
                shapes["z_audio"], T_v, T_a, recon_weight=0.0, **step_kw,
            ),
            donate_argnums=(0,),
        )

    eval_step = jax.jit(
        build_eval_step(model, abar_v, abar_a, shapes["z_video"],
                        shapes["z_audio"], T_v, T_a)
    )

    return TrainerBundle(
        model=model,
        mesh=mesh,
        state=state,
        train_step=train_step,
        tx=tx,
        latent_shapes=shapes,
        abar_v=abar_v,
        abar_a=abar_a,
        eval_step=eval_step,
        train_step_norecon=train_step_norecon,
    )


# ---------------------------------------------------------------------------
# training loop driver (host side)
# ---------------------------------------------------------------------------


def run_training(
    cfg: Dict,
    bundle: TrainerBundle,
    batches: Iterator[Dict[str, np.ndarray]],
    *,
    max_steps: Optional[int] = None,
    log_fn=None,
    checkpoint_fn=None,
    val_fn=None,
    should_stop=None,
) -> TrainState:
    """Drive the jitted step over a host batch iterator.

    log_fn(step, metrics_dict) every `log_every`; checkpoint_fn(step, state)
    every `ckpt_every` (reference cadence, trainer.py:390-398);
    val_fn(step, state) every `val_every`.  `should_stop()` is polled every
    step — preemption (SIGTERM) sets it so the loop exits cleanly and the
    caller's final checkpoint flushes (the reference had no recovery story
    beyond checkpoint-latest, SURVEY §5).
    """
    t_cfg = cfg["training"]
    max_steps = max_steps if max_steps is not None else int(t_cfg["max_steps"])
    log_every = int(t_cfg.get("log_every", 50))
    ckpt_every = int(t_cfg.get("ckpt_every", 5000))
    val_every = int(t_cfg.get("val_every", 0) or 0)
    recon_every = int(t_cfg.get("recon_every", 1) or 1)
    schedule = Any2AnySchedule(
        t_cfg.get("any2any_targets", {"video": 0.5, "audio": 0.5}),
        seed=int(cfg.get("seed", 0)),
    )

    state = bundle.state
    mesh = bundle.mesh
    pending = []  # (step, metrics) not yet logged
    t_last = time.perf_counter()

    # MFU accounting (SURVEY §5: the reference has no perf observability):
    # fwd + bwd of the denoiser ~ 3x forward FLOPs at the mvp token count.
    from ..utils.profiling import flops_mmdit_forward, mfu as mfu_util

    try:
        core = bundle.model.cfg.core
        tok = cfg["tokenizer"]
        n_tokens = None  # derived lazily: depends on latent dims
        zv = bundle.latent_shapes["z_video"]
        za = bundle.latent_shapes["z_audio"]
        tube = cfg["tokenizer"]["video"]["tube"]
        chunk = cfg["tokenizer"]["audio"]["chunk"]
        nv = (zv[2] // int(tube["t"])) * (zv[3] // int(tube["h"])) * (
            zv[4] // int(tube["w"]))
        from ..ops.tokenize import num_chunks

        na = num_chunks(za[2], int(chunk["length"]), int(chunk["stride"]))
        _denoiser_flops_per_step = 3.0 * bundle.latent_shapes["video"][0] * (
            flops_mmdit_forward(nv + na, core.d_model, core.n_layers,
                                core.mlp_ratio))
    except Exception:
        _denoiser_flops_per_step = None
    # run-start chip calibration: the datasheet-MFU number alone invites
    # misreading on this shared chip (7.3% of datasheet = ~1.4x the chip's
    # own same-minute matmul ceiling, PERFORMANCE.md "Step decomposition");
    # logging MFU relative to the measured ceiling makes the live metric
    # the honest one.  None off TPU.
    from ..utils.profiling import calib_tflops as _calib_fn

    try:
        _calib = _calib_fn()
    except Exception:
        _calib = None
    B_, _, T_, H_, W_ = bundle.latent_shapes["video"]
    # default must MATCH the dataset side: RecordDataset defaults
    # device_preprocess=True (train_joint), so a records run without the
    # explicit flag must zero-fill missing video as uint8 [B,T,H,W,3] — a
    # float32 latent-shaped fill would retrace the jitted step mid-run
    data_cfg = cfg.get("data", {}) or {}
    device_pre = bool(data_cfg.get(
        "device_preprocess", bool(data_cfg.get("records_dir"))))

    def prep_and_put(batch):
        """Host-side prep + async device_put (runs on the prefetch thread)."""
        # target priority: collate's pick (it knows modality availability,
        # reference CollateFn semantics trainer.py:70-77) else our schedule
        target = batch.get("target")
        if isinstance(target, set):
            target = next(iter(target)) if target else "audio"
        if target not in ("video", "audio"):
            target = schedule.sample_target()
        tiv = jnp.asarray(1.0 if target == "video" else 0.0, jnp.float32)
        vid_fill = (
            np.zeros((B_, T_, H_, W_, 3), np.uint8)
            if device_pre
            else np.zeros(bundle.latent_shapes["video"], np.float32)
        )
        host_batch = {
            # zero-fill an entirely-missing modality (static shapes for jit);
            # its has_* mask already excludes it from the loss
            "video": batch["video"] if batch.get("video") is not None
            else vid_fill,
            "audio": batch["audio"] if batch.get("audio") is not None
            else np.zeros(bundle.latent_shapes["audio"], np.float32),
            "has_video": batch["has_video"],
            "has_audio": batch["has_audio"],
        }
        return shard_batch(mesh, host_batch), tiv

    # step counting is host-side: reading state.step each iteration would
    # force a device sync per step on the donated state
    from itertools import islice

    from ..datasets.loader import device_prefetch

    start_step = int(state.step)
    n_todo = max(0, max_steps - start_step)
    prefetch_depth = int(cfg["data"].get("prefetch_factor", 2) or 2)
    stream = device_prefetch(islice(batches, n_todo), prep_and_put,
                             depth=prefetch_depth)
    for step_i, (dev_batch, tiv) in enumerate(stream, start=start_step):
        # recon decode only on every recon_every-th step (config-gated,
        # default 1 = reference-faithful every step); the alternate
        # executable shares state layout so donation alternates cleanly
        step_fn = bundle.train_step
        if (bundle.train_step_norecon is not None
                and (step_i + 1) % recon_every != 0):
            step_fn = bundle.train_step_norecon
        state, metrics = step_fn(state, dev_batch, tiv)
        if log_fn is not None:
            pending.append(metrics)  # device arrays; host-synced per interval

        new_step = step_i + 1
        if log_fn is not None and new_step % log_every == 0:
            # one host sync per log interval
            vals = jax.device_get(pending)
            agg = {
                k: float(np.mean([v[k] for v in vals])) for k in vals[0]
            }
            now = time.perf_counter()
            dt = (now - t_last) / max(1, len(pending))
            agg["steps_per_sec"] = 1.0 / dt
            agg["clips_per_sec"] = bundle.latent_shapes["video"][0] / dt
            if _denoiser_flops_per_step is not None:
                agg["denoiser_mfu"] = mfu_util(_denoiser_flops_per_step / dt)
                if _calib:
                    agg["denoiser_mfu_vs_calib"] = (
                        _denoiser_flops_per_step / dt / 1e12) / _calib
            t_last = now
            log_fn(new_step, agg)
            pending = []
        if checkpoint_fn is not None and new_step % ckpt_every == 0:
            checkpoint_fn(new_step, state)
        if val_fn is not None and val_every and new_step % val_every == 0:
            val_fn(new_step, state)
        if should_stop is not None and should_stop():
            print(f"[preempt] stop requested; exiting at step {new_step}")
            break
    bundle.state = state
    return state
