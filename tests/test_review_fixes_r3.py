"""Regression tests for the round-3 code-review findings.

Each test pins one fixed defect:
  * sampler cache key must include sampling.sampler / diffusion.param,
  * shape-keyed batching must not starve minority-shape requests,
  * int8 quant must stay OFF on pipelined TRAINING passes (zero-gradient
    round/clip would silently stop learning),
  * mouth-crop v2a sampling must accept frame counts the VAE center-crops
    (grid was derived post-crop, tokens pre-crop -> trace-time crash).
"""

import copy
import threading
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests._tiny import tiny_cfg


def test_sampler_cache_distinguishes_sampler_and_param():
    from multimodal_diffusion_tpu.infer import sample_clip as sc
    from multimodal_diffusion_tpu.models.diffusion import (
        AVDiffusionConfig, AVDiffusionModel,
    )

    cfg = tiny_cfg()
    model = AVDiffusionModel(AVDiffusionConfig.from_config(cfg))
    sc._SAMPLER_CACHE.clear()

    s_ddim = sc.get_sampler(model, cfg, "audio")

    cfg_dpm = copy.deepcopy(cfg)
    cfg_dpm["sampling"]["sampler"] = "dpmpp_2m"
    s_dpm = sc.get_sampler(model, cfg_dpm, "audio")
    assert s_dpm is not s_ddim, (
        "cache returned the DDIM sampler for a dpmpp_2m config")

    cfg_x0 = copy.deepcopy(cfg)
    cfg_x0["diffusion"]["audio"]["param"] = "x0"
    s_x0 = sc.get_sampler(model, cfg_x0, "audio")
    assert s_x0 is not s_ddim and s_x0 is not s_dpm, (
        "cache returned an eps-param sampler for an x0-param config")

    # same settings -> cache hit
    assert sc.get_sampler(model, cfg, "audio") is s_ddim
    sc._SAMPLER_CACHE.clear()


def test_scheduler_fairness_no_starvation():
    """A sustained stream on one (direction, shape) key must not starve a
    minority-shape request: past fairness_age_s the oldest head is served
    even while the majority queue stays fuller."""
    from multimodal_diffusion_tpu.serve.runner import BatchScheduler, WorkItem

    def run(items):
        time.sleep(0.01)
        for it in items:
            it.out = it.prompt

    sched = BatchScheduler(run, max_batch=2, max_queue=8,
                           fairness_age_s=0.2)
    stop = threading.Event()

    def flood():
        while not stop.is_set():
            its = [WorkItem("v2a", np.zeros((4,), np.float32))
                   for _ in range(2)]
            sched.submit_items(its, timeout=0.5)

    t = threading.Thread(target=flood, daemon=True)
    t.start()
    try:
        time.sleep(0.1)  # let the majority stream establish itself
        minority = WorkItem("a2v", np.zeros((7,), np.float32))
        assert sched.submit_items([minority], timeout=10.0)
        assert minority.done.wait(timeout=10), "minority-shape item starved"
        assert minority.error is None
    finally:
        stop.set()
        t.join(timeout=5)
        sched.shutdown()


@pytest.mark.slow
def test_pipe_quant_gated_off_in_training():
    """Pipelined core with model.core.quant=int8: a TRAINING pass
    (deterministic=False) must match the unquantized forward bit-for-bit
    (quant disabled -> gradients live), while the deterministic inference
    pass engages int8 (output differs)."""
    from multimodal_diffusion_tpu.models.mmdit import MMDiT, MMDiTConfig
    from multimodal_diffusion_tpu.parallel.mesh import make_mesh_from_config

    mesh = make_mesh_from_config(
        {"parallel": {"data": 1, "model": 1, "pipe": 2}},
        devices=jax.devices()[:2])
    kw = dict(d_model=32, n_layers=2, n_heads=2, mlp_ratio=2.0, dropout=0.0,
              attn_dropout=0.0, norm="rmsnorm", mesh=mesh, pipe_axis="pipe",
              pipe_microbatches=2)
    core_q = MMDiT(MMDiTConfig(quant="int8", **kw))
    core_f = MMDiT(MMDiTConfig(quant="none", **kw))

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 32), jnp.float32)
    params = core_f.init({"params": jax.random.PRNGKey(1)}, x)["params"]

    y_train_q = core_q.apply({"params": params}, x, deterministic=False,
                             rngs={"dropout": jax.random.PRNGKey(2)})
    y_train_f = core_f.apply({"params": params}, x, deterministic=False,
                             rngs={"dropout": jax.random.PRNGKey(2)})
    np.testing.assert_array_equal(np.asarray(y_train_q),
                                  np.asarray(y_train_f))

    y_inf_q = core_q.apply({"params": params}, x, deterministic=True)
    assert not np.allclose(np.asarray(y_inf_q), np.asarray(y_train_f)), (
        "int8 never engaged on the deterministic pipelined pass")

    # and the training pass must carry gradients through the projections
    def loss(p):
        return jnp.sum(core_q.apply({"params": p}, x, deterministic=False,
                                    rngs={"dropout": jax.random.PRNGKey(2)})
                       ** 2)

    g = jax.grad(loss)(params)
    gnorm = float(jnp.sqrt(sum(jnp.sum(a ** 2)
                               for a in jax.tree.leaves(g))))
    assert np.isfinite(gnorm) and gnorm > 0.0


def test_mouth_sampling_nondivisible_frame_count():
    """10 frames with vae.t_down=4 (VAE center-crops to 8): mouth tokens
    must be patched from the SAME cropped frames, not crash on a grid
    mismatch."""
    from multimodal_diffusion_tpu.infer.sample_clip import (
        build_components, sample_one_direction,
    )

    cfg = tiny_cfg()
    cfg["conditioning"] = {"mouth_crop": {
        "enabled": True, "box": [16, 32, 8, 24],
        "tube": {"t": 2, "h": 4, "w": 4}}}
    cfg["diffusion"]["audio"]["sampler_steps"] = 2

    model, params = build_components(cfg)
    frames = np.random.default_rng(0).integers(
        0, 255, (1, 10, 32, 32, 3), dtype=np.uint8)  # 10 % 4 != 0
    out = sample_one_direction(
        cfg=cfg, model=model, params=params, prompt_modality="video",
        prompt_video=frames, rng=jax.random.PRNGKey(0))
    wav = np.asarray(out["audio"])
    assert np.isfinite(wav).all()

    # too few frames for even one latent step -> clear error, not a crash
    with pytest.raises(ValueError, match="frames"):
        sample_one_direction(
            cfg=cfg, model=model, params=params, prompt_modality="video",
            prompt_video=frames[:, :3], rng=jax.random.PRNGKey(0))
