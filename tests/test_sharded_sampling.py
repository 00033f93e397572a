"""Multi-chip sampling: the scan-DDIM sampler with the batch sharded over
the 'data' mesh axis must produce the same latents as single-device
execution (BASELINE north star: "multi-chip sampling shards the batch over
ICI")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests._tiny import tiny_cfg


@pytest.mark.slow
def test_sampler_batch_sharded_matches_single_device():
    from multimodal_diffusion_tpu.infer.ddim import sampler_from_config
    from multimodal_diffusion_tpu.parallel.mesh import make_mesh
    from multimodal_diffusion_tpu.parallel.sharding import (
        batch_sharding, replicated,
    )
    from multimodal_diffusion_tpu.train.trainer import create_trainer

    cfg = tiny_cfg()
    # keep the comparison numerically tame: an untrained model at high
    # guidance amplifies reduction-order noise chaotically through the scan
    cfg["diffusion"]["audio"]["sampler_steps"] = 2
    cfg["sampling"]["guidance_scale"]["audio"] = 1.0
    bundle = create_trainer(cfg)
    params = jax.device_get(bundle.state.params)

    sample, _ = sampler_from_config(bundle.model, cfg, target="audio")
    B = 8
    z_v0 = jax.random.normal(jax.random.PRNGKey(0), (B, 8, 2, 4, 4))
    z_init = jax.random.normal(jax.random.PRNGKey(1), (B, 8, 50))
    rng = jax.random.PRNGKey(2)

    out_single = np.asarray(sample(params, z_v0, z_init, rng))

    mesh = make_mesh(data=8, model=1)
    params_repl = jax.device_put(
        params, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    )
    z_v0_s = jax.device_put(z_v0, batch_sharding(mesh, z_v0.ndim))
    z_init_s = jax.device_put(z_init, batch_sharding(mesh, z_init.ndim))
    rng_s = jax.device_put(rng, replicated(mesh))
    out_sharded = sample(params_repl, z_v0_s, z_init_s, rng_s)

    # result is batch-sharded over the mesh and numerically identical
    assert len(out_sharded.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out_sharded), out_single,
                               rtol=5e-3, atol=5e-4)
