"""Unit tests for trainer internals: LR schedule, grad accumulation, dtype
selection, minimal-init equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tests._tiny import tiny_cfg


def test_warmup_cosine_schedule_values():
    from multimodal_diffusion_tpu.train.trainer import make_lr_schedule

    cfg = tiny_cfg()
    cfg["training"]["optimizer"]["lr"] = 1e-3
    cfg["training"]["scheduler"] = {"name": "cosine", "warmup_steps": 10}
    cfg["training"]["max_steps"] = 100
    sched = make_lr_schedule(cfg)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(10)), 1e-3, rtol=1e-6)
    assert float(sched(5)) == pytest.approx(5e-4, rel=1e-5)
    assert float(sched(55)) < 1e-3  # decaying
    assert float(sched(100)) == pytest.approx(0.0, abs=1e-9)
    # "none" scheduler -> constant
    cfg["training"]["scheduler"] = {"name": "none"}
    const = make_lr_schedule(cfg)
    assert float(const(0)) == float(const(999)) == 1e-3


def test_grad_accumulation_multisteps():
    """grad_accum_steps=2 applies updates every 2nd micro-step with the
    averaged gradient."""
    from multimodal_diffusion_tpu.train.trainer import make_optimizer

    cfg = tiny_cfg()
    cfg["data"]["grad_accum_steps"] = 2
    cfg["training"]["scheduler"] = {"name": "none"}
    cfg["training"]["optimizer"]["weight_decay"] = 0.0
    tx, _ = make_optimizer(cfg)
    params = {"w": jnp.ones((4,))}
    opt_state = tx.init(params)
    g1 = {"w": jnp.full((4,), 1.0)}
    g2 = {"w": jnp.full((4,), 3.0)}
    upd1, opt_state = tx.update(g1, opt_state, params)
    assert np.allclose(np.asarray(upd1["w"]), 0.0)  # buffered, no update yet
    upd2, opt_state = tx.update(g2, opt_state, params)
    assert not np.allclose(np.asarray(upd2["w"]), 0.0)  # applied at k=2


def test_compute_dtype_selection():
    from multimodal_diffusion_tpu.train.trainer import compute_dtype_from_config

    assert compute_dtype_from_config({"mixed_precision": "fp32"}) == jnp.float32
    assert compute_dtype_from_config({"mixed_precision": "bf16"}) == jnp.bfloat16
    # fp16 request maps to bf16 (TPU-native type, no loss scaler needed)
    assert compute_dtype_from_config({"mixed_precision": "fp16"}) == jnp.bfloat16
    assert compute_dtype_from_config({}) == jnp.float32


@pytest.mark.slow
def test_minimal_init_shapes_match_param_tree():
    """Params initialized at minimal shapes are identical in STRUCTURE and
    SHAPES to params initialized at full shapes."""
    from flax.core import meta

    from multimodal_diffusion_tpu.models.diffusion import (
        AVDiffusionConfig, AVDiffusionModel,
    )
    from multimodal_diffusion_tpu.ops import schedule as S
    from multimodal_diffusion_tpu.train.trainer import (
        latent_shapes_from_config, minimal_init_shapes,
    )

    cfg = tiny_cfg()
    model = AVDiffusionModel(AVDiffusionConfig.from_config(cfg))
    _, abar = S.alphas_cumprod_from_betas(S.make_beta_schedule(100))
    abar = jnp.asarray(abar)

    def init_at(shapes, batch):
        t0 = jnp.zeros((batch,), jnp.int32)
        return meta.unbox(model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros(shapes["video"]), jnp.zeros(shapes["audio"]),
            t0, t0,
            jnp.zeros(shapes["z_video"]), jnp.zeros(shapes["z_audio"]),
            abar, abar,
        )["params"])

    full = init_at(latent_shapes_from_config(cfg, 2), 2)
    mini = init_at(minimal_init_shapes(cfg), 1)
    full_shapes = jax.tree_util.tree_map(lambda x: x.shape, full)
    mini_shapes = jax.tree_util.tree_map(lambda x: x.shape, mini)
    assert full_shapes == mini_shapes
    # identical values too: initializers depend only on param shapes + rng
    for a, b in zip(jax.tree_util.tree_leaves(full),
                    jax.tree_util.tree_leaves(mini)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_run_training_logs_mfu():
    from multimodal_diffusion_tpu.train.trainer import (
        create_trainer, run_training,
    )

    cfg = tiny_cfg()
    bundle = create_trainer(cfg)
    rng = np.random.default_rng(0)
    B = bundle.latent_shapes["video"][0]

    def batches():
        while True:
            yield {
                "video": rng.uniform(0, 1, bundle.latent_shapes["video"]).astype(np.float32),
                "audio": rng.uniform(-1, 1, bundle.latent_shapes["audio"]).astype(np.float32),
                "has_video": np.ones(B, bool),
                "has_audio": np.ones(B, bool),
            }

    logs = []
    run_training(cfg, bundle, batches(), max_steps=2,
                 log_fn=lambda s, m: logs.append(m))
    assert logs and "denoiser_mfu" in logs[-1] and "clips_per_sec" in logs[-1]
    assert logs[-1]["denoiser_mfu"] >= 0.0


@pytest.mark.slow
def test_ema_scope_all_shadows_full_tree():
    """training.ema.scope: 'all' shadows every module (EMA sampling then
    smooths heads/adapters/decoders too); the default 'core' keeps the
    reference scope and the old checkpoint layout.  params_only_tree
    detects the scope from the stored tree's structure."""
    import jax.numpy as jnp
    import numpy as np

    from multimodal_diffusion_tpu.train.checkpoint import params_only_tree
    from multimodal_diffusion_tpu.train.trainer import create_trainer

    cfg = tiny_cfg()
    cfg["training"]["ema"] = {"use_ema": True, "decay": 0.5, "scope": "all"}
    tr = create_trainer(cfg)
    assert set(tr.state.ema_core) == set(tr.state.params)

    batch = {
        "video": jnp.zeros((2, 3, 8, 32, 32), jnp.float32),
        "audio": jnp.zeros((2, 1, 8000), jnp.float32),
    }
    # several steps: warmup lr starts at 0, so step 1 moves nothing
    state = tr.state
    for _ in range(3):
        state, _ = tr.train_step(state, batch, jnp.asarray(1.0))
    # decay 0.5: the shadow lags the updated params, so SOME head leaf must
    # differ from its param (individual leaves can be zero-grad biases —
    # check the whole subtree)
    diffs = jax.tree_util.tree_map(
        lambda e, p: float(np.max(np.abs(np.asarray(e) - np.asarray(p)))),
        state.ema_core["head"], state.params["head"])
    assert max(jax.tree_util.tree_leaves(diffs)) > 0.0

    tree = {"params": state.params, "ema_core": state.ema_core}
    out = params_only_tree(tree, use_ema=True)
    assert set(out) == set(state.params)
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(out["head"])[0]),
        np.asarray(jax.tree_util.tree_leaves(state.ema_core["head"])[0]))

    # bad scope fails loudly
    import pytest

    cfg_bad = tiny_cfg()
    cfg_bad["training"]["ema"] = {"use_ema": True, "scope": "heads"}
    with pytest.raises(ValueError, match="ema.scope"):
        create_trainer(cfg_bad)
