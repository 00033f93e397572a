"""Round-4 hardening: CP's dense fallback is no longer silent (VERDICT r3
weak #5 / next #7) — a warning fires at trace time when a configured
context axis cannot divide the sequence, and the config validator rejects
the pipe x context combination whose stages would always hit that cliff.
"""

import copy
import warnings

import numpy as np
import pytest

import jax

from multimodal_diffusion_tpu.models.mmdit import Attention
from multimodal_diffusion_tpu.parallel.mesh import make_mesh

from tests._tiny import tiny_cfg


@pytest.fixture(scope="module")
def ctx_mesh():
    return make_mesh(data=1, model=1, context=8)


def test_cp_dense_fallback_warns(ctx_mesh):
    """context_axis configured but N % n_ctx != 0: the Attention module must
    fall back to dense attention AND say so (it used to be silent)."""
    attn = Attention(n_heads=4, mesh=ctx_mesh, context_axis="context")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 64))  # 5 % 8 != 0

    # init is exempt: param init legitimately runs at minimal shapes
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        params = attn.init({"params": jax.random.PRNGKey(1)}, x)["params"]

    with pytest.warns(RuntimeWarning, match="not divisible"):
        out = attn.apply({"params": params}, x)
    assert np.isfinite(np.asarray(out)).all()


def test_cp_divisible_sequence_does_not_warn(ctx_mesh):
    attn = Attention(n_heads=4, mesh=ctx_mesh, context_axis="context")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 64))  # 16 % 8 == 0
    params = attn.init({"params": jax.random.PRNGKey(1)}, x)["params"]
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        out = jax.jit(lambda p, x: attn.apply({"params": p}, x))(params, x)
    assert np.isfinite(np.asarray(out)).all()


def test_validator_rejects_pipe_with_context():
    from configs.validate_config import validate

    cfg = copy.deepcopy(tiny_cfg())
    cfg["parallel"] = {"data": 2, "model": 1, "pipe": 2, "context": 2}
    errs = validate(cfg)
    assert any("pipe" in e and "context" in e for e in errs), errs

    cfg["parallel"] = {"data": 4, "model": 1, "pipe": 2, "context": 1}
    assert not any("pipe" in e and "context" in e for e in validate(cfg))
