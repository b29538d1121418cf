"""Shape/dtype/gradient tests for the SISR/NAS model families (CPU, tiny
shapes). The VSR families live in tests/test_models_vsr.py — split so each
file fits a bounded per-command runtime on the 1-CPU host (the recurrent
compiles dominate)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobilesuperresolution_tpu.models import (
    BasicModel,
    NASModel,
    ResultNet,
    get_block_status,
    get_current_blocks,
    get_width_from_block_idx,
    get_model,
)


def test_basic_model_shapes():
    m = BasicModel(num_blocks=2, num_residual_units=8, scale=2)
    params = m.init(jax.random.key(0), jnp.zeros((1, 12, 12, 3)))
    out = m.apply(params, jnp.zeros((2, 12, 16, 3)))
    assert out.shape == (2, 24, 32, 3)


def test_basic_model_grad_flows():
    m = BasicModel(num_blocks=2, num_residual_units=8, scale=2)
    x = jnp.ones((1, 8, 8, 3)) * 0.3
    params = m.init(jax.random.key(0), x)

    def loss(p):
        return jnp.mean(jnp.abs(m.apply(p, x) - 0.5))

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(l)) for l in leaves)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


def test_nas_model_forward_and_speed():
    m = NASModel(num_blocks=3, num_residual_units=16, scale=2)
    vs = m.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    out, speed = m.apply(vs, jnp.ones((1, 8, 8, 3)) * 0.4)
    assert out.shape == (1, 16, 16, 3)
    assert float(speed) > 0
    p = vs["params"]
    idx = get_block_status(p)
    assert get_current_blocks(p) == len(idx)
    widths = get_width_from_block_idx(p, idx)
    for wrow in widths:
        assert len(wrow) == 3 and wrow[2] in (3, 5, 7)
        assert 8 <= wrow[0] <= 16  # least_channel floor ≤ active ≤ total


def test_nas_speed_gradient_reaches_alpha2_only():
    """Reference semantics: latency is no-grad; d(speed)/d(alpha2) via beta2
    STE is the only path (speed_models/speed_estimator.py decorators)."""
    m = NASModel(num_blocks=2, num_residual_units=8, scale=2)
    vs = m.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))

    def speed_loss(p):
        _, s = m.apply({"params": p}, jnp.ones((1, 8, 8, 3)) * 0.4)
        return s

    g = jax.grad(speed_loss)(vs["params"])
    assert float(jnp.abs(g["block_0"]["alpha2"])) > 0
    assert float(jnp.abs(g["block_0"]["split_w"]).sum()) == 0
    assert float(jnp.abs(g["mask_w"]).sum()) == 0
    assert float(jnp.abs(g["block_0"]["alpha"]).sum()) == 0


def test_nas_differentiable_speed_reaches_gates():
    m = NASModel(num_blocks=2, num_residual_units=8, scale=2, differentiable_speed=True)
    vs = m.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))

    def speed_loss(p):
        _, s = m.apply({"params": p}, jnp.ones((1, 8, 8, 3)) * 0.4)
        return s

    g = jax.grad(speed_loss)(vs["params"])
    assert float(jnp.abs(g["block_0"]["split_w"]).sum()) > 0
    assert float(jnp.abs(g["block_0"]["alpha"]).sum()) > 0


def test_result_net_shapes():
    m = ResultNet(scale=2, idx=((8, 6, 3), (8, 4, 5)))
    x = jnp.zeros((1, 10, 10, 3))
    params = m.init(jax.random.key(0), x)
    out = m.apply(params, x)
    assert out.shape == (1, 20, 20, 3)


def test_registry_dispatch():
    import argparse

    p = argparse.Namespace(
        model_type="BASIC_MODEL", num_blocks=2, num_residual_units=8, scale=2
    )
    assert isinstance(get_model(p), BasicModel)
    p.model_type = "NAS_MODEL"
    assert isinstance(get_model(p), NASModel)
    with pytest.raises(KeyError):
        get_model(argparse.Namespace(model_type="nope", num_blocks=1, num_residual_units=1, scale=2))


def test_nas_model_with_measured_speed_table():
    from mobilesuperresolution_tpu.nas.speed_estimator import densify_speed_table

    rows = np.asarray(
        [[16, 8, 3, 1.0], [16, 16, 3, 2.0], [16, 8, 7, 5.0], [16, 16, 7, 9.0],
         [16, 8, 5, 3.0], [16, 16, 5, 4.0]],
        np.float32,
    )
    table = jnp.asarray(densify_speed_table(rows, max_ch=16))
    m = NASModel(num_blocks=2, num_residual_units=16, scale=2)
    vs = m.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    out, speed_tab = m.apply(vs, jnp.ones((1, 8, 8, 3)) * 0.4, table)
    _, speed_analytic = m.apply(vs, jnp.ones((1, 8, 8, 3)) * 0.4)
    assert out.shape == (1, 16, 16, 3)
    assert float(speed_tab) > 0
    assert abs(float(speed_tab) - float(speed_analytic)) > 1e-3  # different model

