"""Shape/dtype/gradient tests for the VSR model families (CPU, tiny
shapes) — split from tests/test_models.py (SISR/NAS) so each file fits a
bounded per-command runtime on the 1-CPU host (the recurrent compiles
dominate)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobilesuperresolution_tpu.models import (
    BasicVSR,
    NaiveMultiModel,
    SpyNet,
    get_vsr_model,
)


def test_spynet_output_shape_and_scale():
    m = SpyNet()
    x = jnp.zeros((2, 40, 48, 3))
    params = m.init(jax.random.key(0), x, x)
    flow = m.apply(params, x, x)
    assert flow.shape == (2, 40, 48, 2)
    # identical inputs → near-zero flow on an untrained net is not guaranteed,
    # but output must be finite
    assert np.all(np.isfinite(np.asarray(flow)))


@pytest.mark.parametrize("model_type", ["basic", "basic_mv", "single", "basic_origin"])
def test_vsr_models_shapes(model_type):
    t, h, w = 3, 16, 16
    c_in = 5 if model_type == "basic_mv" else 3
    m = get_vsr_model(model_type, scale=4)
    x = jnp.zeros((1, t, h, w, c_in))
    params = m.init(jax.random.key(0), x, h * 4, w * 4)
    out = m.apply(params, x, h * 4, w * 4)
    assert out.shape == (1, t, h * 4, w * 4, 3)


def test_naive_multi_from_artifact(tmp_path):
    art = tmp_path / "block_index.txt"
    art.write_text("[0, 1]:[[8, 8, 3], [8, 6, 5]]\n")
    m = NaiveMultiModel.from_artifact(str(art), scale=4)
    x = jnp.zeros((1, 3, 12, 12, 3))
    params = m.init(jax.random.key(0), x)
    out = m.apply(params, x)
    assert out.shape == (1, 3, 48, 48, 3)
    # scale != 4 must work too (the bilinear base was hardcoded to 4x once —
    # the export CLI defaults to scale 2)
    m2 = NaiveMultiModel.from_artifact(str(art), scale=2)
    out2 = m2.apply(m2.init(jax.random.key(0), x), x)
    assert out2.shape == (1, 3, 24, 24, 3)


def test_vsr_single_frame_clip():
    """T=1 clips: empty flow sequence must still propagate (found by probe)."""
    m = get_vsr_model("basic", scale=4)
    x = jnp.zeros((1, 1, 16, 16, 3))
    params = m.init(jax.random.key(0), x, 64, 64)
    out = m.apply(params, x, 64, 64)
    assert out.shape == (1, 1, 64, 64, 3)


def test_naive_multi_v1(tmp_path):
    from mobilesuperresolution_tpu.models.naive_multi_v1 import NaiveMultiModelV1

    art = tmp_path / "block_index.txt"
    art.write_text("([0, 1], [[8, 8, 3], [8, 6, 5]])\n")
    m = NaiveMultiModelV1.from_artifact(str(art), scale=4)
    x = jnp.zeros((1, 3, 12, 12, 3))
    params = m.init(jax.random.key(0), x)
    out = m.apply(params, x)
    assert out.shape == (1, 3, 48, 48, 3)


def test_basicvsr_remat_grads_match():
    """remat=True must give identical grads to remat=False (same params)."""
    from mobilesuperresolution_tpu.models.basicvsr import BasicVSR

    x = jnp.asarray(
        np.random.default_rng(0).random((1, 3, 8, 8, 3)), dtype=jnp.float32
    )
    m_plain = BasicVSR(num_feat=8, num_block=1, scale=4)
    m_remat = BasicVSR(num_feat=8, num_block=1, scale=4, remat=True)
    vs = jax.jit(m_plain.init, static_argnums=(2, 3))(jax.random.key(0), x, 32, 32)

    def loss(m, p):
        return jnp.mean(jnp.abs(m.apply({"params": p}, x, 32, 32)))

    g1 = jax.grad(lambda p: loss(m_plain, p))(vs["params"])
    g2 = jax.grad(lambda p: loss(m_remat, p))(vs["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_basicvsr_stop_flow_grad_exact_for_trainables():
    """stop_flow_grad=True must (a) leave the forward bitwise-identical, (b)
    leave every NON-spynet gradient identical — flows depend only on the
    input and the (frozen-in-training) SpyNet params, so no trainable
    gradient path crosses them — and (c) zero the spynet gradients (the
    backward work the flag removes; torch skips it via requires_grad=False,
    naive_multi_model_easy.py:48-49 / train_video_superresolution.py:
    160-163)."""
    from mobilesuperresolution_tpu.models.basicvsr import BasicVSR

    x = jnp.asarray(
        np.random.default_rng(1).random((1, 3, 8, 8, 3)), dtype=jnp.float32
    )
    m_plain = BasicVSR(num_feat=8, num_block=1, scale=4)
    m_stop = BasicVSR(num_feat=8, num_block=1, scale=4, stop_flow_grad=True)
    vs = jax.jit(m_plain.init, static_argnums=(2, 3))(jax.random.key(2), x, 32, 32)

    np.testing.assert_array_equal(
        np.asarray(m_plain.apply(vs, x, 32, 32)),
        np.asarray(m_stop.apply(vs, x, 32, 32)),
    )

    def loss(m, p):
        return jnp.mean(jnp.abs(m.apply({"params": p}, x, 32, 32)))

    g1 = jax.grad(lambda p: loss(m_plain, p))(vs["params"])
    g2 = jax.grad(lambda p: loss(m_stop, p))(vs["params"])
    for k in g1:
        if k == "spynet":
            continue
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6
            ),
            g1[k],
            g2[k],
        )
    assert all(
        float(jnp.abs(leaf).max()) == 0.0
        for leaf in jax.tree_util.tree_leaves(g2["spynet"])
    )
    # and the plain path DOES produce non-zero spynet grads (the work saved)
    assert any(
        float(jnp.abs(leaf).max()) > 0.0
        for leaf in jax.tree_util.tree_leaves(g1["spynet"])
    )


def test_get_vsr_model_remat_wiring():
    """--remat reaches the recurrent family through the registry and is
    rejected (not silently ignored) for frame-parallel types."""
    import pytest

    from mobilesuperresolution_tpu.models import get_vsr_model

    for mt in ("basic", "basic_mv", "basic_origin"):
        assert get_vsr_model(mt, scale=4, remat=True).remat is True
        assert get_vsr_model(mt, scale=4).remat is False
    with pytest.raises(ValueError, match="remat"):
        get_vsr_model("single", scale=4, remat=True)


class TestFlowDownscale:
    """BasicVSRBase.flow_downscale: half-res SpyNet with upsampled flows —
    same params (checkpoint-compatible), approximate flows."""

    def test_param_tree_identical_and_output_close(self):
        t, h, w = 4, 16, 16
        m1 = get_vsr_model("basic", scale=2)
        m2 = get_vsr_model("basic", scale=2, flow_downscale=2)
        x = jnp.asarray(np.random.default_rng(3).random((1, t, h, w, 3)), jnp.float32)
        p1 = m1.init(jax.random.key(0), x, h * 2, w * 2)
        p2 = m2.init(jax.random.key(0), x, h * 2, w * 2)
        assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(p2)
        for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
            assert a.shape == b.shape
        o1 = np.asarray(m1.apply(p1, x, h * 2, w * 2))
        # apply the d=1 weights under d=2 — the deployment scenario
        o2 = np.asarray(m2.apply(p1, x, h * 2, w * 2))
        assert o2.shape == o1.shape
        assert np.isfinite(o2).all()
        # flows are approximate, not garbage
        assert float(np.mean(np.abs(o2 - o1))) < 0.05

    def test_rejected_for_models_without_spynet(self):
        with pytest.raises(ValueError, match="flow_downscale"):
            get_vsr_model("single", scale=2, flow_downscale=2)
        with pytest.raises(ValueError, match="flow_downscale"):
            get_vsr_model("basic_mv", scale=2, flow_downscale=2)

    def test_rejects_nonpositive_downscale(self):
        with pytest.raises(ValueError, match=">= 1"):
            get_vsr_model("basic", scale=2, flow_downscale=0)

    def test_naive_multi_flow_downscale(self, tmp_path):
        art = tmp_path / "block_index.txt"
        art.write_text("[0, 1]:[[8, 8, 3], [8, 6, 5]]\n")
        m1 = get_vsr_model("multi", scale=4, block_index_path=str(art))
        m2 = get_vsr_model(
            "multi", scale=4, block_index_path=str(art), flow_downscale=2
        )
        x = jnp.asarray(np.random.default_rng(4).random((1, 3, 12, 12, 3)), jnp.float32)
        p1 = m1.init(jax.random.key(0), x)
        o1 = np.asarray(m1.apply(p1, x))
        o2 = np.asarray(m2.apply(p1, x))  # same params under d=2
        assert o2.shape == o1.shape
        assert np.isfinite(o2).all()
        assert float(np.mean(np.abs(o2 - o1))) < 0.05


class TestTemporalChunking:
    """parallel/temporal.py: bounded-memory long-clip inference."""

    def _fwd(self, m, params):
        def f(x, oh, ow):
            return m.apply(params, x, oh, ow)

        return f

    def test_frame_parallel_model_is_exact(self):
        from mobilesuperresolution_tpu.parallel.temporal import chunked_vsr_apply

        t, h, w = 9, 8, 8
        m = get_vsr_model("single", scale=2)
        x = jnp.asarray(np.random.default_rng(0).random((1, t, h, w, 3)), jnp.float32)
        params = m.init(jax.random.key(0), x, h * 2, w * 2)
        full = m.apply(params, x, h * 2, w * 2)
        chunked = chunked_vsr_apply(
            self._fwd(m, params), x, h * 2, w * 2, chunk=2, overlap=1
        )
        assert chunked.shape == full.shape
        np.testing.assert_allclose(np.asarray(chunked), np.asarray(full), atol=1e-5)

    def test_recurrent_error_bounded_and_monotone_in_overlap(self):
        from mobilesuperresolution_tpu.parallel.temporal import chunked_vsr_apply

        t, h, w = 10, 8, 8
        m = get_vsr_model("basic", scale=2)
        x = jnp.asarray(np.random.default_rng(1).random((1, t, h, w, 3)), jnp.float32)
        params = m.init(jax.random.key(0), x, h * 2, w * 2)
        full = np.asarray(m.apply(params, x, h * 2, w * 2))

        def err(overlap):
            out = chunked_vsr_apply(
                self._fwd(m, params), x, h * 2, w * 2, chunk=2, overlap=overlap
            )
            return float(np.mean(np.abs(np.asarray(out) - full)))

        e1, e3 = err(1), err(3)
        assert e3 <= e1 + 1e-6  # more context → closer to full-clip forward
        assert e3 < 0.02  # propagated features decay: small residual error

    def test_mesh_sharded_windows_match_serial(self):
        """mesh= folds window groups into the batch dim sharded on 'data' —
        must produce the same frames as the serial window loop."""
        from mobilesuperresolution_tpu.parallel import make_mesh
        from mobilesuperresolution_tpu.parallel.temporal import chunked_vsr_apply

        t, h, w = 11, 8, 8
        m = get_vsr_model("basic", scale=2)
        x = jnp.asarray(np.random.default_rng(2).random((1, t, h, w, 3)), jnp.float32)
        params = m.init(jax.random.key(0), x, h * 2, w * 2)
        fwd = self._fwd(m, params)
        serial = chunked_vsr_apply(fwd, x, h * 2, w * 2, chunk=2, overlap=2)
        mesh = make_mesh(data=8)
        sharded = chunked_vsr_apply(
            fwd, x, h * 2, w * 2, chunk=2, overlap=2, mesh=mesh
        )
        assert sharded.shape == (1, t, h * 2, w * 2, 3)
        np.testing.assert_allclose(
            np.asarray(sharded), np.asarray(serial), atol=1e-5
        )

    def test_invalid_args_rejected(self):
        from mobilesuperresolution_tpu.parallel.temporal import chunked_vsr_apply

        x = jnp.zeros((1, 8, 8, 8, 3))
        with pytest.raises(ValueError, match="chunk"):
            chunked_vsr_apply(lambda a, oh, ow: a, x, 16, 16, chunk=0)
        with pytest.raises(ValueError, match="overlap"):
            chunked_vsr_apply(lambda a, oh, ow: a, x, 16, 16, chunk=2, overlap=-1)

    def test_whole_clip_passthrough(self):
        from mobilesuperresolution_tpu.parallel.temporal import chunked_vsr_apply

        t, h, w = 4, 8, 8
        m = get_vsr_model("single", scale=2)
        x = jnp.zeros((1, t, h, w, 3))
        params = m.init(jax.random.key(0), x, h * 2, w * 2)
        out = chunked_vsr_apply(
            self._fwd(m, params), x, h * 2, w * 2, chunk=t, overlap=2
        )
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(m.apply(params, x, h * 2, w * 2))
        )


def test_basic_origin_rejects_non_x4():
    import pytest

    from mobilesuperresolution_tpu.models import get_vsr_model

    with pytest.raises(ValueError, match="x4"):
        get_vsr_model("basic_origin", scale=2)

