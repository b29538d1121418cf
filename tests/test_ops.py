"""Op-level parity tests: STE gradients, flow_warp vs torch.grid_sample,
bilinear resize vs torch.F.interpolate, depth_to_space vs torch PixelShuffle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from mobilesuperresolution_tpu.ops import (
    avg_pool_2x2,
    binary_mask,
    condition,
    depth_to_space,
    flow_warp,
    mask_active_count,
    resize_bilinear,
    rounding,
)


class TestSTE:
    def test_rounding_basic(self):
        w = jnp.asarray([0.9, 0.6, 0.4, 0.51, 0.1, 0.8, 0.7, 0.55, 0.52, 0.77])
        out = np.asarray(rounding(w, least_channel=3))
        np.testing.assert_array_equal(out, (np.asarray(w) >= 0.5).astype(np.float32))

    def test_rounding_least_channel_floor(self):
        w = jnp.asarray([0.1, 0.2, 0.3, 0.45, 0.05])
        out = np.asarray(rounding(w, least_channel=3))
        # top-3 values 0.45, 0.3, 0.2 survive
        np.testing.assert_array_equal(out, [0.0, 1.0, 1.0, 1.0, 0.0])

    def test_binary_mask_gradient_is_identity(self):
        w = jnp.asarray([0.9, 0.6, 0.4, 0.2, 0.8, 0.3, 0.7, 0.55])
        g = jax.grad(lambda w: jnp.sum(binary_mask(w, 2) * jnp.arange(8.0)))(w)
        np.testing.assert_allclose(np.asarray(g), np.arange(8.0), atol=1e-6)

    def test_condition_forward(self):
        b1, b2 = condition(jnp.asarray(0.7), jnp.asarray(0.3))
        assert float(b1) == 1.0 and float(b2) == 0.0
        b1, b2 = condition(jnp.asarray(0.1), jnp.asarray(0.3))
        assert float(b1) == 0.0 and float(b2) == 1.0

    def test_condition_straight_through_grads(self):
        """Matches torch.autograd.gradcheck semantics of ConditionFunction
        (models/wdsr_b.py:594-616): d beta_i / d alpha_i = 1."""

        def f(a1, a2):
            b1, b2 = condition(a1, a2)
            return 3.0 * b1 + 5.0 * b2

        g1, g2 = jax.grad(f, argnums=(0, 1))(jnp.asarray(0.9), jnp.asarray(0.1))
        assert float(g1) == 3.0 and float(g2) == 5.0

    def test_mask_active_count(self):
        w = jnp.asarray([0.9, 0.6, 0.4, 0.2] * 6)
        assert float(mask_active_count(w)) == 12.0


class TestFlowWarp:
    @pytest.mark.parametrize("padding_mode", ["zeros", "border"])
    def test_matches_torch_grid_sample(self, rng, padding_mode):
        n, h, w, c = 2, 13, 17, 4
        x = rng.standard_normal((n, h, w, c)).astype(np.float32)
        flow = (3.0 * rng.standard_normal((n, h, w, 2))).astype(np.float32)

        got = np.asarray(flow_warp(jnp.asarray(x), jnp.asarray(flow), padding_mode))

        # torch reference: identical math to models/spynet_arch.py:114-126
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        gy, gx = torch.meshgrid(torch.arange(h).float(), torch.arange(w).float(), indexing="ij")
        grid = torch.stack((gx, gy), 2)
        vgrid = grid[None] + torch.from_numpy(flow)
        vx = 2.0 * vgrid[..., 0] / max(w - 1, 1) - 1.0
        vy = 2.0 * vgrid[..., 1] / max(h - 1, 1) - 1.0
        want = F.grid_sample(
            xt,
            torch.stack((vx, vy), dim=3),
            mode="bilinear",
            padding_mode=padding_mode,
            align_corners=True,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_zero_flow_is_identity(self, rng):
        x = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
        out = np.asarray(flow_warp(jnp.asarray(x), jnp.zeros((1, 8, 8, 2), np.float32)))
        np.testing.assert_allclose(out, x, atol=1e-6)


class TestResize:
    @pytest.mark.parametrize("align_corners", [True, False])
    @pytest.mark.parametrize("sizes", [((16, 20), (32, 40)), ((32, 40), (16, 20)), ((15, 17), (31, 35)), ((24, 24), (1080 // 24, 33))])
    def test_matches_torch_interpolate(self, rng, align_corners, sizes):
        (h, w), (oh, ow) = sizes
        x = rng.standard_normal((2, h, w, 3)).astype(np.float32)
        got = np.asarray(resize_bilinear(jnp.asarray(x), (oh, ow), align_corners))
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        want = F.interpolate(
            xt, size=(oh, ow), mode="bilinear", align_corners=align_corners
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_avg_pool_matches_torch(self, rng):
        x = rng.standard_normal((2, 16, 24, 5)).astype(np.float32)
        got = np.asarray(avg_pool_2x2(jnp.asarray(x)))
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        want = F.avg_pool2d(xt, 2, 2).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestDepthToSpace:
    def test_matches_torch_pixel_shuffle(self, rng):
        r = 2
        x = rng.standard_normal((2, 5, 7, 3 * r * r)).astype(np.float32)
        got = np.asarray(depth_to_space(jnp.asarray(x), r))
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        want = F.pixel_shuffle(xt, r).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestSubpixelConvTranspose:
    """SubpixelConvTranspose == nn.ConvTranspose(VALID): same params, same
    output (it is the BasicVSR/MVVSR/single-image reconstruction tail,
    reference models/basicvsr_arch.py:36, mvvsr_arch.py:37,
    single_image_model.py:91)."""

    @pytest.mark.parametrize(
        "K,s,cin,cout,H,W",
        [(5, 4, 48, 3, 9, 11), (5, 2, 32, 3, 7, 8), (3, 4, 8, 5, 6, 6),
         (7, 4, 6, 4, 5, 9), (4, 4, 6, 4, 5, 5), (5, 3, 6, 4, 5, 7)],
    )
    def test_matches_flax_conv_transpose(self, rng, K, s, cin, cout, H, W):
        import flax.linen as nn

        from mobilesuperresolution_tpu.ops.layers import SubpixelConvTranspose

        x = jnp.asarray(rng.standard_normal((2, H, W, cin)), jnp.float32)
        ref_m = nn.ConvTranspose(cout, (K, K), strides=(s, s), padding="VALID")
        v = ref_m.init(jax.random.key(1), x)
        sub_m = SubpixelConvTranspose(cout, K, s)
        v2 = sub_m.init(jax.random.key(1), x)
        # identical param pytree (names, shapes, init values) -> checkpoints
        # interchange between the two forms
        assert jax.tree.structure(v) == jax.tree.structure(v2)
        for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(v2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        ref = ref_m.apply(v, x)
        out = sub_m.apply(v, x)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    def test_gradients_match(self, rng):
        import flax.linen as nn

        from mobilesuperresolution_tpu.ops.layers import SubpixelConvTranspose

        x = jnp.asarray(rng.standard_normal((1, 5, 6, 4)), jnp.float32)
        ref_m = nn.ConvTranspose(3, (5, 5), strides=(4, 4), padding="VALID")
        v = ref_m.init(jax.random.key(0), x)
        g_ref = jax.grad(lambda p: jnp.sum(ref_m.apply(p, x) ** 2))(v)
        g_sub = jax.grad(
            lambda p: jnp.sum(SubpixelConvTranspose(3, 5, 4).apply(p, x) ** 2)
        )(v)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_sub)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_fused_resize_matches_sequential(self, rng):
        """out_hw fused path == resize_bilinear(plain transpose output) —
        the d2s/crop/resize fusion used by the VSR reconstruction tails."""
        from mobilesuperresolution_tpu.ops.layers import SubpixelConvTranspose
        from mobilesuperresolution_tpu.ops.resize import resize_bilinear

        for K, s, H, W, oh, ow, ac in [
            (5, 4, 9, 11, 43, 51, False),
            (5, 2, 7, 8, 20, 22, True),
            (3, 4, 6, 6, 30, 17, False),
        ]:
            x = jnp.asarray(rng.standard_normal((2, H, W, 6)), jnp.float32)
            m = SubpixelConvTranspose(3, K, s)
            v = m.init(jax.random.key(0), x)
            ref = resize_bilinear(m.apply(v, x), (oh, ow), align_corners=ac)
            fused = m.apply(v, x, out_hw=(oh, ow), align_corners=ac)
            np.testing.assert_allclose(
                np.asarray(fused), np.asarray(ref), atol=1e-4
            )


def test_rounding_rejects_undersized_gate():
    import pytest

    from mobilesuperresolution_tpu.ops.ste import rounding

    with pytest.raises(ValueError, match="num_residual_units"):
        rounding(jnp.ones(4), least_channel=8)
