"""Checkpoint-migration parity for the remaining reference families
(VERDICT r1 #8): 'single', 'multi' (naive_multi_easy), mvvsr, and the
supernet's shape-greedy pretrained load.

Method (same as tests/test_torch_parity.py): synthesize a random state dict
with the REFERENCE's exact parameter names, run a torch forward written from
the reference semantics (plain torch ops, no reference imports), convert
with train/torch_convert, and require the flax model to reproduce the
output.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from mobilesuperresolution_tpu.train.torch_convert import (  # noqa: E402
    convert_mvvsr_state_dict,
    convert_naive_multi_state_dict,
    convert_single_image_state_dict,
    load_pretrained_supernet,
)


def _t(a):
    return torch.from_numpy(np.asarray(a))


def _rand_wn(rng, cout, cin, k):
    """weight-normed conv triple with the reference's (O,1,1,1) g shape."""
    return {
        "weight_v": (rng.standard_normal((cout, cin, k, k)) * 0.1).astype(np.float32),
        "weight_g": (0.5 + rng.random((cout, 1, 1, 1))).astype(np.float32),
        "bias": (rng.standard_normal((cout,)) * 0.1).astype(np.float32),
    }


def _rand_plain(rng, cout, cin, k):
    return {
        "weight": (rng.standard_normal((cout, cin, k, k)) * 0.1).astype(np.float32),
        "bias": (rng.standard_normal((cout,)) * 0.1).astype(np.float32),
    }


def _add(sd, prefix, entries):
    for k, v in entries.items():
        sd[f"{prefix}.{k}"] = v


def _wn_fwd(sd, prefix, x, padding):
    v = _t(sd[f"{prefix}.weight_v"])
    g = _t(sd[f"{prefix}.weight_g"]).view(-1, 1, 1, 1)
    b = _t(sd[f"{prefix}.bias"])
    w = g / v.flatten(1).norm(dim=1).view(-1, 1, 1, 1) * v
    return F.conv2d(x, w, b, padding=padding)


def _plain_fwd(sd, prefix, x, padding):
    return F.conv2d(x, _t(sd[f"{prefix}.weight"]), _t(sd[f"{prefix}.bias"]), padding=padding)


def _warp(feat, flow_nchw):
    """mmedit flow_warp defaults: bilinear, zeros padding, align_corners=True."""
    n, _, h, w = feat.shape
    gy, gx = torch.meshgrid(
        torch.arange(h).float(), torch.arange(w).float(), indexing="ij"
    )
    v = torch.stack((gx, gy), 2).unsqueeze(0) + flow_nchw.permute(0, 2, 3, 1)
    vx = 2.0 * v[..., 0] / max(w - 1, 1) - 1.0
    vy = 2.0 * v[..., 1] / max(h - 1, 1) - 1.0
    return F.grid_sample(
        feat,
        torch.stack((vx, vy), 3),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=True,
    )


class TestSingleImageMigration:
    """'single' Result_Model (single_image_model.py:20-108)."""

    CH, BLOCKS, SCALE = 8, 2, 4

    def _state_dict(self, rng):
        sd = {}
        _add(sd, "encoder", _rand_wn(rng, self.CH, 3, 3))
        for i in range(self.BLOCKS):
            _add(sd, f"body.{i}.body.0.body.0", _rand_wn(rng, self.CH, self.CH, 3))
            _add(sd, f"body.{i}.body.0.body.2", _rand_wn(rng, self.CH, self.CH, 3))
        _add(sd, f"body.{self.BLOCKS}", _rand_wn(rng, self.CH, self.CH, 3))
        _add(sd, "skip", _rand_wn(rng, self.SCALE**2 * 3, 3, 5))  # dead
        sd["shuf.0.weight"] = (
            rng.standard_normal((self.CH, 3, 5, 5)) * 0.1
        ).astype(np.float32)
        sd["shuf.0.bias"] = (rng.standard_normal((3,)) * 0.1).astype(np.float32)
        return sd

    def _torch_forward(self, sd, x_clip, out_hw):
        b, n, c, h, w = x_clip.shape
        outs = []
        for i in range(n):
            x = x_clip[:, i]
            enc = _wn_fwd(sd, "encoder", x, 1)
            y = enc
            for j in range(self.BLOCKS):
                z = F.relu(_wn_fwd(sd, f"body.{j}.body.0.body.0", y, 1))
                z = _wn_fwd(sd, f"body.{j}.body.0.body.2", z, 1)
                y = z + y
            y = _wn_fwd(sd, f"body.{self.BLOCKS}", y, 1)
            y = y + enc
            y = F.conv_transpose2d(
                y, _t(sd["shuf.0.weight"]), _t(sd["shuf.0.bias"]), stride=self.SCALE
            )
            y = F.interpolate(y, size=out_hw, mode="bilinear")
            outs.append(y)
        return torch.stack(outs, 1)

    def test_parity(self):
        from mobilesuperresolution_tpu.models.single_image import SingleImageModel

        rng = np.random.default_rng(3)
        sd = self._state_dict(rng)
        params, blocks, ch = convert_single_image_state_dict(sd)
        assert (blocks, ch) == (self.BLOCKS, self.CH)

        t, h, w = 2, 16, 20
        oh, ow = self.SCALE * h, self.SCALE * w
        x = rng.random((1, t, h, w, 3)).astype(np.float32)
        m = SingleImageModel(scale=self.SCALE, channel=ch, blocks=blocks)
        ours = np.asarray(m.apply({"params": params}, jnp.asarray(x), oh, ow))
        with torch.no_grad():
            want = (
                self._torch_forward(
                    sd, _t(x.transpose(0, 1, 4, 2, 3)), (oh, ow)
                )
                .numpy()
                .transpose(0, 1, 3, 4, 2)
            )
        np.testing.assert_allclose(ours, want, atol=2e-4, rtol=1e-3)


class TestNaiveMultiMigration:
    """'multi' Naive_model (naive_multi_model_easy.py:34-154), the VSR type
    the entry points actually use."""

    CH, SCALE = 8, 4
    IDX = ((8, 8, 3), (8, 7, 3))

    def _state_dict(self, rng):
        from mobilesuperresolution_tpu.models.spynet import _SPYNET_CHANNELS

        sd = {}
        for level in range(6):
            for j, (cin, cout) in enumerate(_SPYNET_CHANNELS):
                sd[f"flownet.basic_module.{level}.basic_module.{2 * j}.weight"] = (
                    rng.standard_normal((cout, cin, 7, 7)) * 0.05
                ).astype(np.float32)
                sd[f"flownet.basic_module.{level}.basic_module.{2 * j}.bias"] = (
                    rng.standard_normal((cout,)) * 0.05
                ).astype(np.float32)
        _add(sd, "encode", _rand_wn(rng, self.CH, 3, 3))
        for i, (cin, split, k) in enumerate(self.IDX):
            block_in = 2 * self.CH + 2 if i == 0 else self.CH
            _add(sd, f"body.{i}.body.0", _rand_plain(rng, self.CH, block_in, k))
            _add(sd, f"body.{i}.body.2", _rand_plain(rng, self.CH, self.CH, k))
            _add(sd, f"body.{i}.skip", _rand_plain(rng, block_in, 2 * block_in, 1))  # dead
        _add(sd, "decode", _rand_wn(rng, self.SCALE**2 * 3, self.CH, 3))
        _add(sd, "skip", _rand_wn(rng, self.SCALE**2 * 3, 3, 5))  # dead
        return sd

    def _torch_forward(self, sd, x_clip, spy_w):
        from tests.test_torch_parity import _torch_spynet

        b, n, c, h, w = x_clip.shape
        x1 = x_clip[:, :-1].reshape(-1, c, h, w)
        x2 = x_clip[:, 1:].reshape(-1, c, h, w)
        flows_forward = _torch_spynet(spy_w, x2, x1).view(b, n - 1, 2, h, w)
        outs = []
        pre_feats = None
        for image in range(n):
            x = x_clip[:, image]
            res = x
            x_ = _wn_fwd(sd, "encode", x, 1)
            for idx in range(len(self.IDX)):
                if idx == 0:
                    if image == 0:
                        x_warp = x_
                        flow = torch.zeros(b, 2, h, w)
                        pre_feats = x_
                    else:
                        x_pre = pre_feats
                        pre_feats = x_
                        flow = flows_forward[:, image - 1]
                        x_warp = _warp(x_pre, flow)
                    x_c = torch.cat((flow, x_warp, x_), dim=1)
                else:
                    x_c = x_
                k = self.IDX[idx][2]
                z = F.relu(_plain_fwd(sd, f"body.{idx}.body.0", x_c, k // 2))
                z = _plain_fwd(sd, f"body.{idx}.body.2", z, k // 2)
                x_ = z + x_
            base = F.interpolate(
                res, scale_factor=4, mode="bilinear", align_corners=False
            )
            y = _wn_fwd(sd, "decode", x_, 1)
            y = F.pixel_shuffle(y, self.SCALE) + base
            outs.append(y)
        return torch.stack(outs, 1)

    def test_parity(self):
        from mobilesuperresolution_tpu.models.naive_multi import NaiveMultiModel

        rng = np.random.default_rng(5)
        sd = self._state_dict(rng)
        params, blocks = convert_naive_multi_state_dict(sd)
        assert blocks == len(self.IDX)

        spy_w = []
        for level in range(6):
            lw = []
            for j in range(5):
                lw.append(
                    (
                        _t(sd[f"flownet.basic_module.{level}.basic_module.{2 * j}.weight"]),
                        _t(sd[f"flownet.basic_module.{level}.basic_module.{2 * j}.bias"]),
                    )
                )
            spy_w.append(lw)

        t, h, w = 3, 64, 64
        x = rng.random((1, t, h, w, 3)).astype(np.float32)
        m = NaiveMultiModel(scale=self.SCALE, idx=self.IDX)
        ours = np.asarray(m.apply({"params": params}, jnp.asarray(x)))
        with torch.no_grad():
            want = (
                self._torch_forward(sd, _t(x.transpose(0, 1, 4, 2, 3)), spy_w)
                .numpy()
                .transpose(0, 1, 3, 4, 2)
            )
        assert ours.shape == want.shape
        np.testing.assert_allclose(ours, want, atol=5e-4, rtol=1e-3)


class TestMVVSRMigration:
    """MotionVectorVSR (mvvsr_arch.py:11-109): flows from the bitstream."""

    NF, NB, SCALE = 8, 1, 4

    def _state_dict(self, rng):
        sd = {}
        for d in ("backward", "forward"):
            _add(sd, f"{d}_trunk.main.0", _rand_plain(rng, self.NF, self.NF + 3, 3))
            for i in range(self.NB):
                _add(sd, f"{d}_trunk.main.2.{i}.conv1", _rand_plain(rng, self.NF, self.NF, 3))
                _add(sd, f"{d}_trunk.main.2.{i}.conv2", _rand_plain(rng, self.NF, self.NF, 3))
        _add(sd, "fusion", _rand_plain(rng, 2 * self.NF, 2 * self.NF, 1))
        # dead reference modules the converter must tolerate and drop
        _add(sd, "upconv1", _rand_plain(rng, 4 * self.NF, self.NF, 3))
        _add(sd, "conv_hr", _rand_plain(rng, self.NF, self.NF, 3))
        sd["conv_last.weight"] = (
            rng.standard_normal((2 * self.NF, 3, 5, 5)) * 0.1
        ).astype(np.float32)
        sd["conv_last.bias"] = (rng.standard_normal((3,)) * 0.1).astype(np.float32)
        return sd

    def _trunk(self, sd, x, d):
        y = F.leaky_relu(_plain_fwd(sd, f"{d}_trunk.main.0", x, 1), 0.1)
        for i in range(self.NB):
            z = F.relu(_plain_fwd(sd, f"{d}_trunk.main.2.{i}.conv1", y, 1))
            y = y + _plain_fwd(sd, f"{d}_trunk.main.2.{i}.conv2", z, 1)
        return y

    def _torch_forward(self, sd, x_mv, out_hw):
        x = x_mv[:, :, :3]
        mv = x_mv[:, :, 3:]
        flows_forward = mv[:, 1:]
        flows_backward = flows_forward * (-1)
        b, n, _, h, w = x.shape

        out_l = []
        feat_prop = x.new_zeros(b, self.NF, h, w)
        for i in range(n - 1, -1, -1):
            x_i = x[:, i]
            if i < n - 1:
                feat_prop = _warp(feat_prop, flows_backward[:, i])
            feat_prop = self._trunk(sd, torch.cat([x_i, feat_prop], 1), "backward")
            out_l.insert(0, feat_prop)

        feat_prop = torch.zeros_like(feat_prop)
        for i in range(n):
            x_i = x[:, i]
            if i > 0:
                feat_prop = _warp(feat_prop, flows_forward[:, i - 1])
            feat_prop = self._trunk(sd, torch.cat([x_i, feat_prop], 1), "forward")
            out = torch.cat([out_l[i], feat_prop], 1)
            out = F.leaky_relu(_plain_fwd(sd, "fusion", out, 0), 0.1)
            out = F.conv_transpose2d(
                out, _t(sd["conv_last.weight"]), _t(sd["conv_last.bias"]),
                stride=self.SCALE,
            )
            out = F.interpolate(out, size=out_hw, mode="bilinear")
            base = F.interpolate(
                x_i, size=out_hw, mode="bilinear", align_corners=False
            )
            out_l[i] = out + base
        return torch.stack(out_l, 1)

    def test_parity(self):
        from mobilesuperresolution_tpu.models.mvvsr import MotionVectorVSR

        rng = np.random.default_rng(9)
        sd = self._state_dict(rng)
        params, nb = convert_mvvsr_state_dict(sd)
        assert nb == self.NB
        assert "upconv1" not in params and "conv_hr" not in params

        t, h, w = 3, 16, 16
        oh, ow = self.SCALE * h, self.SCALE * w
        x = rng.random((1, t, h, w, 3)).astype(np.float32)
        mv = (rng.random((1, t, h, w, 2)).astype(np.float32) - 0.5) * 4
        x_mv = np.concatenate([x, mv], axis=-1)
        m = MotionVectorVSR(scale=self.SCALE, num_feat=self.NF, num_block=self.NB)
        ours = np.asarray(m.apply({"params": params}, jnp.asarray(x_mv), oh, ow))
        x_mv_t = _t(x_mv.transpose(0, 1, 4, 2, 3))
        with torch.no_grad():
            want = (
                self._torch_forward(sd, x_mv_t, (oh, ow))
                .numpy()
                .transpose(0, 1, 3, 4, 2)
            )
        assert ours.shape == want.shape
        np.testing.assert_allclose(ours, want, atol=5e-4, rtol=1e-3)


class TestSupernetPretrainedLoad:
    """Shape-greedy pretrained load (wdsr_b.py:235-250): the WDSR-B
    checkpoint's head/tail/skip transfer into the supernet; everything else
    stays put."""

    def test_transfer(self):
        from mobilesuperresolution_tpu.models.wdsr_nas import NASModel

        rng = np.random.default_rng(21)
        units, scale = 8, 2
        sd = {}
        _add(sd, "head", _rand_wn(rng, units, 3, 3))
        for i in range(2):  # WDSR-B block shapes never match the supernet's
            _add(sd, f"body.{i}.body.0", _rand_wn(rng, 6 * units, units, 1))
            _add(sd, f"body.{i}.body.2", _rand_wn(rng, int(0.8 * units), 6 * units, 1))
            _add(sd, f"body.{i}.body.3", _rand_wn(rng, units, int(0.8 * units), 3))
        _add(sd, "tail", _rand_wn(rng, scale**2 * 3, units, 3))
        _add(sd, "skip.0", _rand_wn(rng, scale**2 * 3, 3, 5))

        m = NASModel(num_blocks=2, num_residual_units=units, scale=scale)
        variables = jax.jit(m.init)(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
        params = variables["params"]
        new, copied = load_pretrained_supernet(params, sd)
        assert copied == 9  # head/tail/skip x (v, g, b)
        for ours, theirs in (("head", "head"), ("tail", "tail"), ("skip", "skip.0")):
            np.testing.assert_allclose(
                np.asarray(new[ours]["v"]),
                np.asarray(sd[f"{theirs}.weight_v"]).transpose(2, 3, 1, 0),
            )
        # untouched leaves (block internals, gates) are the originals
        np.testing.assert_array_equal(
            np.asarray(new["mask_w"]), np.asarray(params["mask_w"])
        )
        np.testing.assert_array_equal(
            np.asarray(
                new["block_0"]["Conv_sep_0"]["WNConv_0"]["v"]
                if "Conv_sep_0" in new["block_0"]
                else list(new["block_0"].values())[0]
            ).ravel()[:4],
            np.asarray(
                params["block_0"]["Conv_sep_0"]["WNConv_0"]["v"]
                if "Conv_sep_0" in params["block_0"]
                else list(params["block_0"].values())[0]
            ).ravel()[:4],
        )
        # the loaded supernet still runs and returns (sr, speed)
        sr, speed = m.apply({"params": new}, jnp.zeros((1, 16, 16, 3)))
        assert sr.shape == (1, 32, 32, 3)

    def test_mismatched_shapes_skipped(self):
        from mobilesuperresolution_tpu.models.wdsr_nas import NASModel

        rng = np.random.default_rng(22)
        sd = {}
        _add(sd, "head", _rand_wn(rng, 16, 3, 3))  # units mismatch: 16 vs 8
        _add(sd, "tail", _rand_wn(rng, 12, 16, 3))
        _add(sd, "skip.0", _rand_wn(rng, 12, 3, 5))
        m = NASModel(num_blocks=1, num_residual_units=8, scale=2)
        variables = jax.jit(m.init)(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
        params = variables["params"]
        new, copied = load_pretrained_supernet(params, sd)
        # head (16 vs 8 out) and tail (16 vs 8 in) mismatch; only the 5x5
        # skip (3 -> 12, unit-independent) matches shape and transfers
        assert copied == 3
        np.testing.assert_array_equal(
            np.asarray(new["head"]["v"]), np.asarray(params["head"]["v"])
        )
        np.testing.assert_array_equal(
            np.asarray(new["tail"]["v"]), np.asarray(params["tail"]["v"])
        )
