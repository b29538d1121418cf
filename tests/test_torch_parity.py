"""Architecture-parity check against the reference's pretrained WDSR-B
checkpoint: the torch forward (re-derived from the state dict with plain torch
ops — weight-norm conv chain) and our flax BasicModel with converted weights
must produce the same SR image.

Skips when the reference checkpoint is unavailable.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from mobilesuperresolution_tpu.models.wdsr_basic import BasicModel
from mobilesuperresolution_tpu.train.torch_convert import load_reference_wdsr

CKPT = "/root/reference/models/pretrained_weights/wdsr_b_x2_8_24.pt"

pytestmark = pytest.mark.skipif(
    not os.path.exists(CKPT), reason="reference checkpoint not available"
)


def _torch_forward(sd, x_nchw, image_mean=0.5):
    """WDSR-B forward from the raw state dict (weight-norm applied manually).
    Independent of the reference code — only torch ops."""
    import torch
    import torch.nn.functional as F

    def wn_conv(x, prefix, padding):
        v = sd[f"{prefix}.weight_v"]
        g = sd[f"{prefix}.weight_g"]
        b = sd[f"{prefix}.bias"]
        norm = v.flatten(1).norm(dim=1).view(-1, 1, 1, 1)
        w = g / norm * v
        return F.conv2d(x, w, b, padding=padding)

    x = x_nchw - image_mean
    y = wn_conv(x, "head", 1)
    i = 0
    while f"body.{i}.body.0.weight_v" in sd:
        z = wn_conv(y, f"body.{i}.body.0", 0)
        z = F.relu(z)
        z = wn_conv(z, f"body.{i}.body.2", 0)
        z = wn_conv(z, f"body.{i}.body.3", 1)
        y = y + z
        i += 1
    y = wn_conv(y, "tail", 1)
    y = y + wn_conv(x, "skip.0", 2)
    y = F.pixel_shuffle(y, 2)
    return y + image_mean


def test_pretrained_forward_parity():
    import torch

    sd = torch.load(CKPT, map_location="cpu")
    params, num_blocks, units = load_reference_wdsr(CKPT)
    assert num_blocks == 8 and units == 24

    rng = np.random.default_rng(0)
    x = rng.random((1, 24, 28, 3)).astype(np.float32)

    with torch.no_grad():
        want = (
            _torch_forward(sd, torch.from_numpy(x).permute(0, 3, 1, 2))
            .permute(0, 2, 3, 1)
            .numpy()
        )

    model = BasicModel(num_blocks=num_blocks, num_residual_units=units, scale=2)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_pretrained_sr_quality():
    """Converted pretrained weights must beat bicubic on a real SR task."""
    from mobilesuperresolution_tpu.data.imresize import imresize_np
    from mobilesuperresolution_tpu.data.synthetic import synthetic_image
    from mobilesuperresolution_tpu.metrics import psnr

    params, num_blocks, units = load_reference_wdsr(CKPT)
    model = BasicModel(num_blocks=num_blocks, num_residual_units=units, scale=2)

    hr_u8 = synthetic_image(7, (96, 96))
    lr = imresize_np(hr_u8, scalar_scale=0.5).astype(np.float32) / 255.0
    hr = hr_u8.astype(np.float32) / 255.0
    sr = model.apply({"params": params}, jnp.asarray(lr[None]))
    p_sr = float(psnr(sr, jnp.asarray(hr[None]), shave=8))
    bic = imresize_np(imresize_np(hr_u8, scalar_scale=0.5), scalar_scale=2.0)
    p_bic = float(
        psnr(jnp.asarray(bic[None].astype(np.float32) / 255.0), jnp.asarray(hr[None]), shave=8)
    )
    # trained SR must beat bicubic upscaling
    assert p_sr > p_bic, (p_sr, p_bic)


def _torch_spynet(weights, ref, supp):
    """Torch SpyNet forward written from the reference semantics
    (spynet_arch.py:29-96); shared by the SpyNet and BasicVSR parity tests."""
    import torch
    import torch.nn.functional as F

    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    refs = [(ref - mean) / std]
    supps = [(supp - mean) / std]
    for _ in range(5):
        refs.insert(0, F.avg_pool2d(refs[0], 2, 2, count_include_pad=False))
        supps.insert(0, F.avg_pool2d(supps[0], 2, 2, count_include_pad=False))
    n = ref.shape[0]
    flow = torch.zeros(n, 2, refs[0].shape[2] // 2, refs[0].shape[3] // 2)
    for level in range(6):
        up = (
            F.interpolate(flow, scale_factor=2, mode="bilinear", align_corners=True)
            * 2.0
        )
        if up.shape[2] != refs[level].shape[2]:
            up = F.pad(up, [0, 0, 0, 1], mode="replicate")
        if up.shape[3] != refs[level].shape[3]:
            up = F.pad(up, [0, 1, 0, 0], mode="replicate")
        h, w = supps[level].shape[2:]
        gy, gx = torch.meshgrid(
            torch.arange(h).float(), torch.arange(w).float(), indexing="ij"
        )
        v = torch.stack((gx, gy), 2).unsqueeze(0) + up.permute(0, 2, 3, 1)
        vx = 2.0 * v[..., 0] / max(w - 1, 1) - 1.0
        vy = 2.0 * v[..., 1] / max(h - 1, 1) - 1.0
        warped = F.grid_sample(
            supps[level],
            torch.stack((vx, vy), 3),
            mode="bilinear",
            padding_mode="border",
            align_corners=True,
        )
        x = torch.cat([refs[level], warped, up], 1)
        for j in range(5):
            x = F.conv2d(x, weights[level][j][0], weights[level][j][1], padding=3)
            if j < 4:
                x = F.relu(x)
        flow = x + up
    return flow


class TestSpyNetParity:
    """Full-module SpyNet parity: our flax pyramid (incl. the s2d fast path
    and the replicate-pad odd-level handling) vs a torch forward written
    from the reference semantics (spynet_arch.py:29-96), random weights."""

    def test_random_weight_parity(self):
        import torch

        from mobilesuperresolution_tpu.models.spynet import (
            _SPYNET_CHANNELS,
            SpyNet,
        )

        rng = np.random.default_rng(7)
        # 96x64: multiple of 32 (no input resize), coarsest level 3x2 (odd →
        # exercises the replicate-pad flow upsample AND the non-s2d module
        # path; finer even levels take the s2d path)
        ref = rng.random((2, 96, 64, 3)).astype(np.float32)
        supp = rng.random((2, 96, 64, 3)).astype(np.float32)

        t_weights, params = [], {}
        for level in range(6):
            lw, lp = [], {}
            for j, (cin, cout) in enumerate(_SPYNET_CHANNELS):
                w = (rng.standard_normal((cout, cin, 7, 7)) * 0.05).astype(np.float32)
                b = (rng.standard_normal((cout,)) * 0.05).astype(np.float32)
                lw.append((torch.from_numpy(w), torch.from_numpy(b)))
                lp[f"conv{j}_kernel"] = jnp.asarray(w.transpose(2, 3, 1, 0))
                lp[f"conv{j}_bias"] = jnp.asarray(b)
            t_weights.append(lw)
            params[f"level_{level}"] = lp

        flow_torch = (
            _torch_spynet(
                t_weights,
                torch.from_numpy(ref.transpose(0, 3, 1, 2)),
                torch.from_numpy(supp.transpose(0, 3, 1, 2)),
            )
            .numpy()
            .transpose(0, 2, 3, 1)
        )
        flow_ours = np.asarray(
            SpyNet().apply({"params": params}, jnp.asarray(ref), jnp.asarray(supp))
        )
        assert flow_ours.shape == flow_torch.shape == (2, 96, 64, 2)
        np.testing.assert_allclose(flow_ours, flow_torch, atol=2e-4, rtol=1e-3)


class TestBasicVSROriginParity:
    """Full-model parity of the faithful BasicVSR: our scan-merged,
    direction-stacked flax implementation vs a torch forward written line-by-
    line from the reference (models/basicvsr_arch_origin.py:10-96 — two
    Python recurrences, mmedit-default flow_warp with zeros padding, double
    PixelShuffle reconstruction), sharing one random weight set."""

    def _torch_forward(self, P, x_clip, nf, nb, out_hw):
        import torch
        import torch.nn.functional as F

        def conv(x, path, padding=1):
            w = torch.from_numpy(np.asarray(P[path + "_kernel"]).transpose(3, 2, 0, 1))
            b = torch.from_numpy(np.asarray(P[path + "_bias"]))
            return F.conv2d(x, w, b, padding=padding)

        def plain(x, name, padding=1):
            w = torch.from_numpy(
                np.asarray(P[f"{name}/Conv_0/kernel"]).transpose(3, 2, 0, 1)
            )
            b = torch.from_numpy(np.asarray(P[f"{name}/Conv_0/bias"]))
            return F.conv2d(x, w, b, padding=padding)

        def trunk(x, d):
            pre = f"propagation/trunks/{d}"
            y = F.leaky_relu(conv(x, f"{pre}_conv0"), 0.1)
            for i in range(nb):
                z = F.relu(conv(y, f"{pre}_block{i}_conv1"))
                y = y + conv(z, f"{pre}_block{i}_conv2")
            return y

        def warp(feat, flow_nchw):
            # mmedit flow_warp defaults: bilinear, zeros padding,
            # align_corners=True (used at basicvsr_arch_origin.py:70,82)
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

        spy_w = []
        for level in range(6):
            lw = []
            for j in range(5):
                lw.append(
                    (
                        torch.from_numpy(
                            np.asarray(
                                P[f"spynet/level_{level}/conv{j}_kernel"]
                            ).transpose(3, 2, 0, 1)
                        ),
                        torch.from_numpy(
                            np.asarray(P[f"spynet/level_{level}/conv{j}_bias"])
                        ),
                    )
                )
            spy_w.append(lw)

        b, n, c, h, w = x_clip.shape
        x1 = x_clip[:, :-1].reshape(-1, c, h, w)
        x2 = x_clip[:, 1:].reshape(-1, c, h, w)
        flows_backward = _torch_spynet(spy_w, x1, x2).view(b, n - 1, 2, h, w)
        flows_forward = _torch_spynet(spy_w, x2, x1).view(b, n - 1, 2, h, w)

        out_l = []
        feat_prop = x_clip.new_zeros(b, nf, h, w)
        for i in range(n - 1, -1, -1):
            x_i = x_clip[:, i]
            if i < n - 1:
                feat_prop = warp(feat_prop, flows_backward[:, i])
            feat_prop = trunk(torch.cat([x_i, feat_prop], 1), "backward")
            out_l.insert(0, feat_prop)

        feat_prop = torch.zeros_like(feat_prop)
        for i in range(n):
            x_i = x_clip[:, i]
            if i > 0:
                feat_prop = warp(feat_prop, flows_forward[:, i - 1])
            feat_prop = trunk(torch.cat([x_i, feat_prop], 1), "forward")

            out = torch.cat([out_l[i], feat_prop], 1)
            out = F.leaky_relu(plain(out, "fusion", padding=0), 0.1)
            out = F.leaky_relu(F.pixel_shuffle(plain(out, "upconv1"), 2), 0.1)
            out = F.leaky_relu(F.pixel_shuffle(plain(out, "upconv2"), 2), 0.1)
            out = F.leaky_relu(plain(out, "conv_hr"), 0.1)
            out = plain(out, "conv_last")
            base = F.interpolate(
                x_i, scale_factor=4, mode="bilinear", align_corners=False
            )
            out = out + base
            out = F.interpolate(out, size=out_hw, mode="bilinear")
            out_l[i] = out
        return torch.stack(out_l, 1)

    def test_random_weight_parity(self):
        import torch

        import flax.traverse_util as tu
        import jax

        from mobilesuperresolution_tpu.models.basicvsr import BasicVSROrigin

        nf, nb, t, h, w = 8, 1, 3, 64, 64
        m = BasicVSROrigin(num_feat=nf, num_block=nb, scale=4)
        rng = np.random.default_rng(11)
        x = rng.random((1, t, h, w, 3)).astype(np.float32)
        variables = m.init(jax.random.key(0), jnp.asarray(x), 4 * h, 4 * w)
        flat = {
            "/".join(k): v for k, v in tu.flatten_dict(variables["params"]).items()
        }

        ours = np.asarray(m.apply(variables, jnp.asarray(x), 4 * h, 4 * w))
        with torch.no_grad():
            want = (
                self._torch_forward(
                    flat,
                    torch.from_numpy(x.transpose(0, 1, 4, 2, 3)),
                    nf,
                    nb,
                    (4 * h, 4 * w),
                )
                .numpy()
                .transpose(0, 1, 3, 4, 2)
            )
        assert ours.shape == want.shape == (1, t, 4 * h, 4 * w, 3)
        np.testing.assert_allclose(ours, want, atol=5e-4, rtol=1e-3)


def test_converted_basicvsr_origin_checkpoint():
    """Checkpoint migration: a reference BasicVSR_origin state dict converted
    by train/torch_convert.convert_basicvsr_origin_state_dict must reproduce
    the output of the REFERENCE module itself (imported from
    /root/reference with an mmedit flow_warp shim), randomized weights."""
    import sys
    import types

    import torch
    import torch.nn.functional as F

    import jax

    from mobilesuperresolution_tpu.models.basicvsr import BasicVSROrigin
    from mobilesuperresolution_tpu.train.torch_convert import (
        convert_basicvsr_origin_state_dict,
    )

    def mmedit_flow_warp(feat, flow_hwc, interp_mode="bilinear", padding_mode="zeros"):
        n, _, h, w = feat.shape
        gy, gx = torch.meshgrid(
            torch.arange(h).float(), torch.arange(w).float(), indexing="ij"
        )
        v = torch.stack((gx, gy), 2).unsqueeze(0) + flow_hwc
        vx = 2.0 * v[..., 0] / max(w - 1, 1) - 1.0
        vy = 2.0 * v[..., 1] / max(h - 1, 1) - 1.0
        return F.grid_sample(
            feat,
            torch.stack((vx, vy), 3),
            mode=interp_mode,
            padding_mode=padding_mode,
            align_corners=True,
        )

    if not os.path.isdir("/root/reference/models"):
        pytest.skip("reference source not available")
    shim = types.ModuleType("mmedit.models.common")
    shim.flow_warp = mmedit_flow_warp
    shim.PixelShufflePack = object
    mm = types.ModuleType("mmedit")
    mm_models = types.ModuleType("mmedit.models")
    mm.models = mm_models
    mm_models.common = shim
    saved = {k: sys.modules.get(k) for k in ("mmedit", "mmedit.models", "mmedit.models.common")}
    sys.modules.update(
        {"mmedit": mm, "mmedit.models": mm_models, "mmedit.models.common": shim}
    )
    sys.path.insert(0, "/root/reference")
    try:
        from models.basicvsr_arch_origin import BasicVSR_origin
    finally:
        sys.path.remove("/root/reference")
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v

    nf, nb, t, h, w = 8, 1, 3, 64, 64
    torch.manual_seed(3)
    ref_model = BasicVSR_origin(num_feat=nf, num_block=nb)
    with torch.no_grad():
        for p in ref_model.parameters():
            p.normal_(0, 0.05)
    sd = ref_model.state_dict()

    rng = np.random.default_rng(5)
    x = rng.random((1, t, h, w, 3)).astype(np.float32)
    with torch.no_grad():
        want = (
            ref_model(torch.from_numpy(x.transpose(0, 1, 4, 2, 3)), 4 * h, 4 * w)
            .numpy()
            .transpose(0, 1, 3, 4, 2)
        )

    params, got_nb = convert_basicvsr_origin_state_dict(sd)
    assert got_nb == nb
    m = BasicVSROrigin(num_feat=nf, num_block=nb, scale=4)
    # converted tree must drop into the model's expected structure
    template = m.init(jax.random.key(0), jnp.asarray(x), 4 * h, 4 * w)["params"]
    assert jax.tree_util.tree_structure(
        jax.tree_util.tree_map(np.shape, template)
    ) == jax.tree_util.tree_structure(jax.tree_util.tree_map(np.shape, params))
    ours = np.asarray(m.apply({"params": params}, jnp.asarray(x), 4 * h, 4 * w))
    assert ours.shape == want.shape
    np.testing.assert_allclose(ours, want, atol=5e-4, rtol=1e-3)


def test_convert_standalone_spynet_state_dict():
    """Standalone mmedit SpyNet checkpoints have no 'spynet.' prefix
    (spynet_arch.py:40 loads ['params'] directly) — the converter handles
    both prefixes and the result drops into our SpyNet module."""
    import jax

    from mobilesuperresolution_tpu.models.spynet import _SPYNET_CHANNELS, SpyNet
    from mobilesuperresolution_tpu.train.torch_convert import (
        convert_spynet_state_dict,
    )

    rng = np.random.default_rng(9)
    sd = {}
    for level in range(6):
        for j, (cin, cout) in enumerate(_SPYNET_CHANNELS):
            sd[f"basic_module.{level}.basic_module.{2 * j}.weight"] = (
                rng.standard_normal((cout, cin, 7, 7)).astype(np.float32) * 0.05
            )
            sd[f"basic_module.{level}.basic_module.{2 * j}.bias"] = (
                rng.standard_normal((cout,)).astype(np.float32) * 0.05
            )
    params = convert_spynet_state_dict(sd, prefix="")
    ref = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    supp = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    flow = SpyNet().apply({"params": params}, ref, supp)
    assert flow.shape == (1, 64, 64, 2)
    assert np.isfinite(np.asarray(flow)).all()
    # prefixed form converts identically
    sd_p = {f"spynet.{k}": v for k, v in sd.items()}
    params_p = convert_spynet_state_dict(sd_p, prefix="spynet.")
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params_p)
    ):
        np.testing.assert_array_equal(a, b)


def test_convert_spynet_rejects_unknown_prefix():
    """An unmatched key prefix must fail at conversion, not as a flax
    missing-param error later."""
    from mobilesuperresolution_tpu.train.torch_convert import (
        convert_spynet_state_dict,
    )

    sd = {"module.basic_module.0.basic_module.0.weight": np.zeros((32, 8, 7, 7))}
    with pytest.raises(ValueError, match="no SpyNet keys matched"):
        convert_spynet_state_dict(sd, prefix="")
