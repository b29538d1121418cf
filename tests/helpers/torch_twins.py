"""Functional torch twins of the reference's training stacks — shared by
the lockstep training-parity tests (tests/test_training_parity.py) and the
convergence-artifact generator (scripts/make_convergence_artifacts.py).

Written from the reference's SEMANTICS with raw tensors +
torch.nn.functional (never imported from /root/reference): WDSR-B
(models/basic_wdsr_b.py:16-144) and the NAS supernet (models/wdsr_b.py:30-137,
405-616, models/ops.py:7-43).
"""

import numpy as np
import torch
import torch.nn.functional as F


def _t(a, grad=True):
    t = torch.from_numpy(np.array(a, np.float32))
    t.requires_grad_(grad)
    return t


def _wn_weight(v, g):
    """torch weight_norm(dim=0) effective kernel from raw (v: OIHW, g: (O,))."""
    norm = v.flatten(1).norm(dim=1)
    return (g / norm).view(-1, 1, 1, 1) * v


def _wn_conv(x, p, k, groups=1):
    return F.conv2d(x, _wn_weight(p["v"], p["g"]), p["b"], padding=k // 2, groups=groups)


def _flax_wn_to_torch(p, grad=True):
    """Our WNConv {v (k,k,i,o), g (o,), b (o,)} → torch tensors (v OIHW)."""
    return {
        "v": _t(np.transpose(np.asarray(p["v"]), (3, 2, 0, 1)), grad),
        "g": _t(np.asarray(p["g"]), grad),
        "b": _t(np.asarray(p["b"]), grad),
    }



class _TorchWdsrTwin:
    """Functional WDSR-B twin over a flat torch-tensor tree converted from our
    flax init (reference forward: models/basic_wdsr_b.py:16-144; train step:
    pretrain.py:61-82 — Adam + MultiStepLR([E/2, 9E/10], 0.3))."""

    def __init__(self, flax_params, num_blocks, scale=2, image_mean=0.5):
        self.nb = num_blocks
        self.scale = scale
        self.mean = image_mean
        self.p = {"head": _flax_wn_to_torch(flax_params["WNConv_0"])}
        for i in range(num_blocks):
            b = flax_params[f"BasicBlock_{i}"]
            self.p[f"block{i}"] = {
                j: _flax_wn_to_torch(b[f"WNConv_{j}"]) for j in range(3)
            }
        self.p["tail"] = _flax_wn_to_torch(flax_params["WNConv_1"])
        self.p["skip"] = _flax_wn_to_torch(flax_params["WNConv_2"])

    def tensors(self):
        out = []
        for v in self.p.values():
            if "v" in v:
                out.extend([v["v"], v["g"], v["b"]])
            else:
                for c in v.values():
                    out.extend([c["v"], c["g"], c["b"]])
        return out

    def forward(self, x):
        x = x - self.mean
        y = _wn_conv(x, self.p["head"], 3)
        for i in range(self.nb):
            b = self.p[f"block{i}"]
            z = _wn_conv(y, b[0], 1)
            z = F.relu(z)
            z = _wn_conv(z, b[1], 1)
            z = _wn_conv(z, b[2], 3)
            y = y + z
        y = _wn_conv(y, self.p["tail"], 3)
        y = y + _wn_conv(x, self.p["skip"], 5)
        return F.pixel_shuffle(y, self.scale) + self.mean



def _torch_rounding(w, least):
    """models/ops.py:33-43."""
    hard = (w >= 0.5).float()
    if least <= 0:
        return hard
    v, _ = torch.topk(w.flatten(), least)
    floor = (w >= v[-1]).float()
    return hard if hard.sum() >= least else floor


def _ste_gate(w, least):
    """BinaryConv2d's residual STE trick (models/ops.py:18-26) on a gate
    vector: forward = rounding(w), gradient = identity."""
    with torch.no_grad():
        binary = _torch_rounding(w.detach(), least)
    return w - (w.detach() - binary)


def _condition(a1, a2):
    """ConditionFunction (wdsr_b.py:594-616): hard select, identity grads."""
    with torch.no_grad():
        keep = (a1 >= a2).float()
    b1 = a1 - (a1.detach() - keep)
    b2 = a2 - (a2.detach() - (1.0 - keep))
    return b1, b2


class _TorchSupernetTwin:
    """Functional NAS_MODEL twin (wdsr_b.py:30-137 forward, Split_Block
    :405-501, MyAggregationLayer :503-554) over tensors converted from our
    flax init. Branch = Sequential(Conv_sep(dw k -> ReLU -> 1x1), ReLU)."""

    KERNELS = (3, 5, 7)

    def __init__(self, flax_params, num_blocks, units, scale=2, image_mean=0.5):
        self.nb, self.r, self.scale, self.mean = num_blocks, units, scale, image_mean
        P = flax_params
        self.p = {
            "head": _flax_wn_to_torch(P["head"]),
            "tail": _flax_wn_to_torch(P["tail"]),
            "skip": _flax_wn_to_torch(P["skip"]),
            "mask_w": _t(P["mask_w"]),
        }
        for i in range(num_blocks):
            b = P[f"block_{i}"]
            blk = {
                "split_w": _t(b["split_w"]),
                "alpha": _t(b["alpha"]),
                "alpha1": _t(b["alpha1"]),
                "alpha2": _t(b["alpha2"]),
            }
            for k in self.KERNELS:
                br = b[f"branch_{k}"]
                blk[f"dw{k}"] = _flax_wn_to_torch(br["WNConv_0"])
                blk[f"pw{k}"] = _flax_wn_to_torch(br["WNConv_1"])
            self.p[f"block{i}"] = blk

    def tensors(self):
        out = [self.p["mask_w"]]
        for name in ("head", "tail", "skip"):
            c = self.p[name]
            out.extend([c["v"], c["g"], c["b"]])
        for i in range(self.nb):
            b = self.p[f"block{i}"]
            out.extend([b["split_w"], b["alpha"], b["alpha1"], b["alpha2"]])
            for k in self.KERNELS:
                for c in (b[f"dw{k}"], b[f"pw{k}"]):
                    out.extend([c["v"], c["g"], c["b"]])
        return out

    def _block_speed(self, blk):
        """estimateByMyMask (speed_estimator.py:56-76): analytic latency under
        no_grad — RAW alpha (not softmax), rounding with least_channel=8 for
        both gates."""
        with torch.no_grad():
            ch0 = _torch_rounding(self.p["mask_w"].detach(), 8).sum()
            ch1 = _torch_rounding(blk["split_w"].detach(), 8).sum()
            out = torch.zeros(())
            for i, k in enumerate(self.KERNELS):
                out = out + (ch1 + 0.2 * ch0) * (k * k) * blk["alpha"][i] / 40.0
        return out

    def forward(self, x):
        x = x - self.mean
        y = _wn_conv(x, self.p["head"], 3)
        m = _ste_gate(self.p["mask_w"], 8).view(1, -1, 1, 1)
        speed_accu = torch.zeros(())
        for i in range(self.nb):
            blk = self.p[f"block{i}"]
            speed_curr = self._block_speed(blk)
            y = y * m  # the model-wide BinaryConv2d mask (wdsr_b.py:116)
            # Split_Block.forward_body (wdsr_b.py:482-496)
            ms = _ste_gate(blk["split_w"], 0).view(1, -1, 1, 1)
            x1 = y * ms
            x2 = y - x1
            pro = F.softmax(blk["alpha"], dim=0)
            x3 = x2
            for j, k in enumerate(self.KERNELS):
                z = _wn_conv(x1, blk[f"dw{k}"], k, groups=self.r)
                z = F.relu(z)
                z = _wn_conv(z, blk[f"pw{k}"], 1)
                z = F.relu(z)  # trailing ReLU of Sequential(Conv_sep, ReLU)
                x3 = x3 + z * pro[j]
            x3 = x3 + x1
            sr2 = x2 + x3 * ms
            b1, b2 = _condition(blk["alpha1"], blk["alpha2"])
            y = b1 * y + b2 * sr2
            speed_accu = b2 * speed_curr + speed_accu
        y = y * m
        y = _wn_conv(y, self.p["tail"], 3) + _wn_conv(x, self.p["skip"], 5)
        return F.pixel_shuffle(y, self.scale) + self.mean, speed_accu

    def surviving_arch(self):
        """get_block_status + get_width_from_block_idx (wdsr_b.py:139-183)."""
        idx, width = [], []
        with torch.no_grad():
            mask_n = int(_torch_rounding(self.p["mask_w"], 8).sum())
            for i in range(self.nb):
                blk = self.p[f"block{i}"]
                if float(blk["alpha1"]) < float(blk["alpha2"]):
                    idx.append(i)
                    both = _torch_rounding(self.p["mask_w"], 8) * _torch_rounding(
                        blk["split_w"], 8
                    )
                    width.append(
                        [
                            mask_n,
                            int(both.sum()),
                            self.KERNELS[int(blk["alpha"].argmax())],
                        ]
                    )
        return idx, width




def _plain_from_flax(p, grad=True):
    """Our PlainConv {Conv_0: {kernel (k,k,i,o), bias}} → torch (OIHW, b)."""
    return (
        _t(np.transpose(np.asarray(p["Conv_0"]["kernel"]), (3, 2, 0, 1)), grad),
        _t(np.asarray(p["Conv_0"]["bias"]), grad),
    )


class _TorchBasicVSRTwin:
    """Functional twin of the reference's mobile BasicVSR
    (models/basicvsr_arch.py:10-105: mmedit SPyNet flows, two Python
    recurrences with mmedit-default flow_warp, fusion 1x1 → ConvTranspose2d
    (k=5, stride=scale) → bilinear resize → +bilinear base), built over torch
    tensors converted from our flax init (models/basicvsr.py — the scan-
    merged, block-diagonal redesign stores per-direction kernels, so the
    mapping is direct). The reference's conv_last maps 2nf→nf which cannot
    broadcast with the 3-channel base (basicvsr_arch.py:36,96-100); like our
    model, the twin uses the working 2nf→3 convention of its sibling
    mvvsr_arch.py:37.

    SpyNet tensors are created with requires_grad=False: the reference's VSR
    optimizer simply never includes spynet params
    (train_video_superresolution.py:160-163), which is what our optax
    set_to_zero mask reproduces. ``train_spynet=True`` makes them trainable
    instead — the convergence-artifact configuration, where no pretrained
    SpyNet exists and the flow net learns jointly on both sides."""

    def __init__(self, flax_params, num_feat, num_block, scale=4,
                 train_spynet=False):
        self.nf, self.nb, self.scale = num_feat, num_block, scale
        self.train_spynet = train_spynet
        P = flax_params
        self.spy = []
        for level in range(6):
            lp = P["spynet"][f"level_{level}"]
            self.spy.append(
                [
                    (
                        _t(
                            np.transpose(
                                np.asarray(lp[f"conv{j}_kernel"]), (3, 2, 0, 1)
                            ),
                            grad=train_spynet,
                        ),
                        _t(np.asarray(lp[f"conv{j}_bias"]), grad=train_spynet),
                    )
                    for j in range(5)
                ]
            )
        T = P["propagation"]["trunks"]
        self.trunks = {}
        for d in ("backward", "forward"):
            conv = lambda name: (
                _t(np.transpose(np.asarray(T[f"{d}_{name}_kernel"]), (3, 2, 0, 1))),
                _t(np.asarray(T[f"{d}_{name}_bias"])),
            )
            layers = [conv("conv0")]
            for i in range(num_block):
                layers.append(conv(f"block{i}_conv1"))
                layers.append(conv(f"block{i}_conv2"))
            self.trunks[d] = layers
        self.fusion = _plain_from_flax(P["fusion"])
        # flax SubpixelConvTranspose kernel (K,K,Cin,Cout) → torch
        # ConvTranspose2d weight (Cin,Cout,K,K), spatially flipped (the exact
        # inverse of train/torch_convert._convtranspose)
        k = np.asarray(P["conv_last"]["kernel"])
        self.conv_last = (
            _t(np.ascontiguousarray(k.transpose(2, 3, 0, 1)[:, :, ::-1, ::-1])),
            _t(np.asarray(P["conv_last"]["bias"])),
        )

    def tensors(self):
        """Trainable tensors — the reference's optimizer param group excludes
        spynet (train_video_superresolution.py:160-163) unless the twin was
        built with train_spynet=True (joint-flow convergence runs)."""
        out = []
        if self.train_spynet:
            for level in self.spy:
                for w, b in level:
                    out.extend([w, b])
        for d in ("backward", "forward"):
            for w, b in self.trunks[d]:
                out.extend([w, b])
        out.extend(self.fusion)
        out.extend(self.conv_last)
        return out

    @staticmethod
    def _warp(feat, flow_nchw):
        # mmedit flow_warp defaults: bilinear, zeros padding,
        # align_corners=True (basicvsr_arch.py:74,85)
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

    def _spynet(self, ref, supp):
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
                F.interpolate(
                    flow, scale_factor=2, mode="bilinear", align_corners=True
                )
                * 2.0
            )
            if up.shape[2] != refs[level].shape[2]:
                up = F.pad(up, [0, 0, 0, 1], mode="replicate")
            if up.shape[3] != refs[level].shape[3]:
                up = F.pad(up, [0, 1, 0, 0], mode="replicate")
            warped = self._warp_border(supps[level], up)
            x = torch.cat([refs[level], warped, up], 1)
            for j in range(5):
                x = F.conv2d(x, self.spy[level][j][0], self.spy[level][j][1], padding=3)
                if j < 4:
                    x = F.relu(x)
            flow = x + up
        return flow

    @staticmethod
    def _warp_border(feat, flow_nchw):
        # SPyNet's internal warp uses BORDER padding (spynet_arch.py:63-66)
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
            padding_mode="border",
            align_corners=True,
        )

    def _trunk(self, x, d):
        layers = self.trunks[d]
        y = F.leaky_relu(F.conv2d(x, layers[0][0], layers[0][1], padding=1), 0.1)
        for i in range(self.nb):
            w1, b1 = layers[1 + 2 * i]
            w2, b2 = layers[2 + 2 * i]
            z = F.relu(F.conv2d(y, w1, b1, padding=1))
            y = y + F.conv2d(z, w2, b2, padding=1)
        return y

    def forward(self, x, height, width):
        """x: (B, T, C, H, W) in [0,1] → (B, T, C, height, width)."""
        b, n, c, h, w = x.shape
        x1 = x[:, :-1].reshape(-1, c, h, w)
        x2 = x[:, 1:].reshape(-1, c, h, w)
        flows_backward = self._spynet(x1, x2).view(b, n - 1, 2, h, w)
        flows_forward = self._spynet(x2, x1).view(b, n - 1, 2, h, w)
        return self._recur(x, flows_forward, flows_backward, height, width)

    def _recur(self, x, flows_forward, flows_backward, height, width):
        """Bidirectional recurrences + fusion + reconstruction
        (basicvsr_arch.py:67-101), shared with the MV twin whose flows come
        from the bitstream instead of SpyNet."""
        b, n, c, h, w = x.shape
        out_l = []
        feat_prop = x.new_zeros(b, self.nf, h, w)
        for i in range(n - 1, -1, -1):
            x_i = x[:, i]
            if i < n - 1:
                feat_prop = self._warp(feat_prop, flows_backward[:, i])
            feat_prop = self._trunk(torch.cat([x_i, feat_prop], 1), "backward")
            out_l.insert(0, feat_prop)

        feat_prop = torch.zeros_like(feat_prop)
        outs = []
        for i in range(n):
            x_i = x[:, i]
            if i > 0:
                feat_prop = self._warp(feat_prop, flows_forward[:, i - 1])
            feat_prop = self._trunk(torch.cat([x_i, feat_prop], 1), "forward")
            out = torch.cat([out_l[i], feat_prop], 1)
            out = F.leaky_relu(
                F.conv2d(out, self.fusion[0], self.fusion[1]), 0.1
            )
            out = F.conv_transpose2d(
                out, self.conv_last[0], self.conv_last[1], stride=self.scale
            )
            out = F.interpolate(out, size=(height, width), mode="bilinear")
            base = F.interpolate(
                x_i, size=(height, width), mode="bilinear", align_corners=False
            )
            outs.append(out + base)
        return torch.stack(outs, 1)


def torch_wn_to_flax(p):
    """torch twin conv {v (OIHW), g, b} -> our WNConv {v (HWIO), g, b}."""
    return {
        "v": np.ascontiguousarray(
            p["v"].detach().numpy().transpose(2, 3, 1, 0)
        ),
        "g": p["g"].detach().numpy().copy(),
        "b": p["b"].detach().numpy().copy(),
    }


class _TorchMVVSRTwin(_TorchBasicVSRTwin):
    """Functional twin of the reference's MotionVectorVSR
    (models/mvvsr_arch.py:11-109) over torch tensors converted from our flax
    init (models/mvvsr.py): same recurrences/reconstruction as BasicVSR, but
    flows come free from the bitstream — flows_forward = mv[:, 1:],
    backward = -forward (mvvsr_arch.py:63-67). No SpyNet parameters (the
    reference constructs one but bypasses it)."""

    def __init__(self, flax_params, num_feat, num_block, scale=4):
        self.nf, self.nb, self.scale = num_feat, num_block, scale
        self.train_spynet = False
        self.spy = []
        P = flax_params
        T = P["propagation"]["trunks"]
        self.trunks = {}
        for d in ("backward", "forward"):
            conv = lambda name: (
                _t(np.transpose(np.asarray(T[f"{d}_{name}_kernel"]), (3, 2, 0, 1))),
                _t(np.asarray(T[f"{d}_{name}_bias"])),
            )
            layers = [conv("conv0")]
            for i in range(num_block):
                layers.append(conv(f"block{i}_conv1"))
                layers.append(conv(f"block{i}_conv2"))
            self.trunks[d] = layers
        self.fusion = _plain_from_flax(P["fusion"])
        k = np.asarray(P["conv_last"]["kernel"])
        self.conv_last = (
            _t(np.ascontiguousarray(k.transpose(2, 3, 0, 1)[:, :, ::-1, ::-1])),
            _t(np.asarray(P["conv_last"]["bias"])),
        )

    def forward(self, x_mv, height, width):
        """x_mv: (B, T, 5, H, W) = RGB + motion vectors."""
        x = x_mv[:, :, :3]
        mv = x_mv[:, :, 3:5]
        flows_forward = mv[:, 1:]
        flows_backward = flows_forward * (-1)
        return self._recur(x, flows_forward, flows_backward, height, width)


class _TorchNaiveMultiTwin:
    """Functional twin of the reference's 'multi' Naive_model
    (models/naive_multi_model_easy.py:34-154) over torch tensors converted
    from our flax init (models/naive_multi.py): WN encoder, block 0 consumes
    concat(flow, warped previous encoding, current), later blocks plain,
    PixelShuffle + bilinear base. The SpyNet (flownet) is frozen exactly as
    in the reference (:48-49): tensors() excludes it."""

    def __init__(self, flax_params, idx, scale=4):
        self.idx, self.scale = tuple(tuple(b) for b in idx), scale
        P = flax_params
        self.spy = []
        for level in range(6):
            lp = P["flownet"][f"level_{level}"]
            self.spy.append(
                [
                    (
                        _t(
                            np.transpose(
                                np.asarray(lp[f"conv{j}_kernel"]), (3, 2, 0, 1)
                            ),
                            grad=False,
                        ),
                        _t(np.asarray(lp[f"conv{j}_bias"]), grad=False),
                    )
                    for j in range(5)
                ]
            )
        self.encode = _flax_wn_to_torch(P["encode"])
        self.blocks = [
            [
                _plain_from_flax(P[f"block_{i}"]["PlainConv_0"]),
                _plain_from_flax(P[f"block_{i}"]["PlainConv_1"]),
            ]
            for i in range(len(self.idx))
        ]
        self.decode = _flax_wn_to_torch(P["decode"])

    def tensors(self):
        """Trainable (non-flownet) tensors — the reference freezes SpyNet
        (naive_multi_model_easy.py:48-49) and the VSR optimizer excludes it
        (train_video_superresolution.py:160-163)."""
        out = [self.encode["v"], self.encode["g"], self.encode["b"]]
        for b0, b1 in self.blocks:
            out.extend([*b0, *b1])
        out.extend([self.decode["v"], self.decode["g"], self.decode["b"]])
        return out

    _spynet = _TorchBasicVSRTwin._spynet
    _warp_border = staticmethod(_TorchBasicVSRTwin._warp_border)
    _warp = staticmethod(_TorchBasicVSRTwin._warp)

    def forward(self, x, height=None, width=None):
        """x: (B, T, C, H, W) → (B, T, C, scale*H, scale*W). height/width are
        accepted for the (lr, H, W) trainer signature but unused — the
        reference hard-codes PixelShuffle + scale_factor base (:142-146)."""
        b, n, c, h, w = x.shape
        x1 = x[:, :-1].reshape(-1, c, h, w)
        x2 = x[:, 1:].reshape(-1, c, h, w)
        flows_forward = self._spynet(x2, x1).view(b, n - 1, 2, h, w)

        outs = []
        pre = None
        for i in range(n):
            xi = x[:, i]
            enc = _wn_conv(xi, self.encode, 3)
            if i == 0:
                flow = torch.zeros(b, 2, h, w)
                x_warp = enc
            else:
                flow = flows_forward[:, i - 1]
                x_warp = self._warp(pre, flow)
            pre = enc
            y = enc
            for j, (_cin, _split, k) in enumerate(self.idx):
                x_c = torch.cat([flow, x_warp, y], 1) if j == 0 else y
                (w1, b1), (w2, b2) = self.blocks[j]
                z = F.relu(F.conv2d(x_c, w1, b1, padding=k // 2))
                y = F.conv2d(z, w2, b2, padding=k // 2) + y
            out = _wn_conv(y, self.decode, 3)
            out = F.pixel_shuffle(out, self.scale)
            base = F.interpolate(
                xi, scale_factor=self.scale, mode="bilinear", align_corners=False
            )
            outs.append(out + base)
        return torch.stack(outs, 1)


def basicvsr_twin_to_flax_params(twin):
    """Final _TorchBasicVSRTwin weights -> flax params for
    models.basicvsr.BasicVSR (exact inverse of the twin's init-sharing
    conversion) so the SAME jax eval harness scores both frameworks' trained
    VSR weights."""

    def arr(t):
        return t.detach().numpy().copy()

    spynet = {}
    for level, layers in enumerate(twin.spy):
        lp = {}
        for j, (w, b) in enumerate(layers):
            lp[f"conv{j}_kernel"] = np.ascontiguousarray(
                arr(w).transpose(2, 3, 1, 0)  # OIHW -> HWIO
            )
            lp[f"conv{j}_bias"] = arr(b)
        spynet[f"level_{level}"] = lp

    trunks = {}
    for d in ("backward", "forward"):
        layers = twin.trunks[d]
        names = ["conv0"]
        for i in range(twin.nb):
            names += [f"block{i}_conv1", f"block{i}_conv2"]
        for name, (w, b) in zip(names, layers):
            trunks[f"{d}_{name}_kernel"] = np.ascontiguousarray(
                arr(w).transpose(2, 3, 1, 0)
            )
            trunks[f"{d}_{name}_bias"] = arr(b)

    # torch ConvTranspose2d weight (Cin,Cout,K,K), spatially flipped ->
    # flax SubpixelConvTranspose kernel (K,K,Cin,Cout)
    k = arr(twin.conv_last[0])[:, :, ::-1, ::-1]
    return {
        "spynet": spynet,
        "propagation": {"trunks": trunks},
        "fusion": {
            "Conv_0": {
                "kernel": np.ascontiguousarray(
                    arr(twin.fusion[0]).transpose(2, 3, 1, 0)
                ),
                "bias": arr(twin.fusion[1]),
            }
        },
        "conv_last": {
            "kernel": np.ascontiguousarray(k.transpose(2, 3, 0, 1)),
            "bias": arr(twin.conv_last[1]),
        },
    }


def wdsr_twin_to_flax_params(twin):
    """Final torch-twin weights -> flax params for models.wdsr_basic.BasicModel
    (inverse of the init-sharing conversion) so the SAME jax eval harness
    scores both frameworks' trained weights."""
    out = {"WNConv_0": torch_wn_to_flax(twin.p["head"])}
    for i in range(twin.nb):
        out[f"BasicBlock_{i}"] = {
            f"WNConv_{j}": torch_wn_to_flax(twin.p[f"block{i}"][j]) for j in range(3)
        }
    out["WNConv_1"] = torch_wn_to_flax(twin.p["tail"])
    out["WNConv_2"] = torch_wn_to_flax(twin.p["skip"])
    return out
