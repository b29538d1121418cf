"""Torch-checkpoint conversion: reference WDSR-B state dicts → flax params.

The reference ships pretrained WDSR-B x2 weights
(models/pretrained_weights/wdsr_b_x2_{16_24,8_24}.pt, README.md:28) whose
state dict layout is:
  head.{weight_v,weight_g,bias}
  body.<i>.body.{0,2,3}.{weight_v,weight_g,bias}   (1x1 expand, 1x1 linear, kxk)
  tail.{...}, skip.0.{...}
Torch conv weights are OIHW; flax kernels are HWIO; weight-norm g is
(O,1,1,1) → (O,). Loading them into ``BasicModel`` gives bit-comparable
forwards — the strongest architecture-parity check available without data.
"""

import numpy as np


def load_torch_checkpoint(path):
    """torch.load with version-independent pickling behavior.

    torch>=2.6 flips the ``weights_only`` default to True, which refuses
    mmedit-style checkpoints that pickle non-tensor objects (meta/config
    entries). Try the safe mode first; fall back to a full unpickle for
    user-supplied local checkpoints (the reference loads them fully)."""
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        try:
            return torch.load(path, map_location="cpu", weights_only=False)
        except TypeError:  # torch too old to know weights_only at all
            return torch.load(path, map_location="cpu")


def _conv(entry_v, entry_g, entry_b):
    return {
        "v": np.transpose(np.asarray(entry_v), (2, 3, 1, 0)),
        "g": np.asarray(entry_g).reshape(-1),
        "b": np.asarray(entry_b),
    }


def convert_wdsr_basic_state_dict(state_dict):
    """state_dict: name → numpy/torch tensor (torch.load result). Returns a
    flax params dict for ``models.wdsr_basic.BasicModel``."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params = {}
    params["WNConv_0"] = _conv(sd["head.weight_v"], sd["head.weight_g"], sd["head.bias"])
    i = 0
    while f"body.{i}.body.0.weight_v" in sd:
        params[f"BasicBlock_{i}"] = {
            "WNConv_0": _conv(
                sd[f"body.{i}.body.0.weight_v"],
                sd[f"body.{i}.body.0.weight_g"],
                sd[f"body.{i}.body.0.bias"],
            ),
            "WNConv_1": _conv(
                sd[f"body.{i}.body.2.weight_v"],
                sd[f"body.{i}.body.2.weight_g"],
                sd[f"body.{i}.body.2.bias"],
            ),
            "WNConv_2": _conv(
                sd[f"body.{i}.body.3.weight_v"],
                sd[f"body.{i}.body.3.weight_g"],
                sd[f"body.{i}.body.3.bias"],
            ),
        }
        i += 1
    params["WNConv_1"] = _conv(sd["tail.weight_v"], sd["tail.weight_g"], sd["tail.bias"])
    if "skip.0.weight_v" in sd:
        params["WNConv_2"] = _conv(
            sd["skip.0.weight_v"], sd["skip.0.weight_g"], sd["skip.0.bias"]
        )
    return params, i


def load_reference_wdsr(path):
    """Load a reference .pt checkpoint (requires torch) → (params, num_blocks,
    num_residual_units)."""
    sd = load_torch_checkpoint(path)
    params, num_blocks = convert_wdsr_basic_state_dict(sd)
    units = sd["head.weight_v"].shape[0]
    return params, num_blocks, int(units)


def _k(w):
    """OIHW torch conv weight → HWIO flax kernel."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def convert_spynet_state_dict(sd, prefix="spynet."):
    """Reference SpyNet names (spynet_arch.py:10-27:
    ``<prefix>basic_module.<level>.basic_module.<2j>.{weight,bias}``, level 0
    = coarsest — the same ordering as our ``level_<i>``) → params for
    ``models.spynet.SpyNet``."""
    out = {}
    level = 0
    while f"{prefix}basic_module.{level}.basic_module.0.weight" in sd:
        lp = {}
        for j in range(5):
            lp[f"conv{j}_kernel"] = _k(sd[f"{prefix}basic_module.{level}.basic_module.{2 * j}.weight"])
            lp[f"conv{j}_bias"] = np.asarray(
                sd[f"{prefix}basic_module.{level}.basic_module.{2 * j}.bias"]
            )
        out[f"level_{level}"] = lp
        level += 1
    if level == 0:
        # an empty tree would surface much later as a flax missing-param
        # error far from the cause (e.g. 'module.'-prefixed DataParallel or
        # full-mmedit checkpoints) — fail at the conversion site instead
        sample = sorted(sd)[:3]
        raise ValueError(
            f"no SpyNet keys matched prefix {prefix!r} — checkpoint keys "
            f"look like {sample}; expected "
            f"'{prefix}basic_module.<level>.basic_module.<2j>.weight'"
        )
    return out


def convert_basicvsr_origin_state_dict(state_dict):
    """Reference BasicVSR_origin state dict (basicvsr_arch_origin.py:19-40;
    also the mmedit-format checkpoints loaded via the ['params'] key at
    test_video_superresolution.py:249) → flax params for
    ``models.basicvsr.BasicVSROrigin``. Returns (params, num_block).

    Mapping: spynet.* → spynet/level_i/convj; {backward,forward}_trunk.main.0
    → propagation/trunks/<dir>_conv0 and .main.2.<i>.conv{1,2} →
    <dir>_block<i>_conv{1,2} (our scan-merged dual trunk stores both
    directions' kernels side by side); fusion/upconv1/upconv2/conv_hr/
    conv_last → the same-named PlainConv modules."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params = {"spynet": convert_spynet_state_dict(sd)}

    trunks = {}
    num_block = 0
    for d in ("backward", "forward"):
        trunks[f"{d}_conv0_kernel"] = _k(sd[f"{d}_trunk.main.0.weight"])
        trunks[f"{d}_conv0_bias"] = np.asarray(sd[f"{d}_trunk.main.0.bias"])
        i = 0
        while f"{d}_trunk.main.2.{i}.conv1.weight" in sd:
            for c in ("conv1", "conv2"):
                trunks[f"{d}_block{i}_{c}_kernel"] = _k(
                    sd[f"{d}_trunk.main.2.{i}.{c}.weight"]
                )
                trunks[f"{d}_block{i}_{c}_bias"] = np.asarray(
                    sd[f"{d}_trunk.main.2.{i}.{c}.bias"]
                )
            i += 1
        num_block = i
    params["propagation"] = {"trunks": trunks}

    for name in ("fusion", "upconv1", "upconv2", "conv_hr", "conv_last"):
        params[name] = {
            "Conv_0": {
                "kernel": _k(sd[f"{name}.weight"]),
                "bias": np.asarray(sd[f"{name}.bias"]),
            }
        }
    return params, num_block


def _wn(sd, prefix):
    """Reference weight-normed conv triple → our WNConv {v, g, b}."""
    return _conv(
        sd[f"{prefix}.weight_v"], sd[f"{prefix}.weight_g"], sd[f"{prefix}.bias"]
    )


def _plain(sd, prefix):
    """Plain torch conv → flax nn.Conv {kernel, bias}."""
    return {
        "kernel": _k(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def _convtranspose(sd, prefix):
    """torch ConvTranspose2d weight (Cin, Cout, kh, kw) → our
    SubpixelConvTranspose {kernel, bias} ((kh, kw, Cin, Cout), spatially
    flipped: torch transpose-conv indexes W[o - s·i] where the flax/VALID
    form indexes W[K-1-(o-s·i)] — ops/layers.subpixel_transpose_kernel)."""
    w = np.asarray(sd[f"{prefix}.weight"])
    k = np.ascontiguousarray(w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))
    return {"kernel": k, "bias": np.asarray(sd[f"{prefix}.bias"])}


def convert_single_image_state_dict(sd):
    """Reference 'single' Result_Model (single_image_model.py:20-108) → flax
    params for ``models.single_image.SingleImageModel``. Returns
    (params, blocks, channel). The reference's ``skip`` conv and
    ``img_upsample`` are dead in its forward (:70,88) and are dropped."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params = {"encoder": _wn(sd, "encoder")}
    i = 0
    while f"body.{i}.body.0.body.0.weight_v" in sd:
        params[f"block_{i}"] = {
            "WNConv_0": _wn(sd, f"body.{i}.body.0.body.0"),
            "WNConv_1": _wn(sd, f"body.{i}.body.0.body.2"),
        }
        i += 1
    if i == 0:
        raise ValueError(
            f"no 'single' block keys matched; keys look like {sorted(sd)[:3]}"
        )
    params["body_tail"] = _wn(sd, f"body.{i}")
    params["shuf"] = _convtranspose(sd, "shuf.0")
    channel = int(sd["encoder.weight_v"].shape[0])
    return params, i, channel


def convert_naive_multi_state_dict(sd):
    """Reference 'multi' Naive_model (naive_multi_model_easy.py:34-154) →
    flax params for ``models.naive_multi.NaiveMultiModel``. Returns
    (params, num_blocks). Dead reference modules dropped: per-block ``skip``
    1x1 (:172, unused in forward) and the top-level ``skip`` 5x5 (:96-104)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params = {
        "flownet": convert_spynet_state_dict(sd, prefix="flownet."),
        "encode": _wn(sd, "encode"),
        "decode": _wn(sd, "decode"),
    }
    i = 0
    while f"body.{i}.body.0.weight" in sd:
        params[f"block_{i}"] = {
            "PlainConv_0": {"Conv_0": _plain(sd, f"body.{i}.body.0")},
            "PlainConv_1": {"Conv_0": _plain(sd, f"body.{i}.body.2")},
        }
        i += 1
    if i == 0:
        raise ValueError(
            f"no 'multi' block keys matched; keys look like {sorted(sd)[:3]}"
        )
    return params, i


def convert_mvvsr_state_dict(sd):
    """Reference MotionVectorVSR (mvvsr_arch.py:11-109) → flax params for
    ``models.mvvsr.MotionVectorVSR``. Returns (params, num_block).
    Dead reference modules dropped: ``spynet`` (bypassed — flows come from
    the bitstream, :63-67), ``upconv1/upconv2/conv_hr`` (commented out of
    the forward, :98-99)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    trunks = {}
    num_block = 0
    for d in ("backward", "forward"):
        trunks[f"{d}_conv0_kernel"] = _k(sd[f"{d}_trunk.main.0.weight"])
        trunks[f"{d}_conv0_bias"] = np.asarray(sd[f"{d}_trunk.main.0.bias"])
        i = 0
        while f"{d}_trunk.main.2.{i}.conv1.weight" in sd:
            for c in ("conv1", "conv2"):
                trunks[f"{d}_block{i}_{c}_kernel"] = _k(
                    sd[f"{d}_trunk.main.2.{i}.{c}.weight"]
                )
                trunks[f"{d}_block{i}_{c}_bias"] = np.asarray(
                    sd[f"{d}_trunk.main.2.{i}.{c}.bias"]
                )
            i += 1
        num_block = i
    params = {
        "propagation": {"trunks": trunks},
        "fusion": {"Conv_0": _plain(sd, "fusion")},
        "conv_last": _convtranspose(sd, "conv_last"),
    }
    return params, num_block


def load_pretrained_supernet(nas_params, sd):
    """Shape-greedy pretrained load for the NAS supernet
    (wdsr_b.py:235-250). The reference blindly zips its parameter iterator
    against the WDSR-B checkpoint and copies whenever shapes match; with its
    shipped checkpoints the surviving transfers are exactly the head/tail/
    skip weight-norm convs (the supernet's split-branch block shapes never
    match WDSR-B's 1x1-expand blocks). We implement that effect
    deterministically by name — emulate semantics, not bugs (SURVEY §7.4).
    Returns (new_params, copied_tensor_count)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    mapping = {"head": "head", "tail": "tail", "skip": "skip.0"}
    if "skip.weight_v" in sd:  # NAS-style checkpoints name it bare 'skip'
        mapping["skip"] = "skip"
    new = dict(nas_params)
    copied = 0
    for ours, theirs in mapping.items():
        if f"{theirs}.weight_v" not in sd or ours not in new:
            continue
        cand = _wn(sd, theirs)
        cur = nas_params[ours]
        if all(cand[t].shape == np.asarray(cur[t]).shape for t in ("v", "g", "b")):
            new[ours] = cand
            copied += 3
    return new, copied
