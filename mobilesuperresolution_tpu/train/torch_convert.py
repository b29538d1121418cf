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
