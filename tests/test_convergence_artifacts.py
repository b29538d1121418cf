"""Packaged convergence artifacts (artifacts/convergence/, produced by
scripts/make_convergence_artifacts.py on a real v5e): trained weights must
load and actually super-resolve — final PSNR on the held-out synthetic eval
set beats the bicubic/bilinear baseline by a real margin.

This is the repo's out-of-the-box trained-model story (the role of the
reference's models/pretrained_weights/wdsr_b_x2_*.pt, README.md:28) and the
honest stand-in for the data-blocked Set5/Urban100 north star: no real
dataset exists in this environment, so 'trains correctly' is demonstrated as
loss->plateau + PSNR-over-baseline gain on the reproducible synthetic-natural
set, with the WDSR run additionally trained LOCKSTEP with the torch twin and
the JAX-vs-torch final-PSNR delta recorded in report.json
(tests/helpers/torch_twins.py; VERDICT r2 item 2).
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONV = os.path.join(REPO, "artifacts", "convergence")


def _load(run):
    d = os.path.join(CONV, run)
    if not os.path.isdir(d):
        pytest.skip(f"no packaged convergence artifact {run}")
    with open(os.path.join(d, "report.json")) as f:
        report = json.load(f)
    return d, report


def _eval_batches():
    # mirrors scripts/make_convergence_artifacts.py: held-out seeds 50..53 of
    # the noise-free synthetic-natural generator
    from mobilesuperresolution_tpu.data.imresize import imresize_np
    from mobilesuperresolution_tpu.data.synthetic import synthetic_natural_image

    for s in range(50, 54):
        hr = synthetic_natural_image(s, (96, 96)).astype(np.float32) / 255.0
        lr = imresize_np(
            synthetic_natural_image(s, (96, 96)), scalar_scale=0.5
        ).astype(np.float32) / 255.0
        yield f"eval{s}", lr[None], hr[None]


class TestPackagedConvergenceArtifacts:
    def test_wdsr_weights_beat_bicubic(self):
        from mobilesuperresolution_tpu.models.wdsr_basic import BasicModel
        from mobilesuperresolution_tpu.train.checkpoint import load_params_npz
        from mobilesuperresolution_tpu.train.evaluate import evaluate

        d, report = _load("wdsr_b_x2")
        cfg = report["config"]
        model = BasicModel(
            num_blocks=cfg["num_blocks"],
            num_residual_units=cfg["num_residual_units"],
            scale=cfg["scale"],
        )
        template = model.init(
            jax.random.key(0), jnp.zeros((1, 24, 24, 3))
        )["params"]
        params = load_params_npz(os.path.join(d, "weights", "models.npz"), template)

        res = evaluate(
            lambda lr, oh, ow: model.apply({"params": params}, lr),
            _eval_batches(),
            scale=cfg["scale"],
        ).as_dict()
        # loaded weights reproduce the report (same eval harness, same set)
        np.testing.assert_allclose(res["PSNR"], report["eval"]["PSNR"], atol=0.05)
        # and genuinely super-resolve: > bicubic + 1 dB on held-out images
        assert res["PSNR"] > report["bicubic_psnr"] + 1.0, (
            res["PSNR"],
            report["bicubic_psnr"],
        )

    def test_wdsr_trained_like_torch(self):
        """The lockstep torch twin's converged PSNR agrees with ours —
        training-dynamics parity at convergence scale (not just 60 steps)."""
        _, report = _load("wdsr_b_x2")
        if "jax_vs_torch_psnr_delta" not in report:
            pytest.skip("artifact generated with --no_torch_twin")
        assert abs(report["jax_vs_torch_psnr_delta"]) < 0.05, report[
            "jax_vs_torch_psnr_delta"
        ]

    def test_resultnet_weights_beat_bicubic(self):
        from mobilesuperresolution_tpu.models.result_net import ResultNet
        from mobilesuperresolution_tpu.train.checkpoint import load_params_npz
        from mobilesuperresolution_tpu.train.evaluate import evaluate

        d, report = _load("result_net_x2")
        cfg = report["config"]
        model = ResultNet(
            idx=tuple(tuple(b) for b in cfg["idx"]), scale=cfg["scale"]
        )
        template = model.init(
            jax.random.key(0), jnp.zeros((1, 24, 24, 3))
        )["params"]
        params = load_params_npz(os.path.join(d, "weights", "models.npz"), template)
        # raw output, exactly like training and cli/pretrain.run_evaluation —
        # the tail convs learned the +image_mean shift (never re-added by the
        # model, result_net.py:89-93 quirk)
        res = evaluate(
            lambda lr, oh, ow: model.apply({"params": params}, lr),
            _eval_batches(),
            scale=cfg["scale"],
        ).as_dict()
        np.testing.assert_allclose(res["PSNR"], report["eval"]["PSNR"], atol=0.05)
        assert res["PSNR"] > report["bicubic_psnr"] + 1.0

    def test_basicvsr_weights_beat_bilinear(self):
        from mobilesuperresolution_tpu.data.imresize import imresize_np
        from mobilesuperresolution_tpu.data.synthetic import synthetic_video
        from mobilesuperresolution_tpu.metrics import psnr
        from mobilesuperresolution_tpu.models.basicvsr import BasicVSR
        from mobilesuperresolution_tpu.train.checkpoint import load_params_npz

        d, report = _load("basicvsr_x4")
        cfg = report["config"]
        model = BasicVSR(
            num_feat=cfg["num_feat"], num_block=cfg["num_block"], scale=cfg["scale"]
        )
        t, vscale = cfg["t"], cfg["scale"]
        # hw recorded since r4 (the script moved 32 -> 64 so the torch twin's
        # 6-level SpyNet pyramid has a nonzero base level); default matches
        # the pre-r4 artifact generation
        hw = cfg.get("hw", 32)
        template = model.init(
            jax.random.key(0),
            jnp.zeros((1, t, hw, hw, 3)),
            hw * vscale,
            hw * vscale,
        )["params"]
        params = load_params_npz(os.path.join(d, "weights", "models.npz"), template)

        eval_hr = synthetic_video(
            300, t=t, hw=(hw * vscale, hw * vscale),
            step=cfg.get("step", 4), natural=True,
        ).astype(np.float32) / 255.0
        eval_lr = np.stack(
            [
                imresize_np(
                    np.clip(f * 255.0, 0, 255).astype(np.uint8),
                    scalar_scale=1.0 / vscale,
                ).astype(np.float32)
                / 255.0
                for f in eval_hr
            ]
        )
        sr = model.apply(
            {"params": params}, jnp.asarray(eval_lr[None]), hw * vscale, hw * vscale
        )
        hr_j = jnp.asarray(eval_hr[None])
        p_sr = float(psnr(sr, hr_j, shave=4)) / t
        np.testing.assert_allclose(p_sr, report["eval"]["PSNR"], atol=0.05)
        assert p_sr > report["eval"]["bilinear_PSNR"] + 0.3
        if "SSIM" in report["eval"]:
            from mobilesuperresolution_tpu.metrics import ssim

            s_sr = float(ssim(sr, hr_j, shave=4)) / t
            np.testing.assert_allclose(s_sr, report["eval"]["SSIM"], atol=0.005)
            assert s_sr > report["eval"]["bilinear_SSIM"]
