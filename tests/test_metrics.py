"""Metric-recipe parity tests (reference recipes: common/metrics.py:10-68)."""

import numpy as np
import pytest

from mobilesuperresolution_tpu.metrics import psnr, psnr_y, ssim, ssim_np


@pytest.fixture
def pair(rng):
    hr = rng.random((2, 40, 44, 3)).astype(np.float32)
    sr = np.clip(hr + 0.05 * rng.standard_normal(hr.shape).astype(np.float32), 0, 1)
    return sr, hr


def _psnr_ref(sr, hr, shave=4):
    # Independent float64 re-derivation of the reference formula.
    sr = np.clip(np.around(sr.astype(np.float64) * 255), 0, 255) / 255
    diff = (sr - hr.astype(np.float64))[:, shave:-shave, shave:-shave, :]
    mse = (diff**2).mean(axis=(1, 2, 3))
    return (-10 * np.log10(mse)).sum()


def test_psnr_matches_reference_formula(pair):
    sr, hr = pair
    got = float(psnr(sr, hr, shave=4))
    want = _psnr_ref(sr, hr, 4)
    assert abs(got - want) < 1e-3


def test_psnr_identical_images_is_large(pair):
    _, hr = pair
    q = np.around(hr * 255) / 255  # already on the grid
    assert float(psnr(q.astype(np.float32), q.astype(np.float32))) > 2 * 60


def test_psnr_y_uses_unquantized_clamped_sr(pair):
    """The reference's psnr_y quantizes into an unused variable and compares the
    merely-clamped SR (common/metrics.py:24-25) — keep that exact behavior."""
    sr, hr = pair
    w = np.array([0.257, 0.504, 0.098])
    diff = (np.clip(sr, 0, 1).astype(np.float64) - hr) @ w
    diff = diff[:, 4:-4, 4:-4]
    mse = (diff**2).mean(axis=(1, 2))
    want = (-10 * np.log10(mse)).sum()
    assert abs(float(psnr_y(sr, hr)) - want) < 1e-3


def test_ssim_jnp_matches_numpy_float64(pair):
    sr, hr = pair
    a = float(ssim(sr[0], hr[0]))
    b = ssim_np(sr[0], hr[0])
    assert abs(a - b) < 1e-4


def test_ssim_bounds(pair):
    sr, hr = pair
    v = float(ssim(sr[0], hr[0]))
    assert 0.0 < v <= 1.0
    same = np.around(hr[0] * 255) / 255
    assert ssim_np(same, same) > 0.9999


def test_ssim_float32_stable_near_identical(rng):
    """ADVICE r4: the naive E[x^2]-E[x]^2 float32 moments overshot SSIM past
    1.0 (logged 1.05) on near-identical high-PSNR pairs. The centered /
    difference-carried rewrite must stay <= 1 and track the float64 golden
    on exactly that regime: smooth images + ~1e-3 residuals (PSNR ~57)."""
    base = np.linspace(0, 1, 64)[:, None, None] * np.ones((64, 80, 3))
    hr = np.clip(base + 0.1 * rng.standard_normal((64, 80, 3)), 0, 1)
    hr = hr.astype(np.float32)[None]
    for noise in (0.0014, 0.0):
        sr = np.clip(hr + noise * rng.standard_normal(hr.shape), 0, 1)
        sr = sr.astype(np.float32)
        a = float(ssim(sr, hr))
        b = ssim_np(sr, hr)
        assert a <= 1.0 + 1e-6, a
        assert abs(a - b) < 2e-4, (a, b)


class TestIndependentGoldens:
    """Checked-in goldens from tests/golden/make_metric_goldens.py — an
    independent float64 torch implementation following skimage's exact
    structural_similarity code path (scipy-style gaussian kernel, crop(pad),
    cov_norm=NP/(NP-1), explicit data_range=1.0) and the reference's literal
    psnr/psnr_y torch code (common/metrics.py:10-38). A silent recipe
    mismatch in metrics/metrics.py (filter mode, cov_norm, data_range,
    quantization order) fails here even though skimage isn't installed."""

    @pytest.fixture(scope="class")
    def goldens(self):
        import os

        path = os.path.join(os.path.dirname(__file__), "golden", "metric_goldens.npz")
        return dict(np.load(path))

    @pytest.fixture(scope="class")
    def pairs(self):
        import sys, os

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "golden"))
        try:
            from make_metric_goldens import make_pairs
        finally:
            sys.path.pop(0)
        return make_pairs()

    def test_ssim_np_matches_goldens(self, goldens, pairs):
        for name, (sr, hr) in pairs.items():
            for shave in (4, 8):
                got = ssim_np(sr, hr, shave=shave)
                want = float(goldens[f"{name}_ssim_s{shave}"])
                assert abs(got - want) < 1e-9, (name, shave, got, want)

    def test_ssim_jnp_matches_goldens(self, goldens, pairs):
        for name, (sr, hr) in pairs.items():
            for shave in (4, 8):
                got = float(ssim(sr, hr, shave=shave))
                want = float(goldens[f"{name}_ssim_s{shave}"])
                assert abs(got - want) < 3e-5, (name, shave, got, want)

    def test_psnr_matches_goldens(self, goldens, pairs):
        for name, (sr, hr) in pairs.items():
            for shave in (4, 8):
                got = float(psnr(sr[None], hr[None], shave=shave))
                want = float(goldens[f"{name}_psnr_s{shave}"])
                assert abs(got - want) < 2e-3, (name, shave, got, want)

    def test_psnr_y_matches_goldens(self, goldens, pairs):
        for name, (sr, hr) in pairs.items():
            for shave in (4, 8):
                got = float(psnr_y(sr[None], hr[None], shave=shave))
                want = float(goldens[f"{name}_psnr_y_s{shave}"])
                assert abs(got - want) < 2e-3, (name, shave, got, want)


def test_ssim_batch_is_per_image_sum(rng):
    """Batched ssim/ssim_np return the per-image SUM (psnr-style
    accounting), never a silent first-item pick."""
    from mobilesuperresolution_tpu.metrics import ssim, ssim_np

    sr = rng.random((3, 24, 24, 3)).astype(np.float32)
    hr = np.clip(sr + rng.normal(0, 0.05, sr.shape), 0, 1).astype(np.float32)
    want = sum(float(ssim_np(s, h)) for s, h in zip(sr, hr))
    np.testing.assert_allclose(float(ssim_np(sr, hr)), want, rtol=1e-12)
    np.testing.assert_allclose(float(ssim(sr, hr)), want, rtol=1e-4)
