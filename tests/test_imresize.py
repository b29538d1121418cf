"""Golden-output tests for the MATLAB-exact bicubic (the degradation model).

Golden data in tests/golden/imresize_golden.npz was produced once by running
the reference implementation (third_party/matlab_imresize/imresize.py); the
tests here never touch /root/reference.
"""

import os

import numpy as np
import pytest

from mobilesuperresolution_tpu.data.imresize import (
    bicubic_downsample,
    imresize_jax,
    imresize_np,
)

GOLDEN = np.load(os.path.join(os.path.dirname(__file__), "golden", "imresize_golden.npz"))


@pytest.mark.parametrize("scale", [2, 3, 4])
def test_uint8_downscale_matches_golden(scale):
    out = imresize_np(GOLDEN["img_u8"], scalar_scale=1 / scale)
    np.testing.assert_array_equal(out, GOLDEN[f"u8_down_x{scale}"])


def test_float_down_up_matches_golden():
    np.testing.assert_allclose(
        imresize_np(GOLDEN["img_f"], scalar_scale=0.5), GOLDEN["f_down_x2"], atol=1e-12
    )
    np.testing.assert_allclose(
        imresize_np(GOLDEN["img_f"], scalar_scale=2.0), GOLDEN["f_up_x2"], atol=1e-12
    )


def test_gray_output_shape_matches_golden():
    out = imresize_np(GOLDEN["img_g"], output_shape=(23, 37))
    np.testing.assert_array_equal(out, GOLDEN["u8_gray_shape"])


def test_even_x4_matches_golden():
    out = imresize_np(GOLDEN["img_e"], scalar_scale=0.25)
    np.testing.assert_array_equal(out, GOLDEN["u8_even_x4"])


def test_jax_path_matches_numpy_uint8_semantics():
    """On-device degradation must land on the identical 255-grid values."""
    hr_u8 = GOLDEN["img_e"]
    want = imresize_np(hr_u8, scalar_scale=0.25).astype(np.float32) / 255.0
    hr = hr_u8.astype(np.float32) / 255.0
    got = np.asarray(bicubic_downsample(hr[None], scale=4, quantize_uint8=True))[0]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_jax_float_path_close_to_float64():
    img = GOLDEN["img_f"].astype(np.float32)
    got = np.asarray(imresize_jax(img, (32, 40)))
    np.testing.assert_allclose(got, GOLDEN["f_down_x2"], atol=2e-5)


def test_jax_path_tie_contract_on_smooth_image():
    """Smooth images hit exact .5 rounding ties at dyadic scales; the on-device
    path may differ by at most 1/255 on a small fraction of pixels."""
    yy, xx = np.mgrid[0:96, 0:96]
    hr_u8 = (
        np.stack(
            [
                127 + 100 * np.sin(yy / 7) * np.cos(xx / 5),
                127 + 120 * np.sin((xx + yy) / 9),
                xx * 255 / 96,
            ],
            -1,
        )
        .clip(0, 255)
        .astype(np.uint8)
    )
    want = imresize_np(hr_u8, scalar_scale=0.5).astype(np.float32) / 255.0
    hr = hr_u8.astype(np.float32) / 255.0
    got = np.asarray(bicubic_downsample(hr[None], scale=2, quantize_uint8=True))[0]
    diff = np.abs(got - want)
    assert diff.max() <= 1.0 / 255.0 + 1e-6
    assert (diff > 1e-6).mean() < 0.005


def test_batched_shapes():
    hr = np.random.default_rng(1).random((2, 48, 48, 3)).astype(np.float32)
    lr = bicubic_downsample(hr, scale=2, quantize_uint8=False)
    assert lr.shape == (2, 24, 24, 3)
