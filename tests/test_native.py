"""Native C++ bicubic core: bit-parity with the numpy golden path."""

import numpy as np
import pytest

from mobilesuperresolution_tpu.data.imresize import imresize_np
from mobilesuperresolution_tpu.data.native_imresize import (
    imresize_u8,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native lib not built (make -C native)"
)


@pytest.mark.parametrize("scale", [0.5, 0.25, 1.0 / 3.0, 2.0])
def test_native_bit_identical(rng, scale):
    img = rng.integers(0, 256, (97, 113, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        imresize_u8(img, scalar_scale=scale), imresize_np(img, scalar_scale=scale)
    )


def test_native_gray_and_output_shape(rng):
    img = rng.integers(0, 256, (50, 61), dtype=np.uint8)
    np.testing.assert_array_equal(
        imresize_u8(img, output_shape=(23, 37)),
        imresize_np(img, output_shape=(23, 37)),
    )


def test_float_input_falls_back(rng):
    img = rng.random((20, 20, 3))
    np.testing.assert_allclose(
        imresize_u8(img, scalar_scale=0.5), imresize_np(img, scalar_scale=0.5)
    )
