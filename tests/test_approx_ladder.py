"""Monotone-decay property of the quantified approximation ladder
(analysis/approx_ladder.py, VERDICT r1 #7): more chunk overlap → closer to
the exact whole-clip output; milder flow downscale → closer to exact flows.
"""

import numpy as np
import pytest

from mobilesuperresolution_tpu.analysis.approx_ladder import (
    make_translating_video,
    run_ladder,
)


def test_translating_video_is_deterministic_and_moving():
    lr, hr = make_translating_video(0, t=4, h=16, w=16, scale=2)
    lr2, hr2 = make_translating_video(0, t=4, h=16, w=16, scale=2)
    np.testing.assert_array_equal(hr, hr2)
    np.testing.assert_array_equal(lr, lr2)
    # consecutive frames genuinely differ (there IS motion to align)
    assert float(np.abs(hr[0, 1] - hr[0, 0]).mean()) > 1e-3
    assert lr.shape == (1, 4, 16, 16, 3) and hr.shape == (1, 4, 32, 32, 3)


@pytest.fixture(scope="module")
def ladder():
    return run_ladder(
        train_steps=60,
        t_eval=12,
        h=32,
        w=32,
        chunk=3,
        downscales=(2, 4),
        overlaps=(0, 2, 4),
        seed=0,
    )


def test_chunk_overlap_monotone(ladder):
    ags = [ladder["chunk_overlap"][ov]["agreement"] for ov in (0, 2, 4)]
    # agreement with the exact whole-clip output improves with overlap
    assert ags[0] < ags[1] < ags[2], ags
    # and the approximation is real: finite error at overlap 0
    assert np.isfinite(ags[0])


def test_flow_downscale_monotone(ladder):
    a2 = ladder["flow_downscale"][2]["agreement"]
    a4 = ladder["flow_downscale"][4]["agreement"]
    assert a2 > a4, (a2, a4)
    assert np.isfinite(a4)


def test_deltas_are_small_but_nonzero(ladder):
    # sanity on scale: approximations perturb, they don't destroy
    for group in ("flow_downscale", "chunk_overlap"):
        for r in ladder[group].values():
            assert abs(r["delta"]) < 3.0, (group, r)


def test_quantize_int8_rung(ladder):
    r = ladder["quantize_int8"]
    # int8 perturbs the output (finite agreement) without destroying it
    assert np.isfinite(r["agreement"]) and r["agreement"] > 25.0, r
    assert abs(r["delta"]) < 3.0, r
