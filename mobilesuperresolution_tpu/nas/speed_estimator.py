"""Differentiable-latency estimation for the NAS search.

Reference: speed_models/speed_estimator.py. The reference's production path
(``estimateByMyMask``, :56-76) is the analytic model

    speed(block) = Σ_k (ch_split + 0.2 · ch_mask) · k² · alpha_k / 40   [ms]

computed under ``torch.no_grad()`` — so gradients reach the alphas only through
the block-skip beta2, not through this value. We reproduce that exactly by
default (stop_gradient over the whole estimate) and offer
``differentiable=True`` which uses STE channel counts and live alphas.

Channel counts use ``rounding`` with the default least_channel=8 — including
for the split gate whose *forward* uses least_channel=0. That asymmetry is the
reference's behavior (``get_unmask_number`` → ``rounding(w)`` default,
speed_models/speed_estimator.py:79-84) and is kept for parity.

The measured-table path (`TableSpeedEstimator` + the MLP in speed_model.py)
replaces the reference's mobile TFLite latency tables with tables produced by
the on-TPU kernel timing harness (kernels/timing.py).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from mobilesuperresolution_tpu.ops.ste import binary_mask, rounding

KERNEL_CHOICES = (3, 5, 7)

# Checked-in measured tables (the role of the reference's
# speed_models/speed_data/<device>/<proc>.npy, produced by kernels/timing.py
# on real hardware instead of mobile TFLite benchmark logs).
SPEED_TABLE_DIR = os.path.join(os.path.dirname(__file__), "speed_tables")


def packaged_table_path(name=None):
    """Path of a checked-in measured latency table, or None.

    ``name=None`` resolves the current backend's device kind (e.g.
    'TPU v5 lite' → speed_tables/tpu_v5_lite.npy) — the analog of the
    reference's ``loss_config.mobile_device`` device selection."""
    if name is None:
        import jax as _jax

        name = _jax.devices()[0].device_kind.lower().replace(" ", "_")
    p = os.path.join(SPEED_TABLE_DIR, f"{name}.npy")
    return p if os.path.exists(p) else None


def analytic_block_speed(ch_mask, ch_split, kernel):
    """(ch_split + 0.2*ch_mask) * k^2 / 40 — speed_estimator.py:41-42,74-76."""
    return (ch_split + 0.2 * ch_mask) * (kernel * kernel) / 40.0


def block_speed_from_gates(mask_w, split_w, alpha, differentiable=False, speed_table=None):
    """Per-block latency estimate from the gate parameters (scalar, ms).

    speed_table: optional (3, C+1, C+1) array of measured per-kernel latencies
    indexed [kernel_idx, ch_split, ch_mask] (densified from the on-TPU timing
    harness via ``densify_speed_table``) — the measured path the reference
    left TODO-disabled (speed_estimator.py:70-73). Channel counts index the
    table (non-differentiable, like the reference's no-grad counts); with
    ``differentiable=True`` the alphas stay live either way.
    """
    if differentiable:
        ch0 = jnp.sum(binary_mask(mask_w, least_channel=8))
        ch1 = jnp.sum(binary_mask(split_w, least_channel=8))
        a = alpha
    else:
        ch0 = jax.lax.stop_gradient(jnp.sum(rounding(mask_w, 8)))
        ch1 = jax.lax.stop_gradient(jnp.sum(rounding(split_w, 8)))
        a = jax.lax.stop_gradient(alpha)
    if speed_table is not None:
        i0 = jax.lax.stop_gradient(ch0).astype(jnp.int32)
        i1 = jax.lax.stop_gradient(ch1).astype(jnp.int32)
        speeds = speed_table[:, i1, i0]  # (3,)
    else:
        ks = jnp.asarray(KERNEL_CHOICES, jnp.float32)
        speeds = analytic_block_speed(ch0, ch1, ks)  # (3,)
    out = jnp.sum(speeds * a)
    if not differentiable:
        out = jax.lax.stop_gradient(out)
    return out


def densify_speed_table(rows, max_ch, method="linear"):
    """(N, 4) measured rows [ch_in, ch_split, kernel, ms] → dense
    (3, max_ch+1, max_ch+1) table [kernel_idx, ch_split, ch_mask], ready for
    in-model use.

    method="linear" (default): separable linear interpolation over the
    measured (ch_mask, ch_split) grid — off-grid channel configs get values
    BETWEEN their measured neighbors, so the search's traced latency varies
    continuously in channel count instead of the nearest-config fill's
    piecewise-constant steps (the reference's TODO at
    speed_models/speed_estimator.py:70-73 — its analytic fallback is smooth;
    a measured table should not be worse). Extrapolation clamps to the edge
    of the measured range.

    method="nearest": the nearest measured config (r1/r2 behavior)."""
    if method == "nearest":
        est = TableSpeedEstimator(rows)
        table = np.zeros((len(KERNEL_CHOICES), max_ch + 1, max_ch + 1), np.float32)
        for ki, k in enumerate(KERNEL_CHOICES):
            for ch1 in range(max_ch + 1):
                for ch0 in range(max_ch + 1):
                    table[ki, ch1, ch0] = est(ch0, ch1, k)
        return table
    if method != "linear":
        raise ValueError(f"unknown densify method {method!r}")

    rows = np.asarray(rows, dtype=np.float32)
    if rows.ndim != 2 or rows.shape[1] != 4:
        raise ValueError("expected (N, 4) latency table")
    table = np.zeros((len(KERNEL_CHOICES), max_ch + 1, max_ch + 1), np.float32)
    splits_axis = np.arange(max_ch + 1, dtype=np.float32)
    for ki, k in enumerate(KERNEL_CHOICES):
        rk = rows[rows[:, 2] == k]
        if len(rk) == 0:
            raise ValueError(f"no measured rows for kernel {k}")
        ch_ins = np.unique(rk[:, 0])
        # per measured ch_in: a dense latency line over ch_split (1-D interp,
        # edge-clamped)
        lines = {}
        for c in ch_ins:
            rc = rk[rk[:, 0] == c]
            order = np.argsort(rc[:, 1], kind="stable")
            s, v = rc[order, 1], rc[order, 3]
            # duplicate measured splits (repeat runs): average them
            su, inv = np.unique(s, return_inverse=True)
            vu = np.zeros_like(su)
            np.add.at(vu, inv, v)
            vu /= np.bincount(inv).astype(vu.dtype)
            lines[float(c)] = np.interp(splits_axis, su, vu)
        # linear blend between the two measured ch_in lines bracketing ch0
        cs = np.asarray(sorted(lines))
        for ch0 in range(max_ch + 1):
            j = int(np.searchsorted(cs, ch0))
            if j == 0:
                table[ki, :, ch0] = lines[float(cs[0])]
            elif j >= len(cs):
                table[ki, :, ch0] = lines[float(cs[-1])]
            else:
                lo, hi = float(cs[j - 1]), float(cs[j])
                w = (ch0 - lo) / (hi - lo)
                table[ki, :, ch0] = (1.0 - w) * lines[lo] + w * lines[hi]
    return table


def densify_from_predictor(predictor, max_ch):
    """Dense (3, max_ch+1, max_ch+1) latency table from a trained
    SpeedPredictor MLP (nas/speed_model.py) — the packaged
    ``*_predictor.msgpack`` artifacts' consumer: the MLP interpolates the
    measured configs, so every (ch_mask, ch_split) the search can reach gets
    a learned latency instead of a copy of its nearest measured neighbor.
    Predictions are clamped at >= 0 (an unconstrained MLP can dip negative
    far outside its training range, which would make SpeedLoss reward
    impossible architectures).

    predictor: bare params (3-feature default architecture) or the
    (params, model) pair from ``load_predictor``."""
    import jax as _jax

    from mobilesuperresolution_tpu.nas.speed_model import SpeedPredictor

    if isinstance(predictor, tuple):
        predictor_params, model = predictor
    else:
        predictor_params, model = predictor, SpeedPredictor(num_feat=3)
    if model.num_feat != 3:
        raise ValueError(
            f"predictor takes {model.num_feat} features; the search's block "
            "descriptor is (ch_in, ch_split, kernel) — the reference's "
            "4-feature S10/S21 predictors describe its earlier (IN, M1, M2) "
            "block schema (export_onnx.py:28-35) and cannot drive this search"
        )
    ks = np.asarray(KERNEL_CHOICES, np.float32)
    grid = np.stack(
        np.meshgrid(
            ks,
            np.arange(max_ch + 1, dtype=np.float32),  # ch_split
            np.arange(max_ch + 1, dtype=np.float32),  # ch_mask (= ch_in)
            indexing="ij",
        ),
        axis=-1,
    )  # (3, C+1, C+1, 3) ordered [k, split, mask]
    feats = grid.reshape(-1, 3)[:, [2, 1, 0]]  # → (ch_in, ch_split, kernel)
    pred = _jax.jit(lambda p, x: model.apply({"params": p}, x)[:, 0])(
        predictor_params, jnp.asarray(feats)
    )
    table = np.asarray(pred, np.float32).reshape(
        len(KERNEL_CHOICES), max_ch + 1, max_ch + 1
    )
    return np.maximum(table, 0.0)


def get_ori_speed(num_blocks=4, num_residual_units=12):
    """Supernet baseline speed: num_blocks × analytic block speed at k=7 with
    all channels active (speed_models/helpers.py:5-15 via
    estimateByChannelNum([units, units, 7]))."""
    block = analytic_block_speed(num_residual_units, num_residual_units, 7)
    return float(num_blocks * block)


class TableSpeedEstimator:
    """Nearest-config lookup over a measured latency table.

    Table rows are (ch_in, ch_split, kernel, latency_ms) — the same schema the
    reference's parsed mobile benchmarks use
    (speed_models/speed_data/data_generate_from_txt.py:83); here the rows come
    from the on-TPU timing harness.
    """

    def __init__(self, rows):
        rows = np.asarray(rows, dtype=np.float32)
        if rows.ndim != 2 or rows.shape[1] != 4:
            raise ValueError("expected (N, 4) latency table")
        self.configs = rows[:, :3]
        self.latencies = rows[:, 3]

    def __call__(self, ch_mask, ch_split, kernel):
        q = np.asarray([ch_mask, ch_split, kernel], dtype=np.float32)
        d = np.sum((self.configs - q) ** 2, axis=1)
        return float(self.latencies[np.argmin(d)])

    @classmethod
    def load(cls, path):
        return cls(np.load(path))
