"""NAS supernet: searchable WDSR-B (depth / width / kernel-size search).

Reference: models/wdsr_b.py — ``NAS_MODEL`` (30-250), ``Split_Block`` (405-501),
``MyAggregationLayer`` (503-554). TPU-native redesign decisions:

- Channel gates (the reference's depthwise-1x1 ``BinaryConv2d``) are (C,) STE
  gate vectors multiplied onto NHWC activations — XLA fuses the multiply into
  the adjacent convolution, so the mask is free at runtime.
- The block-skip gate (``ConditionFunction``) is the ``ops.ste.condition``
  custom-VJP; train and eval use the same masked arithmetic form
  (beta ∈ {0,1} makes them numerically identical), so a single jitted program
  serves both — no Python branch per block (reference wdsr_b.py:539-546).
- The reference's ``beta1/beta2`` buffers always equal
  ``condition(alpha1, alpha2)`` after the first step; we derive them instead of
  storing them.
- Latency accumulates *through the forward pass* as a traced scalar. By
  default the per-block latency estimate is stop-gradient'ed exactly like the
  reference's ``@torch.no_grad()`` estimator (speed_models/speed_estimator.py:
  56-76) — gradients reach the alphas only through beta2. Setting
  ``differentiable_speed=True`` upgrades to STE-differentiable channel counts
  and live kernel-mix weights (the fix the reference left as a TODO).

Structure per block (Split_Block.forward_body, wdsr_b.py:482-496):
  x1 = split_gate * x ; x2 = x - x1
  x3 = x2 + Σ_k softmax(alpha)_k · ReLU(ConvSep_k(x1)) + x1   (k ∈ {3,5,7})
  out = x2 + split_gate * x3
with ConvSep = depthwise kxk WN-conv → ReLU → 1x1 WN-conv, and the trailing
ReLU from the reference's Sequential(Conv_sep, ReLU) branch (wdsr_b.py:455-460).
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mobilesuperresolution_tpu.nas.speed_estimator import (
    KERNEL_CHOICES,  # one source of truth: the branch mix and the latency
    block_speed_from_gates,  # vector must agree on the kernel menu
)
from mobilesuperresolution_tpu.ops.layers import WNConv, depth_to_space
from mobilesuperresolution_tpu.ops.ste import binary_mask, condition, rounding


def gate_init(key, shape, dtype=jnp.float32):
    """BinaryConv2d weight init: Uniform(0.5, 1) (models/ops.py:14)."""
    return jax.random.uniform(key, shape, dtype, 0.5, 1.0)


def _uniform_init(lo, hi):
    return lambda key, shape, dtype=jnp.float32: jax.random.uniform(
        key, shape, dtype, lo, hi
    )


class ConvSep(nn.Module):
    """Separable conv branch: depthwise kxk → ReLU → 1x1, all weight-normed
    with torch's wrap-time g (= ||v||) — reference wdsr_b.py:375-402
    (seperate_type=True is the configuration the supernet uses)."""

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        y = WNConv(ch, self.kernel_size, g_init=None, feature_group_count=ch)(x)
        y = nn.relu(y)
        y = WNConv(self.features, 1, g_init=None)(y)
        return y


class SplitBlock(nn.Module):
    """Searchable block: channel split + 3 parallel kernel branches + skip gate.

    Owns its gates (split_w, alpha, alpha1, alpha2) and computes its own
    latency estimate from them plus the model-wide mask gate.
    """

    num_residual_units: int
    differentiable_speed: bool = False

    @nn.compact
    def __call__(self, x, mask_w, speed_accu, speed_table=None):
        r = self.num_residual_units
        split_w = self.param("split_w", gate_init, (r,), jnp.float32)
        alpha = self.param("alpha", _uniform_init(0.5, 1.5), (3,), jnp.float32)
        # Skip / preserve gates (reference inits: U(0, 0.2) and U(0.8, 1)).
        alpha1 = self.param("alpha1", _uniform_init(0.0, 0.2), (), jnp.float32)
        alpha2 = self.param("alpha2", _uniform_init(0.8, 1.0), (), jnp.float32)

        speed_curr = block_speed_from_gates(
            mask_w,
            split_w,
            alpha,
            differentiable=self.differentiable_speed,
            speed_table=speed_table,
        )

        dt = x.dtype
        # split gate uses least_channel=0 (reference wdsr_b.py:424)
        m_split = binary_mask(split_w, least_channel=0).astype(dt)
        x1 = x * m_split
        x2 = x - x1
        pro = jax.nn.softmax(alpha).astype(dt)
        x3 = x2
        for i, k in enumerate(KERNEL_CHOICES):
            # the reference wraps each branch as Sequential(Conv_sep, ReLU)
            # (wdsr_b.py:455-460) — the trailing ReLU applies BEFORE the
            # softmax mixing weight
            x3 = x3 + nn.relu(ConvSep(r, k, name=f"branch_{k}")(x1)) * pro[i]
        x3 = x3 + x1
        sr2 = x2 + x3 * m_split

        beta1, beta2 = condition(alpha1, alpha2)
        out = beta1.astype(dt) * x + beta2.astype(dt) * sr2
        speed_accu = beta2 * speed_curr + speed_accu
        return out, speed_accu


class NASModel(nn.Module):
    """The searchable WDSR-B supernet. __call__ returns (sr, speed_accu).

    width_search=True is the canonical configuration (the reference's
    non-width-search forward crashes — SURVEY §2.2 #8); with
    width_search=False the model-wide mask gate is simply not applied.
    """

    num_blocks: int = 16
    num_residual_units: int = 32
    scale: int = 2
    num_channels: int = 3
    image_mean: float = 0.5
    width_search: bool = True
    differentiable_speed: bool = False
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, speed_table=None):
        """speed_table: optional dense (3, C+1, C+1) measured-latency table
        (nas.speed_estimator.densify_speed_table) — switches the latency
        model from the analytic fallback to on-TPU measurements."""
        in_dtype = x.dtype
        r = self.num_residual_units
        if speed_table is not None and speed_table.shape[-1] < r + 1:
            # the in-jit lookup would silently CLAMP channel indices past the
            # table edge (wrong latencies, no error) — reject at trace time
            raise ValueError(
                f"speed_table covers channels 0..{speed_table.shape[-1] - 1} "
                f"but num_residual_units={r}; re-densify with "
                f"max_ch >= {r} (nas.speed_estimator.densify_speed_table)"
            )
        num_outputs = self.scale * self.scale * self.num_channels
        mask_w = self.param("mask_w", gate_init, (r,), jnp.float32)

        x = x.astype(self.compute_dtype) - jnp.asarray(
            self.image_mean, self.compute_dtype
        )
        y = WNConv(r, 3, g_init=1.0, name="head")(x)
        m = binary_mask(mask_w, least_channel=8).astype(y.dtype)

        speed_accu = jnp.zeros((), jnp.float32)
        for i in range(self.num_blocks):
            if self.width_search:
                y = y * m
            y, speed_accu = SplitBlock(
                r,
                differentiable_speed=self.differentiable_speed,
                name=f"block_{i}",
            )(y, mask_w, speed_accu, speed_table)
        if self.width_search:
            y = y * m
        y = WNConv(num_outputs, 3, g_init=1.0, name="tail")(y)
        y = y + WNConv(num_outputs, 5, g_init=1.0, name="skip")(x)
        if self.scale > 1:
            y = depth_to_space(y, self.scale)
        out = y + jnp.asarray(self.image_mean, self.compute_dtype)
        return out.astype(in_dtype), speed_accu


# ---------------------------------------------------------------------------
# Host-side introspection over a params pytree (reference wdsr_b.py:139-233).
# ---------------------------------------------------------------------------


def _blocks(params):
    i = 0
    while f"block_{i}" in params:
        yield i, params[f"block_{i}"]
        i += 1


def get_block_status(params):
    """Indices of surviving (non-skipped) blocks: alpha1 < alpha2
    (the softmax in the reference is monotonic so the raw comparison is
    equivalent — wdsr_b.py:148-157)."""
    return [i for i, b in _blocks(params) if float(b["alpha1"]) < float(b["alpha2"])]


def get_current_blocks(params):
    return len(get_block_status(params))


def get_width_from_block_idx(params, remain_block_idx):
    """Per-surviving-block [active_mask_channels, active_split∧mask_channels,
    best_kernel] (wdsr_b.py:159-183)."""
    mask_bin = rounding(jnp.asarray(params["mask_w"]))
    out = []
    for i, b in _blocks(params):
        if i not in remain_block_idx:
            continue
        split_bin = rounding(jnp.asarray(b["split_w"]))
        out.append(
            [
                int(jnp.sum(mask_bin)),
                int(jnp.sum(mask_bin * split_bin)),
                KERNEL_CHOICES[int(jnp.argmax(b["alpha"]))],
            ]
        )
    return out
