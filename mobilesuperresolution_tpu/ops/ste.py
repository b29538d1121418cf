"""Straight-through-estimator primitives for the NAS search.

TPU-native re-design of the reference's custom autograd ops:
- ``rounding``: binarize channel gates at >= 0.5 with a top-k floor of
  ``least_channel`` always-on channels (reference: models/ops.py:33-43). The
  floor is non-differentiable by construction, as in the reference.
- ``binary_mask``: differentiable binary channel mask via the residual STE
  trick ``w - stop_grad(w - round(w))`` (reference: models/ops.py:18-26 applies
  it as a depthwise 1x1 conv; here the mask is a plain (C,) gate vector
  multiplied onto NHWC activations, which XLA fuses into the neighboring conv).
- ``condition``: hard skip-vs-keep select with identity gradients to the
  alphas (reference: models/wdsr_b.py:594-616 ``ConditionFunction``).

All forward decisions are data-dependent *values*, not Python control flow, so
everything traces once under jit.
"""

import jax
import jax.numpy as jnp


def rounding(w, least_channel=8):
    """Hard-binarize gate vector ``w`` at >=0.5; if fewer than
    ``least_channel`` gates survive, keep the top-``least_channel`` instead
    (ties included, matching the reference's ``weight >= kth_value``)."""
    w = jnp.asarray(w)
    hard = (w >= 0.5).astype(w.dtype)
    if least_channel <= 0:
        return hard
    if w.size < least_channel:
        # top_k with k > size raises an opaque trace error; say what's wrong
        raise ValueError(
            f"gate vector has {w.size} channels but the channel floor "
            f"(least_channel) is {least_channel} — the supernet needs "
            f"num_residual_units >= {least_channel}"
        )
    kth = jax.lax.top_k(w.reshape(-1), least_channel)[0][-1]
    floor = (w >= kth).astype(w.dtype)
    return jnp.where(jnp.sum(hard) >= least_channel, hard, floor)


def binary_mask(w, least_channel=8):
    """STE-binarized gates: forward = rounding(w), gradient = identity."""
    return w + jax.lax.stop_gradient(rounding(w, least_channel) - w)


def mask_active_count(w, least_channel=8):
    """Number of active channels of a gate vector (non-differentiable scalar,
    reference: speed_models/speed_estimator.py:79-84)."""
    return jax.lax.stop_gradient(jnp.sum(rounding(w, least_channel)))


@jax.custom_vjp
def condition(alpha1, alpha2):
    """Hard-select (beta1, beta2) = (1, 0) if alpha1 >= alpha2 else (0, 1),
    with straight-through gradients d beta1/d alpha1 = d beta2/d alpha2 = 1."""
    keep_skip = alpha1 >= alpha2
    one = jnp.ones_like(alpha1)
    zero = jnp.zeros_like(alpha1)
    beta1 = jnp.where(keep_skip, one, zero)
    beta2 = jnp.where(keep_skip, zero, one)
    return beta1, beta2


def _condition_fwd(alpha1, alpha2):
    return condition(alpha1, alpha2), None


def _condition_bwd(_, grads):
    g1, g2 = grads
    return g1, g2


condition.defvjp(_condition_fwd, _condition_bwd)
