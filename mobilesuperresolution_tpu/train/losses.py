"""Training losses (reference: pretrain.py L1,
train_video_superresolution.py:43-53 Charbonnier)."""

import jax.numpy as jnp


def l1_loss(sr, hr):
    return jnp.mean(jnp.abs(sr - hr))


def charbonnier_loss(sr, hr, eps=1e-12):
    """sqrt(diff^2 + 1e-12), mean — the reference puts eps *inside* the sqrt
    un-squared (train_video_superresolution.py:48-52)."""
    diff = sr - hr
    return jnp.mean(jnp.sqrt(diff * diff + eps))
