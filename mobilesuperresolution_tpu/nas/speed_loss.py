"""Latency loss (reference: utils/loss.py:9-24)."""

import jax.numpy as jnp


class SpeedLoss:
    """loss = reduce((speed - target)/scale) * gamma with 'clamp' (penalize
    only being slower than target), 'mse', or 'abs' reduction."""

    def __init__(self, scale=1.0):
        self.scale = float(scale)

    def __call__(self, speed, target, gamma=0.01, method="clamp"):
        assert method in ("mse", "clamp", "abs")
        diff = (speed - target) / self.scale
        if method == "clamp":
            loss = jnp.maximum(diff, 0.0)
        elif method == "mse":
            loss = diff**2
        else:
            loss = jnp.abs(diff)
        return jnp.mean(loss) * gamma
