"""Math helpers (reference: utils/maths.py:4-9 — a 2-way softmax helper,
unused by the training code but part of the public surface)."""

import jax.numpy as jnp


def softmax2(a, b):
    """Numerically-stable softmax over two scalars → (pa, pb)."""
    m = jnp.maximum(a, b)
    ea = jnp.exp(a - m)
    eb = jnp.exp(b - m)
    s = ea + eb
    return ea / s, eb / s
