"""Mesh construction shared by the spatial-VSR test suites."""

import numpy as np

from jax.sharding import Mesh


def spatial_mesh(devs, n_spatial):
    """A 1-axis ('spatial',) mesh over the first n_spatial devices."""
    return Mesh(
        np.asarray(devs[:n_spatial]).reshape(n_spatial), axis_names=("spatial",)
    )
