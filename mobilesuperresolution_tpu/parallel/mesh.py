"""Device-mesh utilities — the TPU-native replacement for the reference's
NCCL/DDP stack (pretrain.py:157-158,239; SURVEY §5.8).

Design: one ``jax.sharding.Mesh`` with axes
- ``data``    — batch (data parallelism; gradient psum rides ICI implicitly)
- ``spatial`` — image height (spatially-sharded inference with halo exchange,
  the principled version of the reference's overlap patch tiling)

Training is one pjit-compiled step with the batch sharded over ``data`` and
params replicated; XLA inserts the gradient all-reduce. Per-host data loading
replaces DistributedSampler (shard file lists by ``jax.process_index()``).
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data=None, spatial=1, devices=None):
    """Create a (data, spatial) mesh. ``data=None`` uses all remaining
    devices.

    When using all devices, the assignment goes through
    ``mesh_utils.create_device_mesh`` so on a real pod slice the axes follow
    the physical topology (the latency-sensitive ``spatial`` halo exchanges
    ride contiguous ICI neighbors instead of whatever order ``jax.devices()``
    enumerates); an explicit ``devices`` subset (tests) keeps the plain
    reshape."""
    explicit = devices is not None
    devices = devices if explicit else jax.devices()
    n = len(devices)
    if data is None:
        if n % spatial != 0:
            raise ValueError(f"{n} devices not divisible by spatial={spatial}")
        data = n // spatial
    if data * spatial != n:
        raise ValueError(f"{data}x{spatial} != {n} devices")
    if not explicit:
        try:
            from jax.experimental import mesh_utils

            dev_array = mesh_utils.create_device_mesh((data, spatial))
        except Exception:  # single-device/virtual-CPU corner cases
            dev_array = np.asarray(devices).reshape(data, spatial)
    else:
        dev_array = np.asarray(devices).reshape(data, spatial)
    return Mesh(dev_array, axis_names=("data", "spatial"))


def data_sharding(mesh, ndim=4):
    """Batch-dim sharding over the 'data' axis for an N-d array."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch):
    """Place a pytree of host arrays with the leading dim sharded over
    'data'.

    Single-process: a plain sharded device_put. Multi-process (after
    ``parallel.distributed.initialize``): each host passes only ITS slice of
    the global batch (the per-host loading that replaces DistributedSampler,
    data/isr.py ``shard_by_process``) and the global array is assembled with
    ``jax.make_array_from_process_local_data`` — the global batch dim is
    local_batch × process_count."""
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                data_sharding(mesh, np.ndim(x)), np.asarray(x)
            ),
            batch,
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), batch
    )
