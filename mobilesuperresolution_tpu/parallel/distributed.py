"""Multi-host (multi-process) runtime bootstrap.

The reference trains across processes with
``torch.distributed.init_process_group('nccl', init_method='env://')`` +
``LOCAL_RANK`` (pretrain.py:153-159, search.py:194-195,
train_video_superresolution.py:184-185). The TPU-native equivalent is
``jax.distributed.initialize()``: after it, ``jax.devices()`` is the GLOBAL
device list, ``make_mesh`` spans all hosts, and the gradient all-reduce in the
pjit train step rides ICI across the pod slice with no further code.

Two entry styles, mirroring torchrun's env:// vs explicit rendezvous:
- auto (``--distributed``): ``jax.distributed.initialize()`` with no args —
  on TPU pod slices JAX reads the topology from the TPU runtime/env
  (the torchrun-env:// analog).
- explicit: ``--coordinator_address host:port --num_processes N
  --process_id I`` — any fleet, including multi-process CPU clusters used by
  the tests (gloo collectives).

Must be called before the first JAX backend touch; ``parse_with_plugins``
calls :func:`initialize_from_params` immediately after flag parsing.
"""

import os

import jax

_initialized = False


def initialize(coordinator_address=None, num_processes=None, process_id=None,
               local_device_ids=None):
    """Idempotent ``jax.distributed.initialize`` wrapper."""
    global _initialized
    if _initialized:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    # The shutdown barrier fires when the fastest process finishes its job;
    # the slowest must reach it within this window or the whole cluster is
    # torn down ("Shutdown barrier has failed"). Per-host epoch tails
    # (chief-only eval/checkpoint IO) and contended hosts can exceed the
    # 300 s JAX default, so default higher and leave an env escape hatch.
    kwargs["shutdown_timeout_seconds"] = int(
        os.environ.get("MSR_DISTRIBUTED_SHUTDOWN_TIMEOUT", "1800"))
    kwargs["initialization_timeout"] = int(
        os.environ.get("MSR_DISTRIBUTED_INIT_TIMEOUT", "600"))
    jax.distributed.initialize(**kwargs)
    _initialized = True


def initialize_from_params(params):
    """CLI hook: join a multi-process job if the flags (or env) ask for it.

    Returns True if the distributed runtime was initialized."""
    explicit = getattr(params, "coordinator_address", None)
    auto = getattr(params, "distributed", False)
    if not explicit and not auto:
        return False
    if explicit:
        n = getattr(params, "num_processes", None)
        i = getattr(params, "process_id", None)
        if n is None or i is None:
            raise ValueError(
                "--coordinator_address requires --num_processes and "
                "--process_id (torchrun-style explicit rendezvous)"
            )
        initialize(coordinator_address=explicit, num_processes=n, process_id=i)
    else:
        initialize()  # TPU-pod auto-detection
    return True


def is_initialized():
    return _initialized


def is_primary():
    """Rank-0 gate (the reference's ``params.local_rank == 0``)."""
    return jax.process_index() == 0
