"""Subprocess worker for the multi-host runtime tests.

Forms an N-process JAX CPU cluster (gloo collectives) via
``parallel.distributed.initialize`` — the TPU-pod multi-host bootstrap
(reference: torch.distributed.init_process_group('nccl', 'env://'),
pretrain.py:153-159) — then runs the data-parallel train step of the chosen
workload on a deterministic global batch and prints {losses, checksum} as
JSON.

Workloads:
- ``sisr``   — BASIC_MODEL L1 pretrain step (pretrain.py:61-82).
- ``search`` — the NAS search step (search.py:290-405): phase-masked
  optimizer, replicated measured speed table, traced latency, annealed
  target; also reports the surviving-architecture introspection
  (remain_idx/remain_width, search.py:83-87) so the test can assert the
  cluster discovers the IDENTICAL architecture as a single process.

Run single-process (``--num_processes 1 --devices_per_process 4``) it
computes the ground truth the cluster must match bit-for-bit in loss.
"""

import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", required=True)
    ap.add_argument("--num_processes", type=int, default=1)
    ap.add_argument("--process_id", type=int, default=0)
    ap.add_argument("--devices_per_process", type=int, default=2)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--workload", choices=("sisr", "search"), default="sisr")
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.devices_per_process}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    if args.num_processes > 1:
        from mobilesuperresolution_tpu.parallel.distributed import initialize

        initialize(
            coordinator_address=f"localhost:{args.port}",
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    if args.workload == "search":
        _run_search(args)
        return

    import jax.numpy as jnp
    import numpy as np

    from mobilesuperresolution_tpu.models import BasicModel
    from mobilesuperresolution_tpu.parallel import make_mesh, shard_batch
    from mobilesuperresolution_tpu.train.state import (
        create_train_state,
        multistep_adam,
    )
    from mobilesuperresolution_tpu.train.steps import make_sisr_step

    model = BasicModel(num_blocks=1, num_residual_units=8, scale=2)
    tx = multistep_adam(1e-3, 10, 10)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 8, 8, 3)), tx
    )
    mesh = make_mesh()
    n_global = len(jax.devices())
    rng = np.random.default_rng(42)
    losses = []
    with mesh:
        step = make_sisr_step(state)
        for _ in range(args.steps):
            # identical GLOBAL batch in every configuration; each process
            # feeds only its slice (per-host loading, data/isr.py:146-151).
            # 2 per GLOBAL device, so any num_processes x devices_per_process
            # split of the same global topology sees the same batch
            batch_size = 2 * n_global
            hr = rng.random((batch_size, 16, 16, 3), dtype=np.float32)
            lr = np.ascontiguousarray(hr[:, ::2, ::2])
            if args.num_processes > 1:
                per = batch_size // args.num_processes
                sl = slice(args.process_id * per, (args.process_id + 1) * per)
                batch = (lr[sl], hr[sl])
            else:
                batch = (lr, hr)
            state, metrics = step(state, shard_batch(mesh, batch))
            losses.append(float(metrics["loss"]))
    checksum = float(
        sum(
            np.abs(np.asarray(jax.device_get(leaf))).sum()
            for leaf in jax.tree_util.tree_leaves(state.params)
        )
    )
    print(
        json.dumps(
            {
                "losses": losses,
                "checksum": checksum,
                "n_devices": n_global,
                "process_count": jax.process_count(),
            }
        )
    )


def _run_search(args):
    """NAS search step over the cluster mesh (search.py:290-405 semantics):
    width-phase trainable mask, replicated measured speed table, two annealed
    latency targets. Reports per-step losses/speeds plus the surviving
    architecture (search.py:83-87, block_index.txt content)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mobilesuperresolution_tpu.models.wdsr_nas import (
        NASModel,
        get_block_status,
        get_width_from_block_idx,
    )
    from mobilesuperresolution_tpu.nas.search import phase_trainable_mask
    from mobilesuperresolution_tpu.nas.speed_estimator import (
        densify_speed_table,
        packaged_table_path,
    )
    from mobilesuperresolution_tpu.nas.speed_loss import SpeedLoss
    from mobilesuperresolution_tpu.parallel import make_mesh, shard_batch
    from mobilesuperresolution_tpu.train.state import TrainState, multistep_adam
    from mobilesuperresolution_tpu.train.steps import make_search_step

    units = 8
    nas = NASModel(num_blocks=2, num_residual_units=units, scale=2)
    params = jax.jit(nas.init)(jax.random.key(3), jnp.zeros((1, 16, 16, 3)))[
        "params"
    ]
    mask = phase_trainable_mask(jax.device_get(params), "width")
    tx = multistep_adam(1e-3, steps_per_epoch=10, epochs=2, trainable_mask=mask)
    table = jnp.asarray(
        densify_speed_table(np.load(packaged_table_path("tpu_v5_lite")), max_ch=units)
    )
    state = TrainState(
        step=0, params=params, opt_state=tx.init(params), tx=tx,
        apply_fn=nas.apply,
    )
    step = make_search_step(state, SpeedLoss(scale=10.0), speed_table=table)

    mesh = make_mesh()
    rng = np.random.default_rng(7)
    losses, speeds = [], []
    targets = [8.0 - 0.5 * i for i in range(args.steps)]  # annealing schedule
    with mesh:
        for target in targets:
            batch_size = 2 * len(jax.devices())  # 2 per GLOBAL device
            hr = rng.random((batch_size, 32, 32, 3), dtype=np.float32)
            lr = np.ascontiguousarray(hr[:, ::2, ::2])
            if args.num_processes > 1:
                per = batch_size // args.num_processes
                sl = slice(args.process_id * per, (args.process_id + 1) * per)
                lr, hr = lr[sl], hr[sl]
            state, metrics = step(state, shard_batch(mesh, (lr, hr)), target)
            losses.append(float(metrics["loss"]))
            speeds.append(float(metrics["speed"]))
    host_params = jax.device_get(state.params)
    remain_idx = get_block_status(host_params)
    checksum = float(
        sum(
            np.abs(np.asarray(leaf)).sum()
            for leaf in jax.tree_util.tree_leaves(host_params)
        )
    )
    print(
        json.dumps(
            {
                "losses": losses,
                "speeds": speeds,
                "remain_idx": [int(i) for i in remain_idx],
                "remain_width": [
                    [int(v) for v in w]
                    for w in get_width_from_block_idx(host_params, remain_idx)
                ],
                "checksum": checksum,
                "n_devices": len(jax.devices()),
                "process_count": jax.process_count(),
            }
        )
    )


if __name__ == "__main__":
    main()
