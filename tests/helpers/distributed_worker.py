"""Subprocess worker for the multi-host runtime tests.

Forms an N-process JAX CPU cluster (gloo collectives) via
``parallel.distributed.initialize`` — the TPU-pod multi-host bootstrap
(reference: torch.distributed.init_process_group('nccl', 'env://'),
pretrain.py:153-159) — then runs the data-parallel SISR train step on a
deterministic global batch and prints {losses, checksum} as JSON.

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
            # feeds only its slice (per-host loading, data/isr.py:146-151)
            batch_size = 2 * 4  # 2 per device at the reference 4-device size
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


if __name__ == "__main__":
    main()
