"""Retrain the discrete searched architecture from scratch
(reference: pretrain_simplified_model.py — rebuilds the net from
block_index.txt and trains with L1).
"""

import time

import jax
import jax.numpy as jnp

from mobilesuperresolution_tpu.cli.common_cli import (
    base_parser,
    eval_modules,
    parse_with_plugins,
    train_steps_per_epoch,
)
from mobilesuperresolution_tpu.cli.pretrain import run_evaluation
from mobilesuperresolution_tpu.core import AverageMeter, LoggingTool, modes
from mobilesuperresolution_tpu.core.utils import attr_extractor
from mobilesuperresolution_tpu.data.isr import batch_iterator
from mobilesuperresolution_tpu.models.result_net import ResultNet
from mobilesuperresolution_tpu.parallel import make_mesh, shard_batch
from mobilesuperresolution_tpu.train.checkpoint import CheckpointManager, save_params_npz
from mobilesuperresolution_tpu.train.state import create_train_state, multistep_adam
from mobilesuperresolution_tpu.train.steps import make_sisr_step


def main(argv=None):
    parser = base_parser("Retrain searched architecture (TPU)")
    parser.add_argument("--block_index", type=str, required=True,
                        help="Path to block_index.txt (or its job dir).")
    parser.add_argument("--quantize", choices=["none", "int8"], default="none",
                        help="int8 dynamic-range inference convs for the "
                        "searched net (the model the reference deploys as "
                        "int8 TFLite); --eval_only runs only.")
    params, dataset_module = parse_with_plugins(parser, argv, with_models=False)
    logging = LoggingTool(params.job_dir)
    logging.info(attr_extractor(params))
    if params.debug:
        # the reference's --debug anomaly detection (search.py:224-228)
        jax.config.update("jax_debug_nans", True)

    if params.quantize != "none" and not params.eval_only:
        raise SystemExit("--quantize is inference-only: add --eval_only")
    mesh = make_mesh(spatial=1)
    dtype = jnp.bfloat16 if params.bf16 else jnp.float32
    model = ResultNet.from_artifact(
        params.block_index, scale=params.scale, compute_dtype=dtype,
        quantized=params.quantize == "int8",
    )
    logging.info(f"searched architecture: {model.idx}")

    train_ds = (
        None if params.eval_only else dataset_module.get_dataset(modes.TRAIN, params)
    )
    steps_per_epoch = (
        train_steps_per_epoch(len(train_ds), params.train_batch_size)
        if train_ds
        else 1
    )
    tx = multistep_adam(params.learning_rate, steps_per_epoch, params.epochs)
    sample = jnp.zeros((1, params.lr_patch_size, params.lr_patch_size, 3))
    state = create_train_state(model, jax.random.key(params.seed), sample, tx)

    if params.eval_model:
        from mobilesuperresolution_tpu.train.checkpoint import load_params_npz

        state = state.replace(
            params=load_params_npz(params.eval_model, state.params)
        )

    ckpt = CheckpointManager(params.job_dir)
    start_epoch = 0
    resume_batch = 0
    if params.resume:
        state, start_epoch = ckpt.restore(state)
        ex = ckpt.last_extra if isinstance(ckpt.last_extra, dict) else {}
        resume_batch = int(ex.get("batches_done", 0))
        if resume_batch >= steps_per_epoch:
            resume_batch = 0  # preempted ON the last batch: epoch complete

    eval_mods = eval_modules(params)
    if params.eval_only:
        run_evaluation(params, state, model, eval_mods, logging, start_epoch)
        return

    step = make_sisr_step(state)
    from mobilesuperresolution_tpu.train.preemption import (
        PreemptionGuard,
        save_midepoch,
    )

    guard = PreemptionGuard(max_steps=params.max_steps_per_run)
    from mobilesuperresolution_tpu.core.profiling import StepProfiler

    prof = StepProfiler(params.job_dir, params.xla_profile_steps)
    first_epoch = start_epoch if resume_batch else start_epoch + 1
    try:
      with mesh:
        for epoch in range(first_epoch, params.epochs + 1):
            meter = AverageMeter()
            t0 = time.time()
            sb = resume_batch if epoch == first_epoch else 0
            for bidx, batch in enumerate(
                batch_iterator(
                    train_ds,
                    params.train_batch_size,
                    shuffle=True,
                    seed=params.seed + epoch,
                    drop_last=True,
                    shard_by_process=True,
                    start_batch=sb,
                ),
                start=sb,
            ):
                state, metrics = step(state, shard_batch(mesh, batch))
                meter.update(float(metrics["loss"]))
                prof.step()
                if guard.step_and_should_stop():
                    save_midepoch(ckpt, params.job_dir, epoch, state, bidx + 1)
                    logging.info(
                        f"preempted at epoch {epoch} batch {bidx + 1}: "
                        "mid-epoch checkpoint written, exiting cleanly"
                    )
                    return
                if (
                    params.checkpoint_every_steps
                    and (bidx + 1) % params.checkpoint_every_steps == 0
                    and bidx + 1 < steps_per_epoch
                ):
                    # crash-resilience: a hard kill loses at most N steps
                    save_midepoch(ckpt, params.job_dir, epoch, state, bidx + 1)
            logging.info(
                f"epoch {epoch}: loss={meter.avg:.4e} ({time.time() - t0:.1f}s)"
            )
            if jax.process_index() == 0:
                # chief-gated like pretrain/search/train_vsr — concurrent
                # multi-host writers would tear the shared npz artifact
                run_evaluation(params, state, model, eval_mods, logging, epoch)
            # force: upgrade any mid-epoch preemption save of this same epoch
            ckpt.save(epoch, state, force=True)  # all processes: orbax coordinates
            if jax.process_index() == 0:
                save_params_npz(params.job_dir, state.params)
    finally:
        prof.close()  # flush a still-open trace on any exit path
    logging.info("Finish Training")


if __name__ == "__main__":
    main()
