"""SISR pretraining entry (reference: pretrain.py).

Usage:
  python -m mobilesuperresolution_tpu.cli.pretrain \
      --job_dir runs/x2 --dataset div2k --eval_datasets set5 \
      --model_type BASIC_MODEL --scale 2

Semantics kept: L1 loss, Adam + MultiStepLR([E/2, 9E/10], γ=0.3)
(pretrain.py:135-143), per-epoch eval + checkpointing; data parallelism via
the mesh 'data' axis (replacing DDP, SURVEY §5.8); real --resume.
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

from mobilesuperresolution_tpu.cli.common_cli import (
    base_parser,
    eval_modules,
    parse_with_plugins,
    train_steps_per_epoch,
)
from mobilesuperresolution_tpu.core import AverageMeter, LoggingTool, modes
from mobilesuperresolution_tpu.core.metrics_writer import MetricsWriter
from mobilesuperresolution_tpu.core.utils import attr_extractor, loss_printer
from mobilesuperresolution_tpu.data.isr import batch_iterator
from mobilesuperresolution_tpu.models import get_model
from mobilesuperresolution_tpu.parallel import make_mesh, shard_batch
from mobilesuperresolution_tpu.train.checkpoint import CheckpointManager, save_params_npz, load_params_npz
from mobilesuperresolution_tpu.train.evaluate import evaluate
from mobilesuperresolution_tpu.train.state import create_train_state, multistep_adam
from mobilesuperresolution_tpu.train.steps import make_sisr_step


@functools.lru_cache(maxsize=8)
def _jitted_eval_apply(model):
    # ONE jitted forward per model for the whole run, with params passed as
    # an ARGUMENT: a per-epoch closure over the weights would constant-fold
    # them into a fresh executable every epoch (nothing cacheable across
    # per-epoch eval calls). flax modules are frozen dataclasses — hashable.
    return jax.jit(lambda p, x: model.apply({"params": p}, x))


def _eval_radius(model):
    """Receptive radius from the MODEL, not flags — retrain_searched parses
    without the model plugin, so params.num_blocks may not exist. Over-
    estimating never breaks exactness, only efficiency."""
    from mobilesuperresolution_tpu.parallel.halo import receptive_radius_wdsr

    if hasattr(model, "idx"):  # searched ResultNet: exact per-block kernels
        nb = len(model.idx)
        k = max(b[2] for b in model.idx)
    else:
        nb = model.num_blocks
        k = 3 if type(model).__name__ == "BasicModel" else 7
    return receptive_radius_wdsr(nb, block_kernel=k) + 2


def run_evaluation(params, state, model, eval_mods, logging, epoch):
    p = state.params
    if jax.process_count() > 1:
        # params are replicated over the global mesh; take a local host copy
        # so the chief's eval jit stays a purely local computation
        p = jax.device_get(p)
    jitted = _jitted_eval_apply(model)
    fwd = lambda lr_img: jitted(p, lr_img)
    if getattr(params, "eval_tile", 0):
        from mobilesuperresolution_tpu.train.eval_tiling import make_tiled_forward

        fwd = make_tiled_forward(
            fwd, params.scale, _eval_radius(model), tile=params.eval_tile
        )
    results = {}
    for name, mod in eval_mods:
        ds = mod.get_dataset(modes.EVAL, params)
        batches = batch_iterator(ds, 1)
        res = evaluate(
            lambda lr_img, oh, ow: fwd(lr_img),
            batches,
            scale=params.scale,
            job_dir=params.job_dir,
            eval_data_name=name,
            save=params.save_eval_images,
        )
        results[name] = res.as_dict()
        logging.info(
            f"[epoch {epoch}] {name}: "
            + "  ".join(f"{k}={v:.4f}" for k, v in results[name].items())
        )
    return results


def main(argv=None):
    parser = base_parser("SISR pretraining (TPU)")
    parser.add_argument(
        "--spatial_shards", type=int, default=1,
        help="Shard the patch HEIGHT over this many devices (mesh 'spatial' "
        "axis) with exact-gradient overlap windows — enables training on "
        "patches larger than one device's activation memory "
        "(parallel/spatial_train.py). 1 = plain data parallelism.",
    )
    params, dataset_module = parse_with_plugins(parser, argv)
    logging = LoggingTool(params.job_dir)
    logging.info(attr_extractor(params))
    if params.debug:
        jax.config.update("jax_debug_nans", True)
    if getattr(params, "quantize", "none") != "none" and not params.eval_only:
        # round() has zero gradient a.e. — a quantized forward would
        # silently stop training
        raise SystemExit("--quantize is inference-only: add --eval_only")

    mesh = make_mesh(spatial=params.spatial_shards)
    model = get_model(params)

    train_ds = None if params.eval_only else dataset_module.get_dataset(modes.TRAIN, params)
    steps_per_epoch = (
        train_steps_per_epoch(len(train_ds), params.train_batch_size)
        if train_ds
        else 1
    )
    # linear LR scaling by world size (pretrain.py:216-217): the global batch
    # is train_batch_size × process_count (per-host loading)
    tx = multistep_adam(
        params.learning_rate * jax.process_count(), steps_per_epoch, params.epochs
    )
    sample = jnp.zeros((1, params.lr_patch_size, params.lr_patch_size, 3))
    state = create_train_state(model, jax.random.key(params.seed), sample, tx)

    if params.eval_model:
        state = state.replace(params=load_params_npz(params.eval_model, state.params))

    ckpt = CheckpointManager(params.job_dir)
    start_epoch = 0
    resume_batch = 0
    if params.resume:
        state, start_epoch = ckpt.restore(state)
        ex = ckpt.last_extra if isinstance(ckpt.last_extra, dict) else {}
        resume_batch = int(ex.get("batches_done", 0))
        if resume_batch >= steps_per_epoch:
            resume_batch = 0  # preempted ON the last batch: epoch complete
        logging.info(
            f"resumed from epoch {start_epoch}"
            + (f", batch {resume_batch}" if resume_batch else "")
        )

    eval_mods = eval_modules(params)
    if params.eval_only:
        run_evaluation(params, state, model, eval_mods, logging, start_epoch)
        return

    if params.model_type != "BASIC_MODEL":
        # The reference's pretrain.py NAS path crashes too (model returns
        # (sr, speed_accu) but the loop does criterion(sr, hr),
        # pretrain.py:71-74); NAS training happens inside search.py phases.
        raise ValueError(
            "pretrain trains BASIC_MODEL only — use cli.search for the NAS "
            "supernet and cli.retrain_searched for the searched net"
        )
    if params.spatial_shards > 1:
        from mobilesuperresolution_tpu.parallel import make_spatial_sisr_step
        from mobilesuperresolution_tpu.parallel.halo import receptive_radius_wdsr

        radius = receptive_radius_wdsr(params.num_blocks, block_kernel=3)
        step = make_spatial_sisr_step(state, mesh, radius=radius, scale=params.scale)
    else:
        step = make_sisr_step(state)
    writer = MetricsWriter(params.job_dir)
    from mobilesuperresolution_tpu.train.preemption import (
        PreemptionGuard,
        save_midepoch,
    )

    guard = PreemptionGuard(max_steps=params.max_steps_per_run)
    from mobilesuperresolution_tpu.core.profiling import StepProfiler

    prof = StepProfiler(params.job_dir, params.xla_profile_steps)
    # a mid-epoch preemption checkpoint re-enters its epoch at resume_batch;
    # patch sampling is a pure function of (seed+epoch, index) so the replay
    # is exact (train/preemption.py, tests/test_preemption.py)
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
                        "mid-epoch checkpoint written, exiting cleanly "
                        "(--resume replays the rest of the epoch exactly)"
                    )
                    writer.flush()
                    return
                if (
                    params.checkpoint_every_steps
                    and (bidx + 1) % params.checkpoint_every_steps == 0
                    and bidx + 1 < steps_per_epoch
                ):
                    # crash-resilience: a hard kill loses at most N steps
                    save_midepoch(ckpt, params.job_dir, epoch, state, bidx + 1)
            logging.info(
                f"epoch {epoch}: loss={meter.avg:.4e} "
                f"({meter.count} steps, {time.time() - t0:.1f}s) "
                + loss_printer({k: v for k, v in metrics.items()})
            )
            writer.scalar("training_loss_smooth", meter.avg, epoch)
            if jax.process_index() == 0:
                # rank-0 eval, matching the reference (params are replicated,
                # so the chief evaluates on its local devices only)
                results = run_evaluation(
                    params, state, model, eval_mods, logging, epoch
                )
                for name, vals in results.items():
                    writer.scalars(vals, epoch, prefix=f"{name}/")
            # force: upgrade any mid-epoch preemption save of this same epoch
            ckpt.save(epoch, state, force=True)  # all processes: orbax coordinates
            if jax.process_index() == 0:
                save_params_npz(params.job_dir, state.params)
    finally:
        prof.close()  # flush a still-open trace on any exit path
    writer.flush()
    logging.info("Finish Training")


if __name__ == "__main__":
    main()
