"""NAS search entry — the signature workload (reference: search.py).

Usage:
  python -m mobilesuperresolution_tpu.cli.search \
      --job_dir runs/search --dataset div2k --eval_datasets set5 \
      --scale 2 --num_blocks 16 --num_residual_units 32 --width_search \
      --speed_target 500 --width_epochs 15 --epochs 15 --kernel_epochs 10

Three sequential phases (width → width+length → kernel) annealing a latency
target; logs the surviving architecture to <job_dir>/block_index.txt — the
artifact every downstream model consumes.
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
from mobilesuperresolution_tpu.core.metrics_writer import MetricsWriter
from mobilesuperresolution_tpu.core.utils import SpeedScheduler, attr_extractor
from mobilesuperresolution_tpu.data.isr import batch_iterator
from mobilesuperresolution_tpu.models import get_model
from mobilesuperresolution_tpu.models.wdsr_nas import (
    get_block_status,
    get_current_blocks,
    get_width_from_block_idx,
)
from mobilesuperresolution_tpu.nas import SpeedLoss, append_block_index, get_ori_speed
from mobilesuperresolution_tpu.nas.speed_estimator import KERNEL_CHOICES
from mobilesuperresolution_tpu.nas.search import (
    PHASES,
    phase_epochs,
    phase_lr,
    phase_trainable_mask,
)
from mobilesuperresolution_tpu.parallel import make_mesh, shard_batch
from mobilesuperresolution_tpu.train.checkpoint import CheckpointManager, save_params_npz
from mobilesuperresolution_tpu.train.state import create_train_state, multistep_adam
from mobilesuperresolution_tpu.train.steps import make_search_step


def add_search_args(parser):
    parser.add_argument("--speed_target", type=float, default=40.0,
                        help="Latency target in ms (search.py:485-486).")
    parser.add_argument("--width_epochs", type=int, default=15)
    parser.add_argument("--kernel_epochs", type=int, default=10)
    parser.add_argument("--no_speed_scheduler", action="store_true")
    parser.add_argument("--weight_sr_l1", type=float, default=1.0)
    parser.add_argument("--weight_speed", type=float, default=0.1,
                        help="loss_config.py weights.")
    parser.add_argument("--differentiable_speed", action="store_true",
                        help="Make the latency estimate STE-differentiable "
                        "(the reference leaves it no-grad).")
    parser.add_argument("--speed_table", type=str, default=None,
                        help="Measured (N,4) latency table: a .npy path from "
                        "kernels/timing.py, a packaged device name (e.g. "
                        "'tpu_v5_lite', 'huawei_p30_cpu'), or 'auto' for the "
                        "current backend's checked-in table. Replaces the "
                        "analytic fallback with real measurements. NOTE: "
                        "packaged TPU latencies are measured at the NEMO "
                        "protocol shape hw=240x426 (kernels/timing.py; the "
                        "reference measures the same LR resolution, "
                        "datasets/_vsr.py:470) — for a very different "
                        "deployment shape, re-measure with "
                        "--build_speed_table.")
    parser.add_argument("--speed_table_fill", type=str, default="linear",
                        choices=("linear", "nearest"),
                        help="How off-grid (ch_mask, ch_split) configs get "
                        "latencies from the measured table: 'linear' "
                        "interpolation (smooth search signal) or 'nearest' "
                        "measured config (piecewise-constant).")
    parser.add_argument("--speed_predictor", type=str, default=None,
                        help="Trained SpeedPredictor weights: a .msgpack path "
                        "(nas/speed_model.py), a packaged device name (e.g. "
                        "'tpu_v5_lite'), or 'auto'. The MLP fills the dense "
                        "latency table — learned interpolation of the "
                        "measured configs (the reference's estimateByMask "
                        "path its TODO disabled, speed_estimator.py:70-73). "
                        "Mutually exclusive with --speed_table.")
    parser.add_argument("--build_speed_table", action="store_true",
                        help="Run the on-TPU timing harness first and use the "
                        "resulting table (written to <job_dir>/speed_table.npy).")
    parser.add_argument("--log_steps", type=int, default=100)


def main(argv=None):
    parser = base_parser("NAS search (TPU)")
    add_search_args(parser)
    params, dataset_module = parse_with_plugins(parser, argv)
    params.model_type = "NAS_MODEL"
    if not getattr(params, "width_search", False):
        params.width_search = True  # canonical configuration (SURVEY §2.2 #8)
    logging = LoggingTool(params.job_dir)
    logging.info(attr_extractor(params))
    if params.debug:
        # the reference's --debug anomaly detection (search.py:224-228)
        jax.config.update("jax_debug_nans", True)

    mesh = make_mesh(spatial=1)
    model = get_model(params)

    train_ds = dataset_module.get_dataset(modes.TRAIN, params)
    steps_per_epoch = train_steps_per_epoch(len(train_ds), params.train_batch_size)

    speed_table = None
    # flag validation BEFORE the expensive on-TPU measurement sweep
    if params.speed_predictor and (params.speed_table or params.build_speed_table):
        raise SystemExit(
            "--speed_predictor is mutually exclusive with "
            "--speed_table/--build_speed_table"
        )
    if params.build_speed_table:
        import os

        from mobilesuperresolution_tpu.kernels.timing import build_latency_table

        table_path = os.path.join(params.job_dir, "speed_table.npy")
        logging.info("building measured latency table on-TPU ...")
        rows = build_latency_table(
            ch_in_choices=(params.num_residual_units,),
            out_path=table_path,
            method="loop",  # RTT paid once per config, not per run
        )
        params.speed_table = table_path
        logging.info(f"latency table ({rows.shape[0]} rows) → {table_path}")
    if params.speed_table:
        import os as _os

        import numpy as _np

        from mobilesuperresolution_tpu.nas.speed_estimator import (
            densify_speed_table,
            packaged_table_path,
        )

        if not _os.path.exists(params.speed_table):
            resolved = packaged_table_path(
                None if params.speed_table == "auto" else params.speed_table
            )
            if resolved is None:
                import glob as _glob

                from mobilesuperresolution_tpu.nas.speed_estimator import (
                    SPEED_TABLE_DIR,
                )

                shipped = sorted(
                    _os.path.basename(p)[: -len(".npy")]
                    for p in _glob.glob(_os.path.join(SPEED_TABLE_DIR, "*.npy"))
                )
                if params.speed_table == "auto":
                    kind = jax.devices()[0].device_kind
                    head = (
                        "--speed_table auto: no packaged table for this "
                        f"backend (device kind {kind!r})."
                    )
                else:
                    head = (
                        f"--speed_table {params.speed_table!r}: not a file "
                        "and not a packaged table name."
                    )
                raise SystemExit(
                    f"{head} Packaged tables: {shipped}. To measure THIS "
                    "backend, re-run with --build_speed_table (on-TPU timing "
                    "harness, writes <job_dir>/speed_table.npy), or pass one "
                    "of the packaged names to target that device."
                )
            params.speed_table = resolved
        rows = _np.load(params.speed_table)
        speed_table = jnp.asarray(
            densify_speed_table(
                rows,
                max_ch=params.num_residual_units,
                method=params.speed_table_fill,
            )
        )
        logging.info(
            f"using measured latency table from {params.speed_table} "
            f"(fill={params.speed_table_fill})"
        )
    elif params.speed_predictor:
        import os as _os

        from mobilesuperresolution_tpu.nas.speed_estimator import (
            densify_from_predictor,
        )
        from mobilesuperresolution_tpu.nas.speed_model import (
            load_predictor,
            packaged_predictor_path,
        )

        path = params.speed_predictor
        if not _os.path.exists(path):
            path = packaged_predictor_path(
                None if params.speed_predictor == "auto" else params.speed_predictor
            )
            if path is None:
                raise SystemExit(
                    f"--speed_predictor {params.speed_predictor!r}: not a file "
                    "and no packaged predictor of that name "
                    "(nas/speed_tables/*_predictor.msgpack); train one with "
                    "nas.speed_model.train_speed_predictor on a measured table"
                )
        speed_table = jnp.asarray(
            densify_from_predictor(
                load_predictor(path), max_ch=params.num_residual_units
            )
        )
        logging.info(f"using MLP latency predictor from {path}")

    # Supernet baseline speed: with a measured table, num_blocks × the
    # measured full-width k=7 block (the table analog of get_ori_speed =
    # blocks × analytic block_speed(k=7), speed_models/helpers.py:5-15) —
    # the analytic mobile estimate is ~20x the TPU-measured latency, which
    # would skew the SpeedLoss scale and the annealing start.
    if speed_table is not None:
        u = params.num_residual_units
        ori_speed = float(params.num_blocks * speed_table[KERNEL_CHOICES.index(7), u, u])
    else:
        ori_speed = get_ori_speed(params.num_blocks, params.num_residual_units)
    logging.info(f"Supernet Speed: {ori_speed:.02f} ms; target {params.speed_target:.02f} ms")
    if ori_speed <= params.speed_target:
        # Degenerate with measured TPU tables (they can sit ~20x below the
        # analytic mobile estimate the default targets assume): the supernet
        # already meets the target. A (ori−target) scale would be ≤0 and the
        # scheduler would anneal BACKWARDS (tightest target first), so use a
        # target-magnitude loss scale and a constant target instead.
        logging.warning(
            "supernet already meets the speed target — latency pressure only "
            "penalizes regressions above the target"
        )
        speed_loss = SpeedLoss(scale=max(params.speed_target, 1e-6))
        scheduler = SpeedScheduler(
            search_epoch=params.width_epochs + params.epochs,
            total_speed=params.speed_target,  # constant: no annealing ramp
            target_speed=params.speed_target,
            gamma=0.5,
        )
    else:
        speed_loss = SpeedLoss(scale=ori_speed - params.speed_target)
        scheduler = SpeedScheduler(
            search_epoch=params.width_epochs + params.epochs,
            total_speed=ori_speed,
            target_speed=params.speed_target,
            gamma=0.5,
        )

    sample = jnp.zeros((1, params.lr_patch_size, params.lr_patch_size, 3))
    variables = jax.jit(model.init)(jax.random.key(params.seed), sample)
    base_params = variables["params"]
    if params.pretrained:
        # shape-greedy pretrained transfer into the supernet
        # (wdsr_b.py:104-105,235-250): head/tail/skip land; the split-branch
        # block shapes never match WDSR-B's and stay at init
        from mobilesuperresolution_tpu.train.torch_convert import (
            load_pretrained_supernet,
            load_torch_checkpoint,
        )

        if not params.pretrained_path:
            raise SystemExit("--pretrained requires --pretrained_path <wdsr .pt>")
        sd = load_torch_checkpoint(params.pretrained_path)
        base_params, n_copied = load_pretrained_supernet(base_params, sd)
        logging.info(
            f"pretrained transfer from {params.pretrained_path}: "
            f"{n_copied} tensors copied"
        )
    eval_mods = eval_modules(params)
    ckpt = CheckpointManager(params.job_dir)
    writer = MetricsWriter(params.job_dir)

    # REAL resume across the three phases (the reference's search.py --resume
    # is a no-op, SURVEY §5.3): params come from the per-epoch weights npz;
    # epochs up to the checkpoint are skipped below while still advancing the
    # SpeedScheduler so the annealing trajectory is identical; the optimizer
    # state of the partially-completed phase is restored from the Orbax
    # checkpoint (the opt-state structure only matches within a phase — each
    # phase has its own trainable mask).
    start_epoch = 0
    resume_batch = 0
    if params.resume:
        import os as _os

        latest = ckpt.latest_epoch()
        npz = _os.path.join(params.job_dir, "weights", "models.npz")
        has_npz = _os.path.exists(npz)
        if latest and has_npz:
            from mobilesuperresolution_tpu.train.checkpoint import load_params_npz

            base_params = load_params_npz(npz, base_params)
            start_epoch = latest
            ex = ckpt.peek_extra(latest)
            resume_batch = int(ex.get("batches_done", 0)) if ex else 0
            if resume_batch >= steps_per_epoch:
                resume_batch = 0  # preempted ON the last batch: epoch complete
            logging.info(
                f"resuming search from epoch {latest}"
                + (f", batch {resume_batch}" if resume_batch else "")
            )
        elif bool(latest) != has_npz:
            # one artifact without the other = a damaged job dir; training
            # from scratch here would silently overwrite the survivor
            raise RuntimeError(
                f"--resume found inconsistent state in {params.job_dir}: "
                f"checkpoint epoch={latest}, weights npz "
                f"{'present' if has_npz else 'missing'} — repair or clear "
                "the job dir"
            )
        else:
            logging.info("--resume: nothing to resume, starting fresh")

    from mobilesuperresolution_tpu.train.preemption import (
        PreemptionGuard,
        save_midepoch,
    )

    guard = PreemptionGuard(max_steps=params.max_steps_per_run)
    from mobilesuperresolution_tpu.core.profiling import StepProfiler

    prof = StepProfiler(params.job_dir, params.xla_profile_steps)
    epoch = 0
    for phase in PHASES:
        n_epochs = phase_epochs(params, phase)
        if n_epochs == 0:
            continue
        logging.info(f"=== phase {phase}: {n_epochs} epochs ===")
        mask = phase_trainable_mask(base_params, phase)
        tx = multistep_adam(
            phase_lr(params.learning_rate, phase),
            steps_per_epoch,
            n_epochs,
            trainable_mask=mask,
        )
        # build the state directly on the carried params — create_train_state
        # would re-run (and re-compile) the whole supernet init per phase only
        # to discard its params
        from mobilesuperresolution_tpu.train.state import TrainState

        state = TrainState(
            step=0,
            params=base_params,
            opt_state=tx.init(base_params),
            tx=tx,
            apply_fn=model.apply,
        )
        if epoch < start_epoch < epoch + n_epochs or (
            resume_batch and epoch < start_epoch <= epoch + n_epochs
        ):
            # resuming mid-phase (or mid-EPOCH, where the re-entered epoch may
            # be the phase's last): the saved opt state was built with this
            # phase's trainable mask, so the structures match
            state, _ = ckpt.restore(state)
        step = make_search_step(
            state, speed_loss, params.weight_sr_l1, params.weight_speed, speed_table
        )

        with mesh:
            for _ in range(n_epochs):
                epoch += 1
                if phase in ("width", "length") and not params.no_speed_scheduler:
                    speed_target_current = scheduler.step()
                else:
                    speed_target_current = params.speed_target
                if epoch < start_epoch or (epoch == start_epoch and not resume_batch):
                    continue  # already trained before the resume point
                logging.info(f"speed target: {speed_target_current:.2f} ms")
                meter = AverageMeter()
                t0 = time.time()
                # mid-epoch preemption resume re-enters the interrupted epoch
                # at its saved batch position; the (seed+epoch, index)-pure
                # random streams make the replay exact (train/preemption.py)
                sb = resume_batch if epoch == start_epoch else 0
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
                    state, metrics = step(
                        state, shard_batch(mesh, batch), speed_target_current
                    )
                    meter.update(float(metrics["loss"]))
                    prof.step()
                    if guard.step_and_should_stop():
                        save_midepoch(ckpt, params.job_dir, epoch, state, bidx + 1)
                        logging.info(
                            f"preempted in phase {phase} at epoch {epoch} "
                            f"batch {bidx + 1}: mid-epoch checkpoint written, "
                            "exiting cleanly (--resume replays the rest of "
                            "the epoch exactly)"
                        )
                        writer.flush()
                        prof.close()
                        return
                    if (
                        params.checkpoint_every_steps
                        and (bidx + 1) % params.checkpoint_every_steps == 0
                        and bidx + 1 < steps_per_epoch
                    ):
                        # crash-resilience: a hard kill loses at most N steps
                        save_midepoch(ckpt, params.job_dir, epoch, state, bidx + 1)
                    if bidx % params.log_steps == 0:
                        p = jax.device_get(state.params)
                        remain_idx = get_block_status(p)
                        remain_width = get_width_from_block_idx(p, remain_idx)
                        if jax.process_index() == 0:  # chief-only artifact
                            append_block_index(
                                params.job_dir, remain_idx, remain_width
                            )
                        logging.info(
                            f"[{phase} e{epoch} b{bidx}] loss={float(metrics['loss']):.4e} "
                            f"l1={float(metrics['l1']):.4e} "
                            f"speed={float(metrics['speed']):.2f}/{speed_target_current:.2f}ms "
                            f"blocks={len(remain_idx)}"
                        )
                        step_no = int(state.step)
                        writer.scalar("training_loss", float(metrics["loss"]), step_no)
                        writer.scalar("Loss/l1", float(metrics["l1"]), step_no)
                        writer.scalar("Loss/speed", float(metrics["speed_loss"]), step_no)
                        writer.scalar("Arch/#Blocks", len(remain_idx), step_no)
                        writer.scalar("Arch/Speed", float(metrics["speed"]), step_no)
                logging.info(
                    f"[{phase}] epoch {epoch}: loss={meter.avg:.4e} "
                    f"({time.time() - t0:.1f}s)"
                )
                if jax.process_index() == 0:
                    run_evaluation(params, state, model, eval_mods, logging, epoch)
                # force: upgrade any mid-epoch preemption save of this epoch
                ckpt.save(epoch, state, force=True)  # all processes: orbax coordinates
                if jax.process_index() == 0:
                    save_params_npz(params.job_dir, state.params)
        base_params = state.params

    prof.close()  # flush a trace shorter than the requested step count
    # final architecture line
    p = jax.device_get(base_params)
    remain_idx = get_block_status(p)
    remain_width = get_width_from_block_idx(p, remain_idx)
    if jax.process_index() == 0:
        append_block_index(params.job_dir, remain_idx, remain_width)
    logging.info(
        f"final arch: {get_current_blocks(p)} blocks, widths={remain_width}"
    )


if __name__ == "__main__":
    main()
