"""VSR training entry (reference: train_video_superresolution.py).

Usage:
  python -m mobilesuperresolution_tpu.cli.train_vsr \
      --job_dir runs/vsr --dataset reds --model_type basic --scale 4

Semantics kept: Charbonnier L1, model signature (lr, H, W), optimizer
excludes SpyNet params (train_video_superresolution.py:160-163 — here an
optax mask instead of parameter-list surgery), per-epoch eval + checkpoints.
"""

import time

import flax.traverse_util as traverse_util
import jax
import jax.numpy as jnp

from mobilesuperresolution_tpu.cli.common_cli import (
    base_parser,
    eval_modules,
    parse_with_plugins,
    train_steps_per_epoch,
)
from mobilesuperresolution_tpu.core import AverageMeter, LoggingTool, modes
from mobilesuperresolution_tpu.core.utils import attr_extractor
from mobilesuperresolution_tpu.data.isr import batch_iterator
from mobilesuperresolution_tpu.models import get_vsr_model
from mobilesuperresolution_tpu.parallel import make_mesh, shard_batch
from mobilesuperresolution_tpu.train.checkpoint import (
    CheckpointManager,
    load_params_npz,
    save_params_npz,
)
from mobilesuperresolution_tpu.train.evaluate import evaluate
from mobilesuperresolution_tpu.train.state import create_train_state, vsr_multistep_adam
from mobilesuperresolution_tpu.train.steps import make_vsr_step


def spynet_frozen_mask(params):
    """False (frozen) for any leaf under a spynet/flownet submodule."""
    flat = traverse_util.flatten_dict(params)
    return traverse_util.unflatten_dict(
        {k: not any(p in ("spynet", "flownet") for p in k) for k in flat}
    )


def add_vsr_args(parser):
    parser.add_argument(
        "--model_type",
        default="basic",
        choices=["single", "multi", "multi_v1", "basic", "basic_mv", "basic_origin"],
    )
    parser.add_argument("--model_path", type=str, default=None,
                        help="block_index.txt for the 'multi' model.")
    parser.add_argument("--spynet_weights", type=str, default=None,
                        help="Pretrained SpyNet params: .npz, or an "
                        "mmedit/reference .pth checkpoint (converted).")
    parser.add_argument("--chunk_frames", type=int, default=0,
                        help="Evaluate long clips in temporal windows of this "
                        "many output frames (bounded memory; 0 = whole clip). "
                        "Exact for 'single'; approximate for recurrent models "
                        "(basic/basic_origin/multi) — propagation is truncated "
                        "at window edges, controlled by --chunk_overlap, so "
                        "PSNR can differ slightly from whole-clip eval.")
    parser.add_argument("--chunk_overlap", type=int, default=4,
                        help="Context frames on each side of a chunk window.")
    parser.add_argument("--chunk_data_parallel", action="store_true",
                        help="Shard groups of chunk windows over the mesh "
                        "'data' axis (device-parallel long-clip eval).")
    parser.add_argument("--flow_cache", action="store_true",
                        help="With --chunk_frames: compute each SpyNet pair "
                        "flow once and reuse it across overlapping windows "
                        "(serve/flow_cache.py; removes the ~38%% of window "
                        "compute that re-runs SpyNet on shared pairs — "
                        "measure with scripts/bench_flow_cache.py). Matches "
                        "the plain chunked output to float tolerance. SpyNet "
                        "models (basic/basic_origin) only; not combinable "
                        "with --chunk_data_parallel.")
    parser.add_argument("--spatial_shards", type=int, default=1,
                        help="model_type=basic/basic_origin: shard frame "
                        "HEIGHT over this many devices — recurrent "
                        "propagation exchanges halo rows per step over ICI "
                        "(parallel/vsr_spatial.py); SpyNet/reconstruction "
                        "run frame-parallel. Works for eval AND training "
                        "(full frames across chips; Charbonnier gradients "
                        "match the unsharded step). Matches full-frame "
                        "output whenever flow row displacement fits the "
                        "--spatial_max_disp budget. H must divide evenly, "
                        "and H/shards must cover the trunk radius "
                        "(basic_origin's 30-block trunk: >= 61+max_disp "
                        "rows per shard). Mutually exclusive with "
                        "--chunk_frames.")
    parser.add_argument("--spatial_max_disp", type=int, default=8,
                        help="Halo row budget for --spatial_shards: flow dy "
                        "is clipped to ±this many rows (adjacent-frame "
                        "motion at 240p is typically 1-3 px).")
    parser.add_argument("--flow_downscale", type=int, default=1,
                        help="Run SpyNet on 1/d-res frames and upsample the "
                        "flow (basic/basic_origin; 1 = exact reference flows).")
    parser.add_argument("--remat", action="store_true",
                        help="Rematerialize propagation-step trunks in the "
                        "backward pass: O(1) activation memory in clip "
                        "length, identical gradients (basic/basic_mv/"
                        "basic_origin) — train longer --image_batch clips "
                        "than activation memory would allow.")
    parser.add_argument("--quantize", choices=["none", "int8"], default="none",
                        help="int8 dynamic-range inference convs on the TPU "
                        "int8 MXU path — the numerics class of the "
                        "reference's TFLite deployment (all model types "
                        "except multi_v1). Approximate (quality ladder in "
                        "DESIGN.md); inference only.")


def run_vsr_evaluation(params, state, model, eval_mods, logging, epoch):
    results = {}
    eval_params = state.params
    if jax.process_count() > 1:
        # params are replicated over the global mesh; the chief evaluates on
        # a local host copy so its jit stays a purely local computation
        eval_params = jax.device_get(eval_params)
    # ONE jitted forward shared across batches/datasets — a fresh jit wrapper
    # per batch would recompile the recurrent model for every clip.
    jitted = jax.jit(
        lambda p, x, oh, ow: model.apply({"params": p}, x, oh, ow),
        static_argnums=(2, 3),
    )

    def base_fwd(lr_clip, oh, ow):
        return jitted(eval_params, lr_clip, oh, ow)

    if getattr(params, "spatial_shards", 1) > 1:
        if getattr(params, "chunk_frames", 0):
            raise SystemExit(
                "--spatial_shards and --chunk_frames are mutually exclusive "
                "(height sharding already bounds per-device memory)"
            )
        from mobilesuperresolution_tpu.parallel.vsr_spatial import (
            spatial_basicvsr_forward,
        )

        n_dev = len(jax.devices())
        if n_dev % params.spatial_shards:
            raise SystemExit(
                f"--spatial_shards {params.spatial_shards} does not divide "
                f"the {n_dev} available devices"
            )
        # remaining devices sit on the (replicated) data axis
        sp_mesh = make_mesh(
            data=n_dev // params.spatial_shards, spatial=params.spatial_shards
        )
        sp_jitted = jax.jit(
            lambda p, x, oh, ow: spatial_basicvsr_forward(
                model, p, x, oh, ow, sp_mesh,
                max_disp=params.spatial_max_disp,
            ),
            static_argnums=(2, 3),
        )

        def fwd(lr_clip, oh, ow):
            return sp_jitted(eval_params, lr_clip, oh, ow)

    elif getattr(params, "chunk_frames", 0) and getattr(params, "flow_cache", False):
        if getattr(params, "chunk_data_parallel", False):
            raise SystemExit(
                "--flow_cache and --chunk_data_parallel are mutually "
                "exclusive (the pair-flow cache is a per-host stream)"
            )
        import numpy as np

        from mobilesuperresolution_tpu.serve import (
            FlowCachedStreamingVSR,
            make_flow_sr_fns,
        )

        window = params.chunk_frames + 2 * params.chunk_overlap
        fns = {}

        def fwd(lr_clip, oh, ow):
            b, t = lr_clip.shape[:2]
            if t <= window:
                # match chunked_vsr_apply: clips that fit one window run the
                # exact un-windowed forward (parallel/temporal.py)
                return base_fwd(lr_clip, oh, ow)
            if (oh, ow) not in fns:
                try:
                    fns[(oh, ow)] = make_flow_sr_fns(
                        model, {"params": eval_params}, oh, ow
                    )
                except ValueError as e:
                    raise SystemExit(str(e)) from None
            flow_fn, sr_fn = fns[(oh, ow)]
            stream = FlowCachedStreamingVSR(
                flow_fn, sr_fn, oh, ow,
                chunk=params.chunk_frames, overlap=params.chunk_overlap,
                num_streams=b,
            )
            clip = np.asarray(lr_clip)
            out = []
            for i in range(t):
                out.extend(stream.push(clip[:, i]))
            out.extend(stream.flush())
            sr = np.stack(out, axis=0)  # (T, OH, OW, C) or (T, B, OH, OW, C)
            if b == 1:
                return sr[None]
            return np.moveaxis(sr, 0, 1)

    elif getattr(params, "chunk_frames", 0):
        from mobilesuperresolution_tpu.parallel.temporal import chunked_vsr_apply

        chunk_mesh = (
            make_mesh(spatial=1)
            if getattr(params, "chunk_data_parallel", False)
            else None
        )

        def fwd(lr_clip, oh, ow):
            return chunked_vsr_apply(
                base_fwd, lr_clip, oh, ow,
                chunk=params.chunk_frames, overlap=params.chunk_overlap,
                mesh=chunk_mesh,
            )
    else:
        fwd = base_fwd

    for name, mod in eval_mods:
        ds = mod.get_dataset(modes.EVAL, params)
        batches = batch_iterator(ds, 1)
        res = evaluate(
            fwd,
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
    parser = base_parser("VSR training (TPU)")
    parser.set_defaults(dataset="reds", eval_datasets=[])
    add_vsr_args(parser)
    params, dataset_module = parse_with_plugins(parser, argv, with_models=False)
    logging = LoggingTool(params.job_dir)
    logging.info(attr_extractor(params))
    if params.debug:
        # the reference's --debug anomaly detection (search.py:224-228)
        jax.config.update("jax_debug_nans", True)

    if getattr(params, "quantize", "none") != "none":
        raise SystemExit(
            "--quantize is inference-only (use test_vsr / serve); training "
            "runs the exact float path like the reference"
        )
    sp_train = (not params.eval_only) and getattr(params, "spatial_shards", 1) > 1
    if sp_train:
        if params.model_type not in ("basic", "basic_origin"):
            raise SystemExit(
                "--spatial_shards training supports model_type=basic/"
                "basic_origin (the halo-sharded recurrent forward, "
                "parallel/vsr_spatial.py)"
            )
        if getattr(params, "chunk_frames", 0):
            raise SystemExit(
                "--spatial_shards and --chunk_frames are mutually exclusive "
                "(height sharding already bounds per-device memory)"
            )
        import math

        n_dev = len(jax.devices())
        S = params.spatial_shards
        if n_dev % S:
            raise SystemExit(
                f"--spatial_shards {S} does not divide the {n_dev} available "
                "devices"
            )
        # compose with data parallelism: leftover devices form a 'data' axis,
        # but only as many as divide the per-step batch — shard_batch splits
        # the batch over 'data', and a non-dividing axis would crash the
        # device_put (e.g. full-frame --train_batch_size 1 on 8 devices with
        # --spatial_shards 2 must NOT build a data=4 mesh)
        d = math.gcd(n_dev // S, max(params.train_batch_size, 1))
        if d * S < n_dev:
            mesh = make_mesh(data=d, spatial=S, devices=jax.devices()[: d * S])
            logging.info(
                f"spatial training uses {d * S}/{n_dev} devices "
                f"(data={d}, spatial={S}): --train_batch_size "
                f"{params.train_batch_size} limits the data axis"
            )
        else:
            mesh = make_mesh(data=d, spatial=S)
    else:
        mesh = make_mesh(spatial=1)
    dtype = jnp.bfloat16 if params.bf16 else jnp.float32
    model = get_vsr_model(
        params.model_type,
        scale=params.scale,
        block_index_path=params.model_path,
        compute_dtype=dtype,
        flow_downscale=getattr(params, "flow_downscale", 1),
        remat=getattr(params, "remat", False),
        # SpyNet is frozen here unconditionally (spynet_frozen_mask below,
        # the reference's convention), so stopping gradients at the flows is
        # exact for every trainable parameter and skips the SpyNet backward
        # torch never runs (models/basicvsr.py::stop_flow_grad; measured in
        # DESIGN.md "Training attribution")
        stop_flow_grad=(
            not params.eval_only
            and params.model_type in ("basic", "basic_origin", "multi")
        ),
    )

    train_ds = None if params.eval_only else dataset_module.get_dataset(modes.TRAIN, params)
    steps_per_epoch = (
        train_steps_per_epoch(len(train_ds), params.train_batch_size)
        if train_ds
        else 1
    )

    c_in = 5 if params.model_type == "basic_mv" else 3
    t = params.image_batch
    ps = params.lr_patch_size
    out_hw = (ps * params.scale, ps * params.scale)
    sample = jnp.zeros((1, t, ps, ps, c_in))
    init_vars = jax.jit(model.init, static_argnums=(2, 3))(jax.random.key(params.seed), sample, *out_hw)
    mask = spynet_frozen_mask(init_vars["params"])
    # the VSR trainer's OWN Adam/LR conventions: betas (0.9, 0.99) and
    # milestones [E/2, 8E/10] — NOT the pretrain defaults
    # (train_video_superresolution.py:163-168)
    tx = vsr_multistep_adam(
        params.learning_rate, steps_per_epoch, params.epochs, trainable_mask=mask
    )
    # reuse init_vars — the recurrent init costs minutes over a remote-
    # compile tunnel and running it twice doubles startup
    state = create_train_state(
        model, jax.random.key(params.seed), sample, tx, extra_args=out_hw,
        variables=init_vars,
    )
    if params.spynet_weights:
        if "spynet" in state.params:
            key = "spynet"
        elif "flownet" in state.params:
            key = "flownet"
        else:
            raise ValueError(
                f"--spynet_weights given but model_type {params.model_type!r} "
                "has no flow network ('single' is frame-parallel; 'basic_mv' "
                "takes flows from the bitstream)"
            )
        if params.spynet_weights.endswith((".pt", ".pth")):
            # mmedit/reference pretrained SpyNet checkpoint (loaded via the
            # ['params'] key, spynet_arch.py:40)
            from mobilesuperresolution_tpu.train.torch_convert import (
                convert_spynet_state_dict,
                load_torch_checkpoint,
            )

            sd = load_torch_checkpoint(params.spynet_weights)
            if "params" in sd:
                sd = sd["params"]
            prefix = "spynet." if any(k.startswith("spynet.") for k in sd) else ""
            spy = convert_spynet_state_dict(sd, prefix=prefix)
        else:
            spy = load_params_npz(
                params.spynet_weights,
                state.params.get("spynet", state.params.get("flownet")),
            )
        new_params = dict(state.params)
        new_params[key] = spy
        state = state.replace(params=new_params)
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
        run_vsr_evaluation(params, state, model, eval_mods, logging, start_epoch)
        return

    if sp_train:
        from mobilesuperresolution_tpu.parallel.vsr_spatial import (
            make_spatial_vsr_step,
        )

        # full-frame training across chips: the recurrent forward (and its
        # gradients — the halo ppermute is differentiable) shards on frame
        # height; loss/grads match the unsharded step
        # (tests/test_parallel_vsr_train.py::TestSpatialVSRTraining); leftover
        # devices carry a data axis when it divides --train_batch_size
        step = make_spatial_vsr_step(
            state, model, mesh, out_hw, max_disp=params.spatial_max_disp
        )
    else:
        step = make_vsr_step(state, out_hw)
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
                f"epoch {epoch}: charbonnier={meter.avg:.4e} "
                f"({meter.count} steps, {time.time() - t0:.1f}s)"
            )
            if eval_mods and jax.process_index() == 0:
                run_vsr_evaluation(params, state, model, eval_mods, logging, epoch)
            # force: upgrade any mid-epoch preemption save of this same epoch
            ckpt.save(epoch, state, force=True)  # all processes: orbax coordinates
            if jax.process_index() == 0:
                save_params_npz(params.job_dir, state.params)
    finally:
        prof.close()  # flush a still-open trace on any exit path
    logging.info("Finish Training")


if __name__ == "__main__":
    main()
