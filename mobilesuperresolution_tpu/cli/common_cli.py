"""Shared CLI plumbing."""

import argparse
import os

import mobilesuperresolution_tpu.data as data_pkg
import mobilesuperresolution_tpu.models as models_pkg


def train_steps_per_epoch(n_items, batch_size):
    """Optimizer steps each process runs per epoch.

    Per-host sharding hands every process ceil(n/P) items (wrap-padded like
    DistributedSampler — data/isr.py::_batches), batched with drop_last by
    the PER-HOST batch size. The LR schedule milestones are denominated in
    steps, so computing this from the global count would fire them
    process_count times too late on a multi-host job."""
    import jax

    per_host = -(-n_items // jax.process_count())
    return max(per_host // batch_size, 1)


def base_parser(description):
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument("--job_dir", type=str, required=True)
    parser.add_argument("--dataset", type=str, default="div2k")
    parser.add_argument("--eval_datasets", type=str, nargs="*", default=["set5"])
    parser.add_argument("--epochs", type=int, default=30)
    parser.add_argument("--learning_rate", type=float, default=1e-3)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--resume", action="store_true",
                        help="Resume from the latest checkpoint in job_dir "
                        "(actually implemented, unlike the reference — "
                        "SURVEY §5.3).")
    parser.add_argument("--eval_model", type=str, default=None,
                        help="Path to a params .npz to evaluate/initialize from.")
    parser.add_argument("--eval_only", action="store_true")
    parser.add_argument("--debug", action="store_true",
                        help="Clamp epochs to 1 and enable jax debug_nans.")
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 compute (MXU-native).")
    parser.add_argument("--save_eval_images", action="store_true")
    parser.add_argument("--eval_tile", type=int, default=0,
                        help="Evaluate through fixed-shape overlap tiles of "
                        "this size (exact: overlap >= receptive radius) so a "
                        "mixed-shape eval set (e.g. Urban100, ~100 distinct "
                        "shapes) compiles O(1) programs instead of one per "
                        "shape. 0 = per-shape jit. Images smaller than the "
                        "tile run at native shape.")
    parser.add_argument("--max_steps_per_run", type=int, default=0,
                        help="Stop after N optimizer steps this process "
                        "lifetime: write a mid-epoch checkpoint and exit 0 "
                        "(planned preemption for time-sliced clusters). "
                        "SIGTERM triggers the same path at the next step "
                        "boundary. Resuming with --resume replays the "
                        "remaining batches of the interrupted epoch exactly "
                        "(train/preemption.py). 0 = unlimited.")
    parser.add_argument("--checkpoint_every_steps", type=int, default=0,
                        help="Also checkpoint every N optimizer steps WITHIN "
                        "an epoch (full state + batch position), so a hard "
                        "crash — not just a SIGTERM — loses at most N steps: "
                        "--resume replays the rest of the epoch exactly from "
                        "the last complete save (train/preemption.py). "
                        "0 = end-of-epoch saves only. Useful when epochs are "
                        "long (REDS: ~24k clips/epoch).")
    parser.add_argument("--xla_profile_steps", type=int, default=0,
                        help="Capture an XLA trace of the first N optimizer "
                        "steps to <job_dir>/profile (TensorBoard-viewable; "
                        "includes the first-step compile, so N >= 2 also "
                        "shows a steady-state step). 0 = off. SURVEY §5.1 — "
                        "the reference has only ad-hoc time.time() prints.")
    parser.add_argument("--compile_cache", type=str, default=None,
                        help="Persistent XLA compilation cache directory: "
                        "re-runs, --resume restarts, and preemption rerun "
                        "loops (launchers/with_retries.sh) skip recompiling "
                        "unchanged programs — on TPU backends a model-sized "
                        "compile is tens of seconds. Content-addressed, safe "
                        "to share between jobs. Default: "
                        "~/.cache/mobilesuperresolution_tpu/xla on "
                        "accelerator backends, OFF on CPU (CPU cache entries "
                        "are machine-code AOT blobs — stale or "
                        "foreign-machine entries reload with mismatched CPU "
                        "features, risking SIGILL; an explicit path opts in "
                        "anyway). '' disables.")
    # multi-host runtime (the reference's --distributed + NCCL env:// init,
    # pretrain.py:153-159; here jax.distributed over ICI/DCN)
    parser.add_argument("--distributed", action="store_true",
                        help="Join a multi-host job with auto-detected "
                        "topology (TPU pod slices; jax.distributed.initialize"
                        " with no args).")
    parser.add_argument("--coordinator_address", type=str, default=None,
                        help="host:port of process 0 for explicit rendezvous "
                        "(with --num_processes/--process_id).")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    return parser


def parse_with_plugins(parser, argv=None, with_models=True):
    """Reference idiom: parse known args, let dataset + model modules inject
    flags, then re-parse (pretrain.py:329-337)."""
    known, _ = parser.parse_known_args(argv)
    dataset_module = data_pkg.get_dataset_module(known.dataset)
    dataset_module.update_argparser(parser)
    if with_models:
        models_pkg.update_argparser(parser)
    params = parser.parse_args(argv)
    if params.debug:
        params.epochs = 1
    # Join the multi-host job BEFORE any backend touch (mesh creation, data
    # sharding) so jax.devices() is already the global list everywhere.
    from mobilesuperresolution_tpu.parallel.distributed import (
        initialize_from_params,
    )

    initialize_from_params(params)
    _setup_compile_cache(params)
    os.makedirs(params.job_dir, exist_ok=True)
    return params, dataset_module


def _setup_compile_cache(params):
    """Wire the persistent XLA compilation cache (--compile_cache).

    None (the default) resolves to the shared home cache dir on accelerator
    backends and to OFF on CPU: CPU cache entries are AOT machine code, and
    loading an entry compiled with different CPU features (another machine,
    or a remote compile service) degrades to per-load multi-KB
    feature-mismatch warnings at best and SIGILL at worst — while a CPU
    recompile costs little. An explicit path enables caching on any backend.
    """
    cache = getattr(params, "compile_cache", None)
    if cache == "":
        return
    if cache is None:
        import jax

        if jax.default_backend() == "cpu":
            return
        cache = os.path.join(os.path.expanduser("~"), ".cache",
                             "mobilesuperresolution_tpu", "xla")
    import jax

    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    # cache every program regardless of size/compile time — this
    # framework's programs are few and reused across restarts
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def eval_modules(params):
    out = []
    for name in params.eval_datasets:
        out.append((name, data_pkg.get_dataset_module(name)))
    return out


def load_vsr_eval_params(path, model_type, model, template_params):
    """Load evaluation weights for a VSR model: a params .npz, or a
    reference/mmedit torch checkpoint (loaded via the ['params'] key like
    test_video_superresolution.py:249) converted per model family
    (train/torch_convert). Returns the params tree."""
    if not path.endswith((".pt", ".pth")):
        from mobilesuperresolution_tpu.train.checkpoint import load_params_npz

        return load_params_npz(path, template_params)

    from mobilesuperresolution_tpu.train import torch_convert as tc

    sd = tc.load_torch_checkpoint(path)
    if "params" in sd and not any(k.startswith("spynet") for k in sd):
        sd = sd["params"]
    if model_type == "basic_origin":
        converted, ckpt_blocks = tc.convert_basicvsr_origin_state_dict(sd)
        if ckpt_blocks != model.num_block:
            raise ValueError(
                f"checkpoint has {ckpt_blocks} trunk blocks but "
                f"basic_origin expects {model.num_block}"
            )
    elif model_type == "single":
        converted, ckpt_blocks, ckpt_ch = tc.convert_single_image_state_dict(sd)
        if (ckpt_blocks, ckpt_ch) != (model.blocks, model.channel):
            raise ValueError(
                f"checkpoint is a {ckpt_blocks}-block/{ckpt_ch}-ch "
                f"'single' model; got --num_blocks {model.blocks} "
                f"channel {model.channel}"
            )
    elif model_type == "multi":
        converted, ckpt_blocks = tc.convert_naive_multi_state_dict(sd)
        if ckpt_blocks != len(model.idx):
            raise ValueError(
                f"checkpoint has {ckpt_blocks} body blocks but the "
                f"block_index artifact (--model_path) describes "
                f"{len(model.idx)} — they come from different searches"
            )
    elif model_type == "basic_mv":
        converted, ckpt_blocks = tc.convert_mvvsr_state_dict(sd)
        if ckpt_blocks != model.num_block:
            raise ValueError(
                f"checkpoint has {ckpt_blocks} trunk blocks but "
                f"basic_mv expects {model.num_block}"
            )
    else:
        raise ValueError(
            f"torch checkpoint conversion is not available for "
            f"{model_type!r} (the reference's mobile 'basic' "
            "variant cannot run in the reference itself — its "
            "conv_last shape is broadcast-impossible, see "
            "models/basicvsr.py:19-23); export npz weights instead"
        )
    return converted
