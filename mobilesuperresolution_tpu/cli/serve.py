"""Streaming VSR serving entry: bounded-latency SR over an ordered frame
stream.

No reference counterpart — the reference stops at file-based clip eval
(test_video_superresolution.py) and mobile export; this is the TPU serving
path built on serve.StreamingVSR: frames are pushed in arrival order, windows
are dispatched ahead of result fetches (device never idles between windows),
and outputs leave with a bounded lookahead of chunk + overlap - 1 frames.

Reads an ordered directory of frames (the NEMO/REDS frame-dir layout), writes
SR PNGs, and prints one JSON line of end-to-end throughput/latency stats —
end-to-end means including host decode, H2D, D2H, and PNG encode. Several
comma-separated input directories serve as lockstep streams batched into one
window program (outputs per stream match solo serving to float ulp level).
"""

import json
import os
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

import jax
import jax.numpy as jnp

from mobilesuperresolution_tpu.cli.common_cli import (
    base_parser,
    load_vsr_eval_params,
    parse_with_plugins,
)
from mobilesuperresolution_tpu.cli.train_vsr import add_vsr_args
from mobilesuperresolution_tpu.core import LoggingTool
from mobilesuperresolution_tpu.core.utils import attr_extractor
from mobilesuperresolution_tpu.data.io_cache import load_image
from mobilesuperresolution_tpu.models import get_vsr_model
from mobilesuperresolution_tpu.serve import StreamingVSR
from mobilesuperresolution_tpu.train.evaluate import _save_png
from mobilesuperresolution_tpu.train.state import create_train_state, multistep_adam


def main(argv=None):
    parser = base_parser("Streaming VSR serving (TPU)")
    parser.set_defaults(dataset="reds", eval_only=True)
    add_vsr_args(parser)
    parser.add_argument("--input_dir", type=str, required=True,
                        help="Directory of ordered frames (sorted by name). "
                        "Comma-separate multiple directories to serve that "
                        "many lockstep streams batched into one program "
                        "(outputs land in stream<i>/ subdirectories).")
    parser.add_argument("--output_dir", type=str, default=None,
                        help="Where SR PNGs go (default: job_dir/serve).")
    parser.add_argument("--height", type=int, default=None,
                        help="Output frame height (default: input height x "
                        "scale — an explicit value adds a bilinear resample "
                        "on top of the model's native x<scale> output).")
    parser.add_argument("--width", type=int, default=None,
                        help="Output frame width (default: input width x "
                        "scale).")
    parser.add_argument("--no_save", action="store_true",
                        help="Skip PNG writes (pure throughput measurement).")
    parser.add_argument("--arrival_fps", type=float, default=0,
                        help="Pace input frames at this rate (simulates a "
                        "live stream; 0 = push as fast as frames decode). "
                        "With pacing, latency_p50/p95 measure the real "
                        "arrival→emission latency of live serving instead "
                        "of batch-drain behavior.")
    # --flow_cache comes from add_vsr_args (shared with chunked eval); for
    # serving it means: compute each SpyNet pair flow once and reuse it
    # across overlapping windows (serve/flow_cache.py).
    params, _ = parse_with_plugins(parser, argv, with_models=False)
    logging = LoggingTool(params.job_dir)
    logging.info(attr_extractor(params))

    chunk = params.chunk_frames or 4
    dtype = jnp.bfloat16 if params.bf16 else jnp.float32
    model = get_vsr_model(
        params.model_type,
        scale=params.scale,
        block_index_path=params.model_path,
        compute_dtype=dtype,
        flow_downscale=getattr(params, "flow_downscale", 1),
        quantized=getattr(params, "quantize", "none") == "int8",
    )

    in_dirs = [d for d in params.input_dir.split(",") if d]
    per_stream_names = []
    for d in in_dirs:
        names = sorted(
            f for f in os.listdir(d)
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp"))
        )
        if not names:
            raise SystemExit(f"no frames in {d}")
        per_stream_names.append(names)
    n_frames = min(len(n) for n in per_stream_names)
    if len({len(n) for n in per_stream_names}) > 1:
        logging.warning(
            "streams have unequal frame counts; serving the common "
            "prefix of %d frames", n_frames,
        )
    n_streams = len(in_dirs)
    first = load_image(os.path.join(in_dirs[0], per_stream_names[0][0]))
    h, w, c = first.shape
    # derive the output size from the ACTUAL frames unless overridden — a
    # fixed default would silently bilinear-resample the model's native
    # x<scale> output to an unrelated resolution
    if params.height is None:
        params.height = h * params.scale
    if params.width is None:
        params.width = w * params.scale

    window = chunk + 2 * params.chunk_overlap
    sample = jnp.zeros((n_streams, window, h, w, c))
    tx = multistep_adam(1e-4, 1, 1)
    state = create_train_state(
        model,
        jax.random.key(params.seed),
        sample,
        tx,
        extra_args=(params.height, params.width),
    )
    if params.eval_model:
        state = state.replace(
            params=load_vsr_eval_params(
                params.eval_model, params.model_type, model, state.params
            )
        )

    def _spatial_mesh():
        from mobilesuperresolution_tpu.parallel import make_mesh

        n_dev = len(jax.devices())
        if n_dev % params.spatial_shards:
            raise SystemExit(
                f"--spatial_shards {params.spatial_shards} does not divide "
                f"the {n_dev} available devices"
            )
        return make_mesh(
            data=n_dev // params.spatial_shards, spatial=params.spatial_shards
        )

    if params.flow_cache:
        from mobilesuperresolution_tpu.serve import (
            FlowCachedStreamingVSR,
            make_flow_sr_fns,
        )

        # --spatial_shards composes: cached pair flows feed the
        # height-sharded window program (make_flow_sr_fns' mesh path)
        sp = getattr(params, "spatial_shards", 1)
        flow_fn, sr_fn = make_flow_sr_fns(
            model, {"params": state.params}, params.height, params.width,
            mesh=_spatial_mesh() if sp > 1 else None,
            max_disp=params.spatial_max_disp,
        )
        stream = FlowCachedStreamingVSR(
            flow_fn, sr_fn, params.height, params.width,
            chunk=chunk, overlap=params.chunk_overlap, num_streams=n_streams,
        )
    elif getattr(params, "spatial_shards", 1) > 1:
        # multi-chip serving: each window program's recurrent propagation
        # shards on frame HEIGHT over the mesh's 'spatial' axis (per-step
        # halo exchange over ICI, parallel/vsr_spatial.py) — the route past
        # the single-chip exact ceiling for ONE stream's latency. Output
        # matches single-device streaming to float tolerance
        # (tests/test_serve.py::test_streaming_spatial_shards_matches_plain).
        from mobilesuperresolution_tpu.parallel.vsr_spatial import (
            spatial_basicvsr_forward,
        )

        sp_mesh = _spatial_mesh()
        apply_fn = jax.jit(
            lambda x, oh, ow: spatial_basicvsr_forward(
                model, state.params, x, oh, ow, sp_mesh,
                max_disp=params.spatial_max_disp,
            ),
            static_argnums=(1, 2),
        )
        stream = StreamingVSR(
            apply_fn, params.height, params.width,
            chunk=chunk, overlap=params.chunk_overlap, num_streams=n_streams,
        )
    else:
        apply_fn = jax.jit(
            lambda x, oh, ow: model.apply({"params": state.params}, x, oh, ow),
            static_argnums=(1, 2),
        )
        stream = StreamingVSR(
            apply_fn, params.height, params.width,
            chunk=chunk, overlap=params.chunk_overlap, num_streams=n_streams,
        )
    logging.info(
        "compiling window program (%d streams x %d frames %dx%d)...",
        n_streams, window, h, w,
    )
    stream.warmup((h, w, c))

    out_dir = params.output_dir or os.path.join(params.job_dir, "serve")
    stream_dirs = (
        [out_dir]
        if n_streams == 1
        else [os.path.join(out_dir, f"stream{i}") for i in range(n_streams)]
    )
    if not params.no_save:
        for d in stream_dirs:
            os.makedirs(d, exist_ok=True)

    emitted = 0  # emitted time steps (each carries n_streams frames)
    push_times = []  # arrival wall-clock per input time step
    emit_lat = []  # arrival->emission seconds per output time step

    # Host IO off the critical path (the device pipelines windows via async
    # dispatch; the host must not serialize PNG work against it):
    # - PNG ENCODE goes to a writer pool — at x4 output the encode of one
    #   frame can cost more than its share of device compute, and zlib/PIL
    #   release the GIL, so writers overlap device waits even on one CPU.
    #   A frame is "emitted" when its pixels are ready (latency measured
    #   there); wall-clock/fps still include the writers' drain (join below),
    #   so fps_end_to_end never counts unfinished work.
    # - DECODE of frame i+1 is prefetched on one worker while frame i is
    #   pushed (bounded: one step in flight, memory O(1)).
    writers = ThreadPoolExecutor(max_workers=2)
    pending_writes = []

    def emit(steps):
        nonlocal emitted
        now = time.perf_counter()
        for fr in steps:
            emit_lat.append(now - push_times[emitted])
            if not params.no_save:
                per_stream = fr[None] if fr.ndim == 3 else fr
                for d, sfr in zip(stream_dirs, per_stream):
                    pending_writes.append(writers.submit(
                        _save_png,
                        os.path.join(d, f"{emitted:08d}.png"), sfr,
                    ))
            emitted += 1

    def decode(i):
        return np.stack(
            [
                load_image(os.path.join(d, names[i])).astype(np.float32)
                / 255.0
                for d, names in zip(in_dirs, per_stream_names)
            ]
        )

    decoder = ThreadPoolExecutor(max_workers=1)
    t0 = time.perf_counter()
    next_frame = decoder.submit(decode, 0)
    for i in range(n_frames):
        frame = next_frame.result()
        if i + 1 < n_frames:
            next_frame = decoder.submit(decode, i + 1)
        if params.arrival_fps > 0:
            # live-stream pacing: frame i "arrives" at t0 + i/fps
            due = t0 + i / params.arrival_fps
            delay = due - time.perf_counter()
            if delay > 0:
                time.sleep(delay)
        push_times.append(time.perf_counter())
        emit(stream.push(frame if n_streams > 1 else frame[0]))
    emit(stream.flush())
    for f in pending_writes:
        f.result()  # surface write errors; include write drain in wall
    writers.shutdown()
    decoder.shutdown()
    wall = time.perf_counter() - t0
    assert emitted == n_frames, (emitted, n_frames)

    stats = {
        "streams": n_streams,
        "frames": emitted * n_streams,
        "arrival_fps": params.arrival_fps or None,
        "fps_end_to_end": round(emitted * n_streams / wall, 2),
        "latency_p50_ms": round(1e3 * float(np.percentile(emit_lat, 50)), 1),
        "latency_p95_ms": round(1e3 * float(np.percentile(emit_lat, 95)), 1),
        "lookahead_frames": chunk + params.chunk_overlap - 1,
        "out": None if params.no_save else out_dir,
    }
    logging.info("serve stats: %s", stats)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
