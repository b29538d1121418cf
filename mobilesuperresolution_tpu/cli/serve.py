"""Streaming VSR serving entry: bounded-latency SR over an ordered frame
stream.

No reference counterpart — the reference stops at file-based clip eval
(test_video_superresolution.py) and mobile export; this is the TPU serving
path built on serve.StreamingVSR: frames are pushed in arrival order, windows
are dispatched ahead of result fetches (device never idles between windows),
and outputs leave with a bounded lookahead of chunk + overlap - 1 frames.

Reads an ordered directory of frames (the NEMO/REDS frame-dir layout), writes
SR PNGs, and prints one JSON line of end-to-end throughput/latency stats —
end-to-end means including host decode, H2D, D2H, and PNG encode.
"""

import json
import os
import time

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
                        help="Directory of ordered frames (sorted by name).")
    parser.add_argument("--output_dir", type=str, default=None,
                        help="Where SR PNGs go (default: job_dir/serve).")
    parser.add_argument("--height", type=int, default=1080)
    parser.add_argument("--width", type=int, default=1920)
    parser.add_argument("--no_save", action="store_true",
                        help="Skip PNG writes (pure throughput measurement).")
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
    )

    names = sorted(
        f for f in os.listdir(params.input_dir)
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp"))
    )
    if not names:
        raise SystemExit(f"no frames in {params.input_dir}")
    first = load_image(os.path.join(params.input_dir, names[0]))
    h, w, c = first.shape

    window = chunk + 2 * params.chunk_overlap
    sample = jnp.zeros((1, window, h, w, c))
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

    apply_fn = jax.jit(
        lambda x, oh, ow: model.apply({"params": state.params}, x, oh, ow),
        static_argnums=(1, 2),
    )
    stream = StreamingVSR(
        apply_fn, params.height, params.width,
        chunk=chunk, overlap=params.chunk_overlap,
    )
    logging.info("compiling window program (%d frames %dx%d)...", window, h, w)
    stream.warmup((h, w, c))

    out_dir = params.output_dir or os.path.join(params.job_dir, "serve")
    os.makedirs(out_dir, exist_ok=True)

    emitted = 0
    push_times = []  # arrival wall-clock per input frame
    emit_lat = []  # arrival->emission seconds per output frame

    def emit(frames):
        nonlocal emitted
        now = time.perf_counter()
        for fr in frames:
            emit_lat.append(now - push_times[emitted])
            if not params.no_save:
                _save_png(os.path.join(out_dir, f"{emitted:08d}.png"), fr)
            emitted += 1

    t0 = time.perf_counter()
    for name in names:
        frame = load_image(os.path.join(params.input_dir, name)).astype(
            np.float32
        ) / 255.0
        push_times.append(time.perf_counter())
        emit(stream.push(frame))
    emit(stream.flush())
    wall = time.perf_counter() - t0
    assert emitted == len(names), (emitted, len(names))

    stats = {
        "frames": emitted,
        "fps_end_to_end": round(emitted / wall, 2),
        "latency_p50_ms": round(1e3 * float(np.percentile(emit_lat, 50)), 1),
        "latency_p95_ms": round(1e3 * float(np.percentile(emit_lat, 95)), 1),
        "lookahead_frames": chunk + params.chunk_overlap - 1,
        "out": None if params.no_save else out_dir,
    }
    logging.info("serve stats: %s", stats)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
