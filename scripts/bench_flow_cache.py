"""Measure flow-reuse streaming throughput vs plain windowed streaming.

Serving shape = the headline NEMO pipeline (BASELINE.md): 426x240 LR →
1920x1080 HR x4, BasicVSR mobile (num_feat=24, num_block=8), bf16 compute,
chunk=4 / overlap=4 windows. Prints one JSON line with both steady-state
fps numbers; results are recorded in DESIGN.md ("Serving").

Run on an idle host — the streaming loop includes host-side window assembly,
so CPU contention shows up in the numbers.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(make_stream, frames, t_warm=16):
    s = make_stream()
    s.warmup(frames[0].shape)
    for f in frames[:t_warm]:
        s.push(f)
    s.flush()

    s = make_stream()
    n = 0
    t0 = time.perf_counter()
    for f in frames:
        n += len(s.push(f))
    n += len(s.flush())
    dt = time.perf_counter() - t0
    assert n == len(frames), (n, len(frames))
    return len(frames) / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=96)
    p.add_argument("--chunk", type=int, default=4)
    p.add_argument("--overlap", type=int, default=4)
    p.add_argument("--streams", type=int, default=1)
    args = p.parse_args()

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    import jax.numpy as jnp

    from mobilesuperresolution_tpu.models import get_vsr_model
    from mobilesuperresolution_tpu.serve import (
        FlowCachedStreamingVSR,
        StreamingVSR,
        make_flow_sr_fns,
    )

    H, W, OH, OW = 240, 426, 1080, 1920
    model = get_vsr_model("basic", scale=4, compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random((1, 3, H, W, 3)), dtype=jnp.float32)
    variables = jax.jit(model.init, static_argnums=(2, 3))(
        jax.random.key(0), x0, OH, OW
    )

    apply_fn = jax.jit(
        lambda x, oh, ow: model.apply(variables, x, oh, ow), static_argnums=(1, 2)
    )
    flow_fn, sr_fn = make_flow_sr_fns(model, variables, OH, OW)

    s = args.streams
    frames = [
        np.asarray(rng.random((s, H, W, 3)), dtype=np.float32)
        for _ in range(args.frames)
    ]
    if s == 1:
        frames = [f[0] for f in frames]

    plain_fps = measure(
        lambda: StreamingVSR(
            apply_fn, OH, OW, chunk=args.chunk, overlap=args.overlap,
            num_streams=s,
        ),
        frames,
    )
    cached_fps = measure(
        lambda: FlowCachedStreamingVSR(
            flow_fn, sr_fn, OH, OW, chunk=args.chunk, overlap=args.overlap,
            num_streams=s,
        ),
        frames,
    )

    print(
        json.dumps(
            {
                "metric": "streaming_1080p_x4_fps",
                "chunk": args.chunk,
                "overlap": args.overlap,
                "streams": s,
                "plain_fps": round(plain_fps * s, 2),
                "flow_cached_fps": round(cached_fps * s, 2),
                "speedup": round(cached_fps / plain_fps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
