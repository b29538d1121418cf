"""Measured fps of a searched discrete net vs its full-depth supernet baseline.

Supports VERDICT r4 item 2 ("the retrained survivor's ... measured fps vs the
full-depth baseline"): rebuilds the discrete ``ResultNet`` from a search
artifact's ``block_index.txt`` and times it against the full-depth baseline —
the supernet's all-blocks/full-width/k=7 discrete configuration (the config
``get_ori_speed`` scores, speed_models/helpers.py:5-15) — on the real chip at
the NEMO protocol LR shape (426x240, the same resolution the latency tables
are measured at, kernels/timing.py).

Prints one JSON dict {searched_ms, searched_fps, baseline_ms, baseline_fps,
speedup, searched_idx, baseline_blocks}.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_model_ms(model, x, iters=20, reps=3):
    """Median per-forward ms: K forwards chained in ONE dispatched program
    (scalar carry + 1e-12 perturbation against hoisting, strided-mean
    reduction over the whole output against DCE — bench.py's recipe)."""
    import jax
    import jax.numpy as jnp

    variables = jax.jit(model.init)(jax.random.key(0), x)

    @jax.jit
    def timed_loop(variables, x):
        def body(_, acc):
            out = model.apply(variables, x + (acc * 1e-12).astype(x.dtype))
            return jnp.mean(out[:, ::16, ::16, 0]).astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    float(timed_loop(variables, x))  # compile + warmup
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(timed_loop(variables, x))
        times.append(time.perf_counter() - t0)
    return 1e3 * min(times) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--block_index", required=True,
                    help="block_index.txt (or its job dir) of the search run")
    ap.add_argument("--scale", type=int, default=2)
    ap.add_argument("--num_blocks", type=int, default=16,
                    help="Full-depth baseline block count (the supernet's)")
    ap.add_argument("--num_residual_units", type=int, default=32)
    ap.add_argument("--hw", type=str, default="240x426",
                    help="LR input HxW (default: the NEMO/speed-table shape)")
    args = ap.parse_args()

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    import jax.numpy as jnp

    from mobilesuperresolution_tpu.models.result_net import ResultNet

    h, w = (int(v) for v in args.hw.split("x"))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, h, w, 3)), jnp.bfloat16)

    searched = ResultNet.from_artifact(
        args.block_index, scale=args.scale, compute_dtype=jnp.bfloat16
    )
    u = args.num_residual_units
    baseline = ResultNet(
        scale=args.scale,
        idx=tuple((u, u, 7) for _ in range(args.num_blocks)),
        compute_dtype=jnp.bfloat16,
    )

    searched_ms = time_model_ms(searched, x)
    baseline_ms = time_model_ms(baseline, x)
    print(json.dumps({
        "device": str(jax.devices()[0]),
        "hw": f"{h}x{w}",
        "scale": args.scale,
        "searched_idx": [list(b) for b in searched.idx],
        "searched_blocks": len(searched.idx),
        "baseline_blocks": args.num_blocks,
        "searched_ms": round(searched_ms, 3),
        "searched_fps": round(1e3 / searched_ms, 1),
        "baseline_ms": round(baseline_ms, 3),
        "baseline_fps": round(1e3 / baseline_ms, 1),
        "speedup": round(baseline_ms / searched_ms, 2),
    }))


if __name__ == "__main__":
    main()
