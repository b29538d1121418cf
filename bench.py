"""Headline benchmark: 1080p x4 video super-resolution throughput on one chip.

Measures BasicVSR (mobile config: num_feat=24, num_block=8 —
train_video_superresolution.py:250) on the NEMO pipeline shape 426x240 LR →
1920x1080 HR (datasets/_vsr.py:470,485), bfloat16 compute, steady-state
frames/sec. North star (BASELINE.md): > 30 fps on one v5e chip, so
vs_baseline = fps / 30.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import os

    import jax

    # Persistent compilation cache: the 240p recurrent program is expensive to
    # compile through the remote-compile tunnel (~10+ min cold); cached runs
    # start in seconds. The cache directory lives in-repo so driver runs hit
    # the warm cache.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    import jax.numpy as jnp

    from mobilesuperresolution_tpu.models import get_vsr_model

    T = 10
    H, W = 240, 426
    OH, OW = 1080, 1920

    model = get_vsr_model("basic", scale=4, compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, T, H, W, 3)), dtype=jnp.float32)
    # jit the init: eager init dispatches every op individually through the
    # remote-compile tunnel (~40 min); one jitted program takes seconds.
    variables = jax.jit(model.init, static_argnums=(2, 3))(jax.random.key(0), x, OH, OW)

    # shape check WITHOUT compiling a second full 1080p program (a cold
    # compile through the tunnel costs ~10 min; eval_shape is milliseconds)
    out_shape = jax.eval_shape(
        lambda v, xx: model.apply(v, xx, OH, OW), variables, x
    ).shape
    assert out_shape == (1, T, OH, OW, 3), out_shape

    # The tunneled backend has ~30 ms per-dispatch RTT, so K forwards run
    # inside ONE dispatched program (chained through a scalar so XLA cannot
    # hoist the loop-invariant body), and the RTT amortizes away.
    K = 8

    @jax.jit
    def timed_loop(variables, x):
        def body(_, acc):
            out = model.apply(variables, x + (acc * 1e-12).astype(x.dtype), OH, OW)
            # reduce over ALL frames so the reconstruction of no frame is
            # dead code the simplifier could slice away (measured: the
            # last-frame-only form was within 0.7% — no DCE occurred — but
            # the all-frames form removes the loophole by construction)
            return jnp.mean(out[:, :, ::64, ::64, 0]).astype(jnp.float32)

        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    float(timed_loop(variables, x))  # compile + warmup
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(timed_loop(variables, x))
        times.append(time.perf_counter() - t0)
    dt = min(times) / K
    fps = T / dt

    print(
        json.dumps(
            {
                "metric": "basicvsr_1080p_x4_fps",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 30.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
