"""On-TPU kernel timing harness — the replacement for the reference's mobile
benchmark pipeline.

Reference loop: TFLite model → on-device benchmark log ``myFile_test.txt`` →
``data_generate_from_txt.py`` (subtract zero-block baseline, ÷runs, ns→ms) →
per-processor npy tables → MLP trainer (SURVEY §2.2 #23-24). Here the same
(ch_in, ch_split, kernel, ms) tables are produced by timing the *actual
compiled block* on the TPU:

- each config is jitted once and run ``runs`` times after warmup,
- the zero-block baseline (head+tail only, no block) is measured and
  subtracted, mirroring ``(t − t_zero)/runs`` (data_generate_from_txt.py:33-36),
- results are written as the same .npy schema the search consumes.

Two timers: ``time_fn`` (per-dispatch wall clock — fine on a local backend)
and ``time_fn_loop`` (the body iterated inside ONE compiled ``fori_loop`` —
the dispatch round-trip is paid once per *measurement*, not per iteration,
which is required on remote/tunneled backends where per-dispatch RTT of tens
of ms would otherwise swamp sub-ms block latencies). The loop body's operand
is made loop-dependent so XLA cannot hoist it out as loop-invariant.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from mobilesuperresolution_tpu.ops.layers import WNConv


def _sync(out):
    """Force a real device sync (block_until_ready can return early on the
    tunneled dev backend; a scalar device_get cannot)."""
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf)).ravel()[:1]


def time_fn(fn, *args, runs=20, warmup=3):
    """Median wall-clock milliseconds of ``fn(*args)`` (jitted, synced)."""
    fn = jax.jit(fn)
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(times))


def time_fn_loop(fn, x, iters=50, reps=5, warmup=1):
    """Median per-iteration milliseconds of ``fn`` chained ``iters`` times
    inside one compiled program. ``fn`` must map an array to one of the same
    shape/dtype (the loop carry). The tiny ``+ k·1e-12`` perturbation makes
    the body loop-dependent — without it XLA hoists the whole body."""

    def body(k, c):
        return fn(c + jnp.asarray(k, c.dtype) * jnp.asarray(1e-12, c.dtype))

    # The loop returns a SCALAR (data-dependent on the final carry): syncing
    # on it forces completion while transferring 4 bytes — device_get of the
    # full activation would push MBs through a remote tunnel inside the timed
    # region and swamp sub-ms signals.
    loop = jax.jit(
        lambda a: jnp.sum(jax.lax.fori_loop(0, iters, body, a), dtype=jnp.float32)
    )
    _sync(loop(x))
    for _ in range(warmup):
        _sync(loop(x))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(loop(x))
        times.append((time.perf_counter() - t0) * 1e3 / iters)
    return float(np.median(times))


def _split_block_forward(ch_in, ch_split, kernel, hw, key):
    """Build a standalone searched split-block forward (the discrete form the
    search's latency model scores: passthrough ch_in−ch_split channels, conv
    the active ch_split through a separable k-branch)."""
    import flax.linen as nn

    class Block(nn.Module):
        @nn.compact
        def __call__(self, x):
            xs = x[..., : ch_in - ch_split], x[..., ch_in - ch_split :]
            y = WNConv(
                ch_split, kernel, g_init=None, feature_group_count=ch_split
            )(xs[1])
            y = nn.relu(y)
            y = WNConv(ch_split, 1, g_init=None)(y)
            y = y + xs[1]
            if ch_in - ch_split > 0:
                y = jnp.concatenate([xs[0], y], axis=-1)
            return y

    model = Block()
    x = jnp.zeros((1, *hw, ch_in), jnp.float32)
    params = model.init(key, x)
    return lambda inp: model.apply(params, inp), x


def benchmark_split_block(
    ch_in, ch_split, kernel, hw=(240, 426), runs=20, method="dispatch", iters=50
):
    """Latency (ms) of one split-block at the given config and resolution."""
    fwd, x = _split_block_forward(ch_in, ch_split, kernel, hw, jax.random.key(0))
    if method == "loop":
        return time_fn_loop(fwd, x, iters=iters, reps=max(runs // 4, 3))
    return time_fn(fwd, x, runs=runs)


def build_latency_table(
    ch_in_choices=(8, 16, 24, 32, 48, 64),
    kernel_choices=(3, 5, 7),
    hw=(240, 426),
    runs=20,
    out_path=None,
    progress=None,
    method="dispatch",
    iters=50,
):
    """Measure the config grid → (N, 4) table [ch_in, ch_split, kernel, ms].

    ch_split sweeps the reference's grid pattern: for each ch_in, splits at
    {1/4, 1/2, 3/4, 1}·ch_in (108-row tables in the reference used a similar
    product grid). A zero-block baseline per resolution is subtracted.

    method="loop" times each config inside one compiled fori_loop
    (time_fn_loop) — use on remote/tunneled backends where per-dispatch RTT
    dominates; "dispatch" is the plain per-call timer.
    """

    def _measure(fn, x):
        if method == "loop":
            return time_fn_loop(fn, x, iters=iters, reps=max(runs // 4, 3))
        return time_fn(fn, x, runs=runs)

    # zero-block baseline: identity passthrough of the same tensor
    base_ms = {}
    rows = []
    for ch_in in ch_in_choices:
        if ch_in not in base_ms:
            x = jnp.zeros((1, *hw, ch_in), jnp.float32)
            base_ms[ch_in] = _measure(lambda a: a * 1.0, x)
        for frac in (0.25, 0.5, 0.75, 1.0):
            ch_split = max(int(round(ch_in * frac)), 1)
            for k in kernel_choices:
                ms = benchmark_split_block(ch_in, ch_split, k, hw, runs, method, iters)
                net = max(ms - base_ms[ch_in], 0.0)
                rows.append((ch_in, ch_split, k, net))
                if progress:
                    progress(rows[-1])
    table = np.asarray(rows, dtype=np.float32)
    if out_path:
        np.save(out_path, table)
    return table
