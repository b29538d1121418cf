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
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from mobilesuperresolution_tpu.ops.layers import WNConv


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


def benchmark_split_block(ch_in, ch_split, kernel, hw=(240, 426), runs=20):
    """Latency (ms) of one split-block at the given config and resolution."""
    fwd, x = _split_block_forward(ch_in, ch_split, kernel, hw, jax.random.key(0))
    return time_fn(fwd, x, runs=runs)


def build_latency_table(
    ch_in_choices=(8, 16, 24, 32, 48, 64),
    kernel_choices=(3, 5, 7),
    hw=(240, 426),
    runs=20,
    out_path=None,
    progress=None,
):
    """Measure the config grid → (N, 4) table [ch_in, ch_split, kernel, ms].

    ch_split sweeps the reference's grid pattern: for each ch_in, splits at
    {1/4, 1/2, 3/4, 1}·ch_in (108-row tables in the reference used a similar
    product grid). A zero-block baseline per resolution is subtracted.
    """
    # zero-block baseline: identity passthrough of the same tensor
    base_ms = {}
    rows = []
    for ch_in in ch_in_choices:
        if ch_in not in base_ms:
            x = jnp.zeros((1, *hw, ch_in), jnp.float32)
            base_ms[ch_in] = time_fn(lambda a: a * 1.0, x, runs=runs)
        for frac in (0.25, 0.5, 0.75, 1.0):
            ch_split = max(int(round(ch_in * frac)), 1)
            for k in kernel_choices:
                ms = benchmark_split_block(ch_in, ch_split, k, hw, runs)
                net = max(ms - base_ms[ch_in], 0.0)
                rows.append((ch_in, ch_split, k, net))
                if progress:
                    progress(rows[-1])
    table = np.asarray(rows, dtype=np.float32)
    if out_path:
        np.save(out_path, table)
    return table
