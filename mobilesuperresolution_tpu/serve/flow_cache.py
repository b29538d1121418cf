"""Flow-reuse streaming VSR: overlapping windows share SpyNet pair flows.

Windowed VSR serving (serve/streaming.py, parallel/temporal.py) recomputes
optical flow for every frame pair of every window, but consecutive windows
share ``window - stride`` of their frames — and a pair flow depends only on
the two frames of the pair (and the SpyNet weights). With the defaults
(chunk=4, overlap=4 → window=12, stride=4), the plain window forward runs
SpyNet on 11 pairs per 4 emitted frames; the steady state only ever needs
flows for the 4 NEW pairs. SpyNet is ~60% of the exact 1080p x4 pipeline
(DESIGN.md "The warp-gather floor"), so reusing the other 7 pairs removes
~38% of the per-window compute (an upper bound of ~1.6x steady-state
throughput); measure on your chip with scripts/bench_flow_cache.py — the
repo's measured number, when recorded, lives in DESIGN.md "Serving".

TPU shape discipline: pair flows are computed in fixed-size batches of
``chunk`` pairs x 2 directions x S streams (short groups padded by repeating
the last pair), so the flow program — like the window program — compiles
exactly once regardless of stream length. Both dispatches are async; the
flow batch for window k+1 queues behind window k's compute on the same
stream, preserving streaming.py's D2H/compute overlap.

Exactness: a pair's flow is the same VALUES whichever window computes it,
but the plain path batches 2*(window-1) pair samples per SpyNet call while
this path batches 2*chunk — the batch size is part of the compiled program,
so XLA may re-tile reductions, giving float-ulp-level differences (the same
6e-8-measured effect as StreamingVSR's num_streams batching). Output
therefore matches ``chunked_vsr_apply`` to float tolerance, not bit-exactly
(tested: tests/test_serve.py).

This is the TPU-serving counterpart of the reference's whole-clip eval
(test_video_superresolution.py:240-286), which holds every flow in memory at
once; here flow memory is O(window + chunk) pairs, never O(clip).

Applies to the SpyNet-based models (BasicVSR / BasicVSR_origin /
single-image wrappers around them). ``mvvsr`` gets its motion from the
bitstream and ``naive_multi`` has no alignment, so neither has flow cost to
reuse.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from mobilesuperresolution_tpu.models.spynet import (
    SpyNet,
    flow_downscale_hw,
    upsample_flow,
)
from mobilesuperresolution_tpu.ops.resize import resize_bilinear
from mobilesuperresolution_tpu.serve.streaming import StreamingVSR


def make_flow_sr_fns(model, variables, height, width, mesh=None,
                     max_disp=8, axis="spatial"):
    """Split a BasicVSR-family model into (flow_fn, sr_fn) for flow reuse.

    flow_fn(ref, supp): (N, H, W, C) pair frames → (N, H, W, 2) flows at
        input resolution, exactly the values ``compute_flows`` would produce
        for those pair slots (same compute dtype, same downscale/upsample
        staging — models/basicvsr.py:159-182).
    sr_fn(x, ff, fb): (S, T, H, W, C) window + time-major flow stacks
        (T-1, S, H, W, 2) → (S, T, OH, OW, C), the model forward with SpyNet
        skipped (``flows=`` pass-through).

    mesh: optional — compose flow reuse with multi-chip spatial sharding
        (``serve --flow_cache --spatial_shards N``): flow_fn shards the pair
        batch frame-parallel over the mesh — engaging only when the pair
        batch divides the device count (else the ``axis`` shards, else XLA
        placement; ``_fp_put``'s ladder) — and sr_fn runs the height-sharded
        propagation of ``parallel.vsr_spatial.spatial_basicvsr_forward`` with
        the cached flows passed through (its flow-dy clip to ``max_disp``
        still applies).
    """
    params = variables["params"]
    if "spynet" not in params:
        raise ValueError(
            "flow reuse needs a SpyNet-based model (BasicVSR family); "
            f"got params {sorted(params)}"
        )
    spynet = SpyNet(quantized=model.quantized)
    spynet_params = params["spynet"]
    d = model.flow_downscale
    if mesh is not None:
        from mobilesuperresolution_tpu.parallel.vsr_spatial import (
            _fp_put,
            spatial_basicvsr_forward,
        )

    @jax.jit
    def flow_fn(ref, supp):
        n, h, w, c = ref.shape
        ref = ref.astype(model.compute_dtype)
        supp = supp.astype(model.compute_dtype)
        if mesh is not None:
            ref = _fp_put(ref, mesh, axis)
            supp = _fp_put(supp, mesh, axis)
        fh, fw = flow_downscale_hw(h, w, d)
        if (fh, fw) != (h, w):
            ref = resize_bilinear(ref, (fh, fw), align_corners=False)
            supp = resize_bilinear(supp, (fh, fw), align_corners=False)
        flow = spynet.apply({"params": spynet_params}, ref, supp)
        return upsample_flow(flow, h, w)

    @partial(jax.jit, static_argnums=(3, 4))
    def sr_fn(x, ff, fb, out_h, out_w):
        if mesh is not None:
            return spatial_basicvsr_forward(
                model, params, x, out_h, out_w, mesh,
                axis=axis, max_disp=max_disp, flows=(ff, fb),
            )
        return model.apply(variables, x, out_h, out_w, flows=(ff, fb))

    return flow_fn, lambda x, ff, fb: sr_fn(x, ff, fb, height, width)


class FlowCachedStreamingVSR(StreamingVSR):
    """StreamingVSR that computes each pair flow once, not once per window.

    Same push()/flush() contract, ordering, lookahead, and pipelining as
    StreamingVSR; construct the two functions with ``make_flow_sr_fns``.
    The cache holds device-resident flows for every pair whose first frame
    can still appear in a future window (O(window + chunk) pairs), evicted
    in lockstep with the frame buffer.
    """

    def __init__(self, flow_fn, sr_fn, height, width, chunk=4, overlap=4,
                 num_streams=1):
        super().__init__(
            apply_fn=None, height=height, width=width, chunk=chunk,
            overlap=overlap, num_streams=num_streams,
        )
        self._flow = flow_fn
        self._sr = sr_fn
        # (i, j) global frame-index pair (j in {i, i+1}; i == j at clamped
        # clip edges) → (ff, fb) device arrays, each (S, H, W, 2)
        self._pair_flows = {}

    def warmup(self, frame_shape, dtype=np.float32):
        """Compile both programs before the stream starts."""
        s, win = self.num_streams, self.window
        pair = jnp.zeros((2 * self.chunk * s, *frame_shape), dtype)
        np.asarray(self._flow(pair, pair))
        dummy_x = jnp.zeros((s, win, *frame_shape), dtype)
        fshape = (win - 1, s, frame_shape[0], frame_shape[1], 2)
        dummy_f = jnp.zeros(fshape, dtype)
        np.asarray(self._sr(dummy_x, dummy_f, dummy_f))

    def _frame(self, i):
        return self._frames[i - self._base]

    def _ensure_flows(self, pairs):
        missing = []
        for key in pairs:
            if key not in self._pair_flows and key not in missing:
                missing.append(key)
        s, p = self.num_streams, self.chunk
        for g in range(0, len(missing), p):
            group = missing[g : g + p]
            padded = group + [group[-1]] * (p - len(group))
            a = np.concatenate([self._frame(i) for i, _ in padded], axis=0)
            b = np.concatenate([self._frame(j) for _, j in padded], axis=0)
            # mirror compute_flows' [x1|x2] / [x2|x1] layout: first half of
            # the batch yields backward flows (ref = earlier frame), second
            # half forward flows (ref = later frame)
            out = self._flow(
                jnp.asarray(np.concatenate([a, b], axis=0)),
                jnp.asarray(np.concatenate([b, a], axis=0)),
            )
            half = p * s
            for k, key in enumerate(group):
                fb = out[k * s : (k + 1) * s]
                ff = out[half + k * s : half + (k + 1) * s]
                self._pair_flows[key] = (ff, fb)

    def _dispatch(self, s, last_idx):
        idx = self._window_indices(s, last_idx)
        pairs = [(int(idx[j]), int(idx[j + 1])) for j in range(len(idx) - 1)]
        self._ensure_flows(pairs)
        ff = jnp.stack([self._pair_flows[k][0] for k in pairs], axis=0)
        fb = jnp.stack([self._pair_flows[k][1] for k in pairs], axis=0)
        window = np.stack([self._frame(i) for i in idx], axis=1)
        out = self._sr(jnp.asarray(window), ff, fb)  # async dispatch
        n_keep = min(self.chunk, self._seen - s)
        return out, n_keep

    def _drop_consumed(self):
        super()._drop_consumed()
        keep_from = self._next_start - self.overlap
        for key in [k for k in self._pair_flows if k[0] < keep_from]:
            del self._pair_flows[key]

    def flush(self):
        out = super().flush()
        self._pair_flows.clear()
        return out
