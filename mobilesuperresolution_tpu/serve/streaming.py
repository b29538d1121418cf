"""Streaming VSR serving: bounded-latency inference over a live frame stream.

The reference's deployment story ends at an exported mobile model
(export_onnx.py, onnx_tflite.py); its eval drivers require the whole clip in
memory (test_video_superresolution.py:240-286). Production serving on TPU
wants the complement: frames ARRIVE over time, outputs must leave with
bounded latency and bounded memory, and host<->device transfers must overlap
device compute.

This module streams the exact window scheme of
``parallel.temporal.chunked_vsr_apply`` (chunk + 2*overlap frames per window,
central ``chunk`` outputs kept, clip edges replicated): every window has ONE
shape so the forward compiles once, and the bidirectional models' need for
future context becomes an explicit, bounded lookahead of
``chunk + overlap - 1`` frames.

Pipelining falls out of JAX's async dispatch: each window is dispatched
before the previous window's outputs are fetched, so the previous D2H copy
and the next compute run concurrently; the input H2D for window k+1 is
enqueued behind window k's compute on the same stream. No threads needed.

Latency contract (stream position units): output frame ``s + j`` (j in
[0, chunk)) is emitted after input frame ``s + chunk + overlap - 1`` arrives
— worst-case lookahead ``chunk + overlap - 1`` frames plus one window of
compute. Memory is O(window), never O(clip).
"""

from collections import deque

import numpy as np

import jax.numpy as jnp


class StreamingVSR:
    """Push frames in, get super-resolved frames out, in order.

    apply_fn: ``(lr_window, out_h, out_w) -> sr_window`` over
        (S, window, H, W, C) — e.g. a jitted ``model.apply`` closure. Called
        with a fixed window length, so it compiles exactly once.
    height, width: output frame size.
    chunk: output frames emitted per window.
    overlap: context frames on each side of the kept span (same
        speed/quality trade as ``chunked_vsr_apply``; the quantified ladder
        in parallel/temporal.py applies verbatim).
    num_streams: S lockstep input streams batched into ONE window program.
        Every op in the VSR models is batch-independent, so each stream's
        output matches serving it alone to float ulp level (the batch size
        is part of the compiled program, so XLA may re-tile reductions;
        measured max 6e-8 abs delta — tested) — while the chip amortizes
        its fixed per-dispatch/per-op costs over S streams (the production
        serving shape: many cameras/videos per chip).

    Equivalence: for a clip longer than one window, pushing its frames
    through ``StreamingVSR`` yields bit-identical output to
    ``chunked_vsr_apply`` on the whole clip (tests/test_serve.py). Shorter
    clips still stream (edge replication) but ``chunked_vsr_apply`` evaluates
    them in one un-windowed forward, which for recurrent models is not
    bit-equal — batch serving of short clips should use that path.
    """

    def __init__(self, apply_fn, height, width, chunk=4, overlap=4,
                 num_streams=1):
        if chunk <= 0:
            raise ValueError("chunk must be positive")
        if overlap < 0:
            raise ValueError("overlap must be >= 0")
        if num_streams <= 0:
            raise ValueError("num_streams must be positive")
        self._apply = apply_fn
        self._hw = (height, width)
        self.chunk = chunk
        self.overlap = overlap
        self.num_streams = num_streams
        self.window = chunk + 2 * overlap
        # frames[i] holds stream index self._base + i
        self._frames = deque()
        self._base = 0
        self._seen = 0
        self._next_start = 0  # stream index of the next window's first output
        self._inflight = None  # (device_array, n_keep)
        self._flushed = False

    def warmup(self, frame_shape, dtype=np.float32):
        """Compile the window program before the stream starts (serving
        startup cost, not first-frame latency). frame_shape: (H, W, C)."""
        dummy = jnp.zeros(
            (self.num_streams, self.window, *frame_shape), dtype
        )
        np.asarray(self._apply(dummy, *self._hw))

    def _window_indices(self, s, last_idx):
        lo = s - self.overlap
        return np.clip(np.arange(lo, lo + self.window), 0, last_idx)

    def _dispatch(self, s, last_idx):
        idx = self._window_indices(s, last_idx)
        # frames are stored (S, H, W, C); stack time then put streams first
        window = np.stack(
            [self._frames[i - self._base] for i in idx], axis=1
        )
        out = self._apply(jnp.asarray(window), *self._hw)  # async dispatch
        n_keep = min(self.chunk, self._seen - s)
        return out, n_keep

    def _harvest(self):
        out, n_keep = self._inflight
        self._inflight = None
        sr = np.asarray(out)[:, self.overlap : self.overlap + n_keep]
        if self.num_streams == 1:
            return list(sr[0])
        return list(np.swapaxes(sr, 0, 1))  # time-ordered (S, OH, OW, C)

    def _drop_consumed(self):
        # frames below next window's left context are dead
        keep_from = self._next_start - self.overlap
        while self._base < keep_from and self._frames:
            self._frames.popleft()
            self._base += 1

    def push(self, frame):
        """Add the next frame — (H, W, C), or (S, H, W, C) holding every
        stream's frame for this time step when ``num_streams > 1``. Returns
        the list of SR frames that became ready (possibly empty), in stream
        order; each entry is (H, W, C) or (S, OH, OW, C) respectively."""
        if self._flushed:
            raise RuntimeError("push() after flush()")
        frame = np.asarray(frame)
        if self.num_streams == 1 and frame.ndim == 3:
            frame = frame[None]
        if frame.shape[0] != self.num_streams:
            raise ValueError(
                f"expected {self.num_streams} stream frames, got "
                f"{frame.shape[0]}"
            )
        self._frames.append(frame)
        self._seen += 1
        ready = []
        # window for output span [s, s+chunk) needs frames through
        # s + chunk + overlap - 1
        while self._seen >= self._next_start + self.chunk + self.overlap:
            if self._inflight is not None:
                ready.extend(self._harvest())
            self._inflight = self._dispatch(self._next_start, self._seen - 1)
            self._next_start += self.chunk
            self._drop_consumed()
        # deliver a finished window without waiting for the next dispatch —
        # but never BLOCK here: an unfinished window keeps the pipeline
        # primed so the next dispatch overlaps this window's D2H
        if self._inflight is not None:
            out = self._inflight[0]
            if getattr(out, "is_ready", lambda: False)():
                ready.extend(self._harvest())
        return ready

    def flush(self):
        """End of stream: emit every remaining frame (right edge replicated,
        exactly like ``chunked_vsr_apply``'s clip-end clamp)."""
        self._flushed = True
        ready = []
        while self._next_start < self._seen:
            if self._inflight is not None:
                ready.extend(self._harvest())
            self._inflight = self._dispatch(self._next_start, self._seen - 1)
            self._next_start += self.chunk
            self._drop_consumed()
        if self._inflight is not None:
            ready.extend(self._harvest())
        self._frames.clear()
        return ready
