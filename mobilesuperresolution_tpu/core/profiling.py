"""Tracing/profiling helpers (SURVEY §5.1 — the reference has only ad-hoc
time.time() spans; here: real XLA traces + a span timer).

``trace(job_dir)`` dumps a TensorBoard-viewable XLA profile of everything
inside the context; ``Span`` is the TimeMeter-style wall-clock scope.
"""

import contextlib
import os
import time


@contextlib.contextmanager
def trace(job_dir, name="trace"):
    import jax

    out = os.path.join(job_dir, "profile", name)
    os.makedirs(out, exist_ok=True)
    jax.profiler.start_trace(out)
    try:
        yield out
    finally:
        jax.profiler.stop_trace()


class StepProfiler:
    """Capture ONE XLA trace spanning the first N optimizer steps of a run
    (``--xla_profile_steps``; 0 = disabled), written to
    ``<job_dir>/profile/<name>`` in TensorBoard's profiler format. The trace
    includes the first-step compile — pass N >= 2 to also see a steady-state
    step. Every process traces (the files are host-tagged); ``close()`` is
    idempotent and must run on early exits so the trace is flushed (the
    trainers call it in a ``finally``)."""

    def __init__(self, job_dir, steps=0, name="train"):
        self.remaining = int(steps or 0)
        self.out = None
        if self.remaining > 0:
            import jax

            self.out = os.path.join(job_dir, "profile", name)
            os.makedirs(self.out, exist_ok=True)
            jax.profiler.start_trace(self.out)

    def step(self):
        """Call once per completed optimizer step."""
        if self.remaining > 0:
            self.remaining -= 1
            if self.remaining == 0:
                self.close()

    def close(self):
        if self.out is not None:
            import jax

            jax.profiler.stop_trace()
            self.out = None


class Span:
    """with Span() as s: ...; s.ms"""

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.ms = (time.perf_counter() - self.t0) * 1e3
        return False
