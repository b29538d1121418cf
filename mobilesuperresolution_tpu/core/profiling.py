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


class Span:
    """with Span() as s: ...; s.ms"""

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.ms = (time.perf_counter() - self.t0) * 1e3
        return False
