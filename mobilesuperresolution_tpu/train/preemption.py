"""Preemption-safe training (SURVEY §5.3 — the reference has no failure
handling beyond a crash).

``PreemptionGuard`` turns two stop sources into one per-step decision:

- **signals** (SIGTERM by default — what TPU-pod maintenance events and
  cluster managers deliver): the handler only sets a flag; training loops
  poll it at optimizer-step boundaries, write a mid-epoch checkpoint, and
  exit 0 instead of dying mid-write;
- **a step budget** (``--max_steps_per_run``): stop after N optimizer steps
  this process lifetime — deterministic "planned preemption" for time-sliced
  clusters, and how the tests exercise the exact same save/exit path.

Mid-epoch checkpoints are EXACT, not approximate: patch sampling is a pure
function of (epoch seed, item index) (see data/isr.py ``_batches``), so a
resumed process replays the remaining batches of the interrupted epoch
bit-for-bit — the interrupted-and-resumed run's final parameters are
bit-identical to an uninterrupted run (tests/test_preemption.py).

Multi-process: the stop decision must be unanimous or the job deadlocks in
the next collective (some hosts training, some saving). The step budget is
deterministic and identical everywhere; the signal flag is OR-reduced over
processes every ``sync_every`` steps via a tiny allgather (cluster managers
normally signal every host, but one lost signal must not hang the job).
"""

import signal as _signal

import numpy as np


def save_midepoch(ckpt, job_dir, epoch, state, batches_done):
    """One mid-epoch full-state save — on a preemption stop or a periodic
    ``--checkpoint_every_steps`` crash-resilience save. Records the batch
    position in the checkpoint's ``extra`` so ``--resume`` replays the
    remaining batches of the epoch exactly; the chief also refreshes the
    weights npz (written atomically — a hard kill mid-write must not corrupt
    the artifact the search resume path reads)."""
    import jax

    from mobilesuperresolution_tpu.train.checkpoint import save_params_npz

    ckpt.save(epoch, state, extra={"batches_done": batches_done}, force=True)
    if jax.process_index() == 0:
        save_params_npz(job_dir, state.params)


class PreemptionGuard:
    def __init__(self, max_steps=0, signals=(_signal.SIGTERM,), sync_every=16):
        self.max_steps = int(max_steps or 0)
        self.sync_every = max(1, int(sync_every))
        self.steps = 0
        self._signaled = False
        self._synced_stop = False
        self._prev = {}
        for s in signals:
            try:
                self._prev[s] = _signal.signal(s, self._handler)
            except ValueError:
                # not the main thread (e.g. a test harness) — budget-only
                pass

    def _handler(self, signum, frame):
        self._signaled = True

    def restore_handlers(self):
        for s, h in self._prev.items():
            _signal.signal(s, h)
        self._prev = {}

    def _signal_flag_synced(self):
        import jax

        if jax.process_count() == 1:
            return self._signaled
        if self.steps % self.sync_every:
            return self._synced_stop
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray([self._signaled], dtype=np.bool_)
        )
        self._synced_stop = bool(np.asarray(flags).any())
        return self._synced_stop

    def step_and_should_stop(self) -> bool:
        """Call once per completed optimizer step. True = checkpoint and exit."""
        self.steps += 1
        if self.max_steps and self.steps >= self.max_steps:
            return True
        return self._signal_flag_synced()
