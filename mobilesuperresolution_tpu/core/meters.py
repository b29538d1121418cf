"""Loss / wall-clock meters (reference: common/meters.py:6-52)."""

import time


class AverageMeter:
    """Tracks a running average of a scalar (e.g. loss)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0
        self.avg = 0.0

    def update(self, val, n=1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class TimeMeter:
    """Wall-clock meter with ETA estimation."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.start_time = time.time()
        self.n = 0

    def update(self, n=1):
        self.n += n

    @property
    def elapsed(self):
        return time.time() - self.start_time

    @property
    def rate(self):
        return self.n / max(self.elapsed, 1e-9)

    def complete_time(self, remaining):
        """Seconds until `remaining` more updates complete at the current rate."""
        return remaining / max(self.rate, 1e-9)
