"""Training observability — the reference's SummaryWriter role
(search.py:104-132, train_video_superresolution.py:144-147).

Always writes an append-only ``metrics.jsonl`` in the job dir (easy to parse,
survives any environment); TensorBoard event files are written too when
tensorflow is importable. Chief-process-gated like the reference's rank-0
writer.
"""

import json
import os
import time


class MetricsWriter:
    def __init__(self, job_dir, enabled=True):
        try:
            import jax

            chief = jax.process_index() == 0
        except Exception:
            chief = True
        self.enabled = enabled and job_dir is not None and chief
        self._tb = None
        if not self.enabled:
            return
        os.makedirs(job_dir, exist_ok=True)
        self._path = os.path.join(job_dir, "metrics.jsonl")
        try:
            import tensorflow as tf

            self._tb = tf.summary.create_file_writer(os.path.join(job_dir, "tb"))
        except Exception:
            self._tb = None

    def scalar(self, tag, value, step):
        if not self.enabled:
            return
        rec = {"tag": tag, "value": float(value), "step": int(step), "ts": time.time()}
        with open(self._path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                tf.summary.scalar(tag, float(value), step=int(step))

    def scalars(self, values, step, prefix=""):
        for k, v in values.items():
            self.scalar(f"{prefix}{k}", v, step)

    def flush(self):
        if self._tb is not None:
            self._tb.flush()
