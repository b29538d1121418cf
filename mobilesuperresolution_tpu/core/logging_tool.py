"""Process-0-gated file + console logging (reference: utils/logging_tool.py:19-44).

On TPU pods the analog of "rank 0" is ``jax.process_index() == 0``.
"""

import logging
import os
import sys
import time


class LoggingTool:
    def __init__(self, job_dir=None, name="msr_tpu", process_index=None, verbose=True):
        if process_index is None:
            try:
                import jax

                process_index = jax.process_index()
            except Exception:
                process_index = 0
        self.process_index = process_index
        self.is_chief = process_index == 0
        self.logger = logging.getLogger(f"{name}.{id(self)}")
        self.logger.setLevel(logging.INFO)
        self.logger.propagate = False
        self.logger.handlers.clear()
        if self.is_chief and verbose:
            sh = logging.StreamHandler(sys.stdout)
            sh.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
            self.logger.addHandler(sh)
        if self.is_chief and job_dir is not None:
            os.makedirs(job_dir, exist_ok=True)
            fh = logging.FileHandler(os.path.join(job_dir, "result.log"))
            fh.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
            self.logger.addHandler(fh)

    def info(self, msg, *args):
        if self.is_chief:
            self.logger.info(msg, *args)

    def warning(self, msg, *args):
        if self.is_chief:
            # ANSI-colored warning like the reference.
            self.logger.warning("\033[93m" + str(msg) + "\033[0m", *args)

    def error(self, msg, *args):
        if self.is_chief:
            self.logger.error(msg, *args)
