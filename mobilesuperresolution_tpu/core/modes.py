"""Run-mode constants (reference: common/modes.py:3-5)."""

TRAIN = "train"
EVAL = "eval"
PREDICT = "predict"
