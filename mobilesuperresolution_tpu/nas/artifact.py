"""The search artifact: ``block_index.txt``.

Every downstream consumer (result-net retraining, naive-multi VSR, export)
reads this file. Format per line (reference search.py:125-127):

    <remain_block_idx_list>:<remain_width_list>

where remain_width is a list of [mask_channels, split_channels, kernel] per
surviving block. The last line is the final architecture. The reference parses
lines with ``eval``; we write the identical format but parse with
``ast.literal_eval`` (SURVEY §7.4 fidelity decision).
"""

import ast
import os


def append_block_index(job_dir, remain_idx, remain_width):
    path = os.path.join(job_dir, "block_index.txt")
    os.makedirs(job_dir, exist_ok=True)
    with open(path, "a") as f:
        f.write(f"{remain_idx}:{remain_width}\n")
    return path


def read_block_index(path):
    """Parse the LAST line → (remain_idx, remain_width). Accepts a job dir or a
    direct file path."""
    if os.path.isdir(path):
        path = os.path.join(path, "block_index.txt")
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    last = lines[-1]
    idx_str, width_str = last.split(":", 1)
    return ast.literal_eval(idx_str), ast.literal_eval(width_str)
