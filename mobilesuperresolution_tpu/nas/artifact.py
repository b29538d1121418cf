"""The search artifact: ``block_index.txt``.

Every downstream consumer (result-net retraining, naive-multi VSR, export)
reads this file. The reference appends, at every log step of the search, the
Python tuple repr (search.py:125-127):

    ([remain_block_idx, ...], [[mask_ch, split_ch, kernel], ...])

and consumers ``eval`` the LAST line, taking element [1] for the widths
(naive_multi_model_easy.py:149-154, pretrain_simplified_model.py:96-101).
We write the identical format but parse with ``ast.literal_eval``
(SURVEY §7.4 fidelity decision); a ``idx:width`` colon form is also accepted.
"""

import ast
import os


def append_block_index(job_dir, remain_idx, remain_width):
    path = os.path.join(job_dir, "block_index.txt")
    os.makedirs(job_dir, exist_ok=True)
    with open(path, "a") as f:
        f.write(f"{(list(remain_idx), [list(w) for w in remain_width])}\n")
    return path


def read_block_index(path):
    """Parse the LAST line → (remain_idx, remain_width). Accepts a job dir or
    a direct file path, tuple-repr or colon format."""
    if os.path.isdir(path):
        path = os.path.join(path, "block_index.txt")
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    last = lines[-1]
    if last.startswith("("):
        idx, width = ast.literal_eval(last)
        return list(idx), [list(w) for w in width]
    idx_str, width_str = last.split(":", 1)
    return ast.literal_eval(idx_str), ast.literal_eval(width_str)
