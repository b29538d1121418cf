"""End-to-end search/dataset CLI flows that build their own jobs (resume,
degenerate target, mobile speed table, prepare_dataset, compile cache) --
split from test_pipeline_e2e.py (the shared-artifact chain) so each file
fits a bounded per-command runtime on the 1-CPU host."""

import os

import numpy as np
import jax

from mobilesuperresolution_tpu.cli import search as search_cli


def test_search_resume(tmp_path):
    """REAL search resume (the reference's --resume is a no-op): a second run
    with --resume and an extended width phase skips the completed epochs,
    restores mid-phase optimizer state, and trains only the new epoch."""
    job = tmp_path / "search_resume"
    common = [
        "--job_dir", str(job),
        "--dataset", "synthetic_isr",
        "--eval_datasets",
        "--num_blocks", "2",
        "--num_residual_units", "8",
        "--scale", "2",
        "--width_search",
        "--speed_target", "5",
        "--epochs", "0",
        "--kernel_epochs", "0",
        "--train_batch_size", "8",
        "--lr_patch_size", "16",
        "--num_patches", "2",
        "--log_steps", "1",
    ]
    search_cli.main(["--width_epochs", "2", *common])
    lines_before = (job / "block_index.txt").read_text().strip().count("\n") + 1

    search_cli.main(["--width_epochs", "3", "--resume", *common])
    log = (job / "result.log").read_text()
    assert "resuming search from epoch 2" in log
    resumed_part = log.split("resuming search from epoch 2")[1]
    # only the NEW epoch trains after the resume point
    assert "[width e3" in resumed_part
    assert "[width e1" not in resumed_part
    assert "[width e2" not in resumed_part
    lines_after = (job / "block_index.txt").read_text().strip().count("\n") + 1
    assert lines_after > lines_before

def test_prepare_dataset_cli(tmp_path):
    """prepare_dataset builds caches / counts items for both modes
    (reference prepare_dataset.py:5-20)."""
    from mobilesuperresolution_tpu.cli import prepare_dataset as prep_cli

    job = tmp_path / "prep"
    prep_cli.main(
        ["--job_dir", str(job), "--dataset", "synthetic_isr",
         "--eval_datasets", "synthetic_isr", "--scale", "2"]
    )
    log = (job / "result.log").read_text()
    assert "items cached" in log

def test_search_met_target_degenerate(tmp_path):
    """speed_target above the supernet's (measured) speed must not explode
    the SpeedLoss scale or anneal backwards — constant target, warning, and
    a completed search (cli/search.py degenerate branch)."""
    job = tmp_path / "search_met"
    search_cli.main(
        [
            "--job_dir", str(job),
            "--dataset", "synthetic_isr",
            "--eval_datasets",
            "--num_blocks", "2",
            "--num_residual_units", "8",
            "--scale", "2",
            "--width_search",
            "--speed_target", "100000",
            "--width_epochs", "1",
            "--epochs", "0",
            "--kernel_epochs", "0",
            "--train_batch_size", "8",
            "--lr_patch_size", "16",
            "--num_patches", "2",
            "--log_steps", "1",
        ]
    )
    log = (job / "result.log").read_text()
    assert "already meets the speed target" in log
    assert "speed target: 100000.00" in log  # constant, not annealed from below
    assert (job / "block_index.txt").exists()

def test_search_with_mobile_speed_table(tmp_path):
    """The paper's point: searching against a MOBILE latency target. The
    packaged huawei_p30 CPU table (copied from the reference's measured
    benchmark data, speed_models/speed_data/huawei_p30/cpu.npy, schema
    data_generate_from_txt.py:83) drives a real search end-to-end:
    ori_speed comes from the mobile table (2 x 21.02 ms at k=7 ch8 -> NOT
    the v5e table's sub-ms values), the annealing target scales from it,
    and the block_index.txt artifact is written."""
    import numpy as np

    from mobilesuperresolution_tpu.nas.speed_estimator import (
        KERNEL_CHOICES,
        densify_speed_table,
        packaged_table_path,
    )

    path = packaged_table_path("huawei_p30_cpu")
    assert path is not None
    rows = np.load(path)
    assert rows.shape == (108, 4)
    dense = densify_speed_table(rows, max_ch=8)
    # mobile latencies are k-ordered and in the tens-of-ms regime at k=7
    k3, k5, k7 = (dense[KERNEL_CHOICES.index(k), 8, 8] for k in (3, 5, 7))
    assert 0 < k3 < k5 < k7
    assert k7 > 5.0  # v5e-measured blocks are sub-ms: this must be mobile

    job = tmp_path / "mobile_search"
    search_cli.main(
        [
            "--job_dir", str(job),
            "--dataset", "synthetic_isr",
            "--eval_datasets",
            "--num_blocks", "2",
            "--num_residual_units", "8",
            "--scale", "2",
            "--width_search",
            "--speed_table", "huawei_p30_cpu",
            "--speed_target", "10",
            "--width_epochs", "1",
            "--epochs", "1",
            "--kernel_epochs", "1",
            "--train_batch_size", "8",
            "--lr_patch_size", "16",
            "--num_patches", "2",
            "--log_steps", "1",
        ]
    )
    log = (job / "result.log").read_text()
    assert "huawei_p30_cpu" in log
    # supernet baseline = 2 blocks x mobile k=7 latency, annealed toward 10ms
    import re

    m = re.search(r"Supernet Speed: ([0-9.]+) ms; target ([0-9.]+)", log)
    assert m, log
    ori = float(m.group(1))
    assert abs(ori - 2 * float(k7)) < 1e-2, (ori, k7)
    assert float(m.group(2)) == 10.0
    assert (job / "block_index.txt").exists()
    # per-epoch annealing targets decay from ori toward the target
    targets = [float(x) for x in re.findall(r"speed target: ([0-9.]+) ms", log)]
    assert targets and all(t <= ori + 1e-6 for t in targets)

def test_compile_cache_populates(tmp_path):
    """--compile_cache (default-on on accelerator backends; an explicit path
    enables it anywhere, incl. this CPU subprocess) persists compiled programs:
    a fresh process re-running the same job skips recompilation — the TPU
    production restart/resume path, where one model-sized compile is tens of
    seconds. Run in a subprocess because jax's persistent-cache backend is a
    lazily-created singleton: the directory must be configured before the
    process's first compile (which parse_with_plugins guarantees for real CLI
    processes, but a prior test in THIS process has already compiled)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    cache = tmp_path / "xla_cache"
    script = (
        "import os\n"
        "os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'\n"
        "import sys, jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from mobilesuperresolution_tpu.cli import pretrain\n"
        "pretrain.main(sys.argv[1:])\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", script,
         "--job_dir", str(tmp_path / "job"), "--dataset", "synthetic_isr",
         "--eval_datasets", "--num_blocks", "1", "--num_residual_units", "8",
         "--scale", "2", "--train_batch_size", "8", "--lr_patch_size", "16",
         "--num_patches", "2", "--epochs", "1",
         "--compile_cache", str(cache)],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    entries = [p for p in cache.rglob("*") if p.is_file()]
    assert entries, "compilation cache stayed empty"

    # '' disables without error (in-process is fine for the off path)
    from mobilesuperresolution_tpu.cli import prepare_dataset as prep_cli

    prep_cli.main([
        "--job_dir", str(tmp_path / "job2"), "--dataset", "synthetic_isr",
        "--eval_datasets", "synthetic_isr", "--scale", "2",
        "--compile_cache", "",
    ])
