"""Multi-host runtime tests: a REAL 2-process JAX cluster on CPU.

The reference's distributed story is NCCL DDP across processes
(pretrain.py:153-159, SURVEY §5.8). Here two subprocesses form one JAX
cluster (gloo collectives), run the data-parallel SISR step over a 4-device
global mesh, and must produce the identical loss trajectory to a
single-process 4-device run on the same global batch.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "helpers", "distributed_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the worker forces the cpu platform itself; drop any plugin pinning
    env.pop("JAX_PLATFORMS", None)
    return env


def _parse_last_json(text):
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise AssertionError(f"no JSON line in output:\n{text}")


def _launch(args, out_path):
    """Launch a worker with stdout/stderr to a FILE: a PIPE that is not
    drained until communicate() can fill (64 KiB of backend warnings is
    easy) and freeze the worker mid-cluster, deadlocking the others."""
    with open(out_path, "w") as out_f:
        return subprocess.Popen(
            [sys.executable, WORKER, *args],
            stdout=out_f,
            stderr=subprocess.STDOUT,
            text=True,
            env=_env(),
        )


def test_two_process_cluster_matches_single_process(tmp_path):
    port = _free_port()
    paths = [tmp_path / f"worker{i}.txt" for i in range(2)]
    cluster = [
        _launch(
            [
                "--port", str(port),
                "--num_processes", "2",
                "--process_id", str(i),
                "--devices_per_process", "2",
            ],
            paths[i],
        )
        for i in range(2)
    ]
    outs = []
    for p, path in zip(cluster, paths):
        p.wait(timeout=600)
        out = path.read_text()
        outs.append(out)
        assert p.returncode == 0, out
    results = [_parse_last_json(o) for o in outs]
    assert all(r["n_devices"] == 4 for r in results), results
    assert all(r["process_count"] == 2 for r in results), results
    # both cluster members observe the identical (psum-reduced) loss
    np.testing.assert_array_equal(results[0]["losses"], results[1]["losses"])

    single_path = tmp_path / "single.txt"
    single = _launch(
        ["--port", str(_free_port()), "--num_processes", "1",
         "--devices_per_process", "4"],
        single_path,
    )
    single.wait(timeout=600)
    out = single_path.read_text()
    assert single.returncode == 0, out
    ref = _parse_last_json(out)
    assert ref["process_count"] == 1
    # the multi-process train step IS the single-process one: same global
    # batch -> same loss (bitwise on this deterministic CPU path) and same
    # final params
    np.testing.assert_allclose(results[0]["losses"], ref["losses"], rtol=1e-6)
    np.testing.assert_allclose(
        results[0]["checksum"], ref["checksum"], rtol=1e-5
    )


def test_two_process_search_step_matches_single_process(tmp_path):
    """The signature workload (NAS search, search.py:290-405) across a REAL
    2-process cluster: phase-masked optimizer + replicated measured speed
    table + traced latency. The cluster must reproduce the single-process
    loss/speed trajectory AND discover the identical surviving architecture
    (remain_idx/remain_width — the block_index.txt content, search.py:125-127)."""
    port = _free_port()
    paths = [tmp_path / f"sworker{i}.txt" for i in range(2)]
    cluster = [
        _launch(
            [
                "--port", str(port),
                "--num_processes", "2",
                "--process_id", str(i),
                "--devices_per_process", "2",
                "--workload", "search",
            ],
            paths[i],
        )
        for i in range(2)
    ]
    outs = []
    for p, path in zip(cluster, paths):
        p.wait(timeout=600)
        out = path.read_text()
        outs.append(out)
        assert p.returncode == 0, out
    results = [_parse_last_json(o) for o in outs]
    # a misconfigured mesh (e.g. XLA_FLAGS not applied) would silently run on
    # fewer devices while still passing parity — pin the topology
    assert all(r["n_devices"] == 4 for r in results), results
    assert all(r["process_count"] == 2 for r in results), results
    np.testing.assert_array_equal(results[0]["losses"], results[1]["losses"])

    single_path = tmp_path / "ssingle.txt"
    single = _launch(
        ["--port", str(_free_port()), "--num_processes", "1",
         "--devices_per_process", "4", "--workload", "search"],
        single_path,
    )
    single.wait(timeout=600)
    out = single_path.read_text()
    assert single.returncode == 0, out
    ref = _parse_last_json(out)
    assert ref["n_devices"] == 4 and ref["process_count"] == 1, ref
    np.testing.assert_allclose(results[0]["losses"], ref["losses"], rtol=1e-6)
    np.testing.assert_allclose(results[0]["speeds"], ref["speeds"], rtol=1e-6)
    assert results[0]["remain_idx"] == ref["remain_idx"]
    assert results[0]["remain_width"] == ref["remain_width"]
    np.testing.assert_allclose(results[0]["checksum"], ref["checksum"], rtol=1e-5)


def test_per_host_batch_counts_equalized(monkeypatch):
    """Every process must run the SAME number of batches per epoch — the
    train step is a cross-host collective, so one host running an extra
    step while the others wait at the checkpoint barrier deadlocks the job.
    The per-host slicing wrap-pads like DistributedSampler."""
    import jax

    from mobilesuperresolution_tpu.data.isr import _batches

    class _DS:
        def __len__(self):
            return 7

        def __getitem__(self, i):
            return (np.full((2, 2, 1), i, np.float32),
                    np.full((4, 4, 1), i, np.float32))

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    per_host = []
    for pid in range(2):
        monkeypatch.setattr(jax, "process_index", lambda pid=pid: pid)
        batches = list(_batches(_DS(), 2, shuffle=True, seed=0,
                                drop_last=True, shard_by_process=True))
        per_host.append(batches)
    assert len(per_host[0]) == len(per_host[1]) == 2
    # the union of per-host items covers the dataset (one wrap duplicate)
    seen = {
        int(b[0][j, 0, 0, 0]) for b in per_host[0] + per_host[1]
        for j in range(b[0].shape[0])
    }
    assert seen <= set(range(7)) and len(seen) >= 6


def test_steps_per_epoch_uses_per_host_count(monkeypatch):
    """LR-schedule milestones are denominated in steps; with per-host
    sharding each process runs ~n/(P*B) steps per epoch, not n/B."""
    import jax

    from mobilesuperresolution_tpu.cli.common_cli import train_steps_per_epoch

    monkeypatch.setattr(jax, "process_count", lambda: 1)
    assert train_steps_per_epoch(1000, 16) == 62
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    assert train_steps_per_epoch(1000, 16) == 15  # ceil(1000/4)=250 -> 15
    assert train_steps_per_epoch(3, 16) == 1  # floor of 1


def test_pretrain_cli_multiprocess(tmp_path):
    """End-to-end: the pretrain CLI joins a 2-process cluster through the
    --coordinator_address flags, trains an epoch on the synthetic dataset,
    checkpoints (orbax, all-process coordinated), and the chief writes the
    log + weights npz exactly once."""
    port = _free_port()
    job = tmp_path / "job"
    script = (
        "import os\n"
        "os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'\n"
        "import sys, jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from mobilesuperresolution_tpu.cli import pretrain\n"
        "pretrain.main(sys.argv[1:])\n"
    )
    common = [
        "--job_dir", str(job),
        "--dataset", "synthetic_isr", "--eval_datasets", "synthetic_isr",
        "--model_type", "BASIC_MODEL", "--num_blocks", "1",
        "--num_residual_units", "8", "--scale", "2",
        "--train_batch_size", "2", "--num_patches", "2",
        "--lr_patch_size", "16", "--epochs", "1",
        "--coordinator_address", f"localhost:{port}",
        "--num_processes", "2",
    ]
    out_paths = [tmp_path / f"cli_worker{i}.txt" for i in range(2)]
    procs = []
    for i in range(2):
        with open(out_paths[i], "w") as out_f:
            procs.append(subprocess.Popen(
                [sys.executable, "-c", script, *common,
                 "--process_id", str(i)],
                stdout=out_f,
                stderr=subprocess.STDOUT,
                text=True,
                env=_env(),
            ))
    for p, path in zip(procs, out_paths):
        p.wait(timeout=600)
        assert p.returncode == 0, path.read_text()
    log = (job / "result.log").read_text()
    assert "Finish Training" in log
    assert (job / "weights" / "models.npz").exists()
    assert (job / "ckpt").exists()
