"""Preemption-safe training (SURVEY §5.3 — the reference has no failure
handling; its --resume is a no-op).

The contract under test: an interrupted-and-resumed run produces final
parameters BIT-IDENTICAL to an uninterrupted run. This holds because
(a) stops land only at optimizer-step boundaries (train/preemption.py),
(b) the mid-epoch checkpoint records the batch position, and
(c) patch/flip sampling is a pure function of (epoch seed, item index)
    (data/isr.py ``_batches``), so the resumed process replays the remaining
    batches of the interrupted epoch exactly.
"""

import os
import signal
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

from mobilesuperresolution_tpu.core import modes
from mobilesuperresolution_tpu.data.isr import batch_iterator
from mobilesuperresolution_tpu.data.synthetic import SyntheticISRDataset
from mobilesuperresolution_tpu.train.preemption import PreemptionGuard


class P:
    scale = 2
    lr_patch_size = 16
    ignored_boundary_size = 2
    num_patches = 2
    seed = 0


def _collect(ds, start_batch=0, prefetch=0):
    return list(
        batch_iterator(
            ds, 4, shuffle=True, seed=7, drop_last=True,
            prefetch=prefetch, start_batch=start_batch,
        )
    )


def test_batch_stream_is_pure_and_resumable():
    """start_batch=k yields bitwise the tail of the full stream, and the
    stream is independent of prefetch depth (the draws derive from
    (seed, index), not from consumption order)."""
    ds = SyntheticISRDataset(modes.TRAIN, P(), num_images=6, hw=(96, 96))
    full = _collect(ds)
    assert len(full) >= 3
    again = _collect(ds, prefetch=2)
    tail = _collect(ds, start_batch=2)
    assert len(tail) == len(full) - 2
    for (a_lr, a_hr), (b_lr, b_hr) in zip(full, again):
        np.testing.assert_array_equal(a_lr, b_lr)
        np.testing.assert_array_equal(a_hr, b_hr)
    for (a_lr, a_hr), (b_lr, b_hr) in zip(full[2:], tail):
        np.testing.assert_array_equal(a_lr, b_lr)
        np.testing.assert_array_equal(a_hr, b_hr)


def test_guard_step_budget():
    g = PreemptionGuard(max_steps=3)
    try:
        assert [g.step_and_should_stop() for _ in range(4)] == [
            False, False, True, True,
        ]
    finally:
        g.restore_handlers()


def test_guard_sigterm_stops_at_next_step():
    g = PreemptionGuard(max_steps=0)
    try:
        assert g.step_and_should_stop() is False
        signal.raise_signal(signal.SIGTERM)  # handler only sets a flag
        assert g.step_and_should_stop() is True
    finally:
        g.restore_handlers()


def _pretrain(job, extra=()):
    from mobilesuperresolution_tpu.cli import pretrain as pretrain_cli

    pretrain_cli.main([
        "--job_dir", str(job),
        "--dataset", "synthetic_isr",
        "--eval_datasets",
        "--num_blocks", "1",
        "--num_residual_units", "8",
        "--scale", "2",
        "--epochs", "2",
        "--train_batch_size", "8",
        "--lr_patch_size", "16",
        "--num_patches", "2",
        *extra,
    ])


def _load_npz(job):
    with np.load(str(job / "weights" / "models.npz")) as z:
        return {k: z[k].copy() for k in z.files}


def test_pretrain_preempt_resume_bit_exact(tmp_path):
    """16 virtual items / batch 8 = 2 steps per epoch, 2 epochs = 4 steps.
    --max_steps_per_run 3 stops mid-epoch-2; --resume replays its remaining
    batch. Final weights must equal the uninterrupted run's bit-for-bit."""
    ref = tmp_path / "uninterrupted"
    _pretrain(ref)

    job = tmp_path / "preempted"
    _pretrain(job, ["--max_steps_per_run", "3"])
    log = (job / "result.log").read_text()
    assert "preempted at epoch 2 batch 1" in log

    _pretrain(job, ["--resume"])
    log = (job / "result.log").read_text()
    assert "resumed from epoch 2, batch 1" in log

    a, b = _load_npz(ref), _load_npz(job)
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_search_preempt_resume_completes(tmp_path):
    """Same path through the 3-phase search driver: a budget stop inside the
    width phase, then --resume re-enters the interrupted epoch at its batch
    offset, restores the phase-local optimizer state, and finishes all
    phases (final block_index line present)."""
    from mobilesuperresolution_tpu.cli import search as search_cli
    from mobilesuperresolution_tpu.nas.artifact import read_block_index

    job = tmp_path / "search_preempt"
    common = [
        "--job_dir", str(job),
        "--dataset", "synthetic_isr",
        "--eval_datasets",
        "--num_blocks", "2",
        "--num_residual_units", "8",
        "--scale", "2",
        "--width_search",
        "--speed_target", "5",
        "--width_epochs", "2",
        "--epochs", "0",
        "--kernel_epochs", "1",
        "--train_batch_size", "8",
        "--lr_patch_size", "16",
        "--num_patches", "2",
        "--log_steps", "1",
    ]
    search_cli.main(["--max_steps_per_run", "3", *common])
    log = (job / "result.log").read_text()
    assert "preempted in phase width at epoch 2 batch 1" in log

    search_cli.main(["--resume", *common])
    log = (job / "result.log").read_text()
    assert "resuming search from epoch 2, batch 1" in log
    resumed = log.split("resuming search from epoch 2, batch 1")[1]
    # epoch 1 does not retrain; epoch 2 re-enters; the kernel phase runs
    assert "[width e1" not in resumed
    assert "[width e2" in resumed
    assert "[kernel e3" in resumed
    idx, width = read_block_index(str(job))
    assert all(w[2] in (3, 5, 7) for w in width)


def test_crash_sigkill_resume_bit_exact(tmp_path):
    """--checkpoint_every_steps N bounds what a HARD crash loses: SIGKILL the
    trainer mid-training (no handler can run), then --resume must pick up
    the last complete per-step checkpoint and replay the rest of the epoch —
    final weights bit-identical to an uninterrupted run. Orbax commits saves
    atomically and the weights npz is tmp+rename, so a kill mid-write leaves
    the previous complete save."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    script = (
        "import os\n"
        "os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'\n"
        "import sys, jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from mobilesuperresolution_tpu.cli import pretrain\n"
        "pretrain.main(sys.argv[1:])\n"
    )

    def flags(job):
        return [
            "--job_dir", str(job),
            "--dataset", "synthetic_isr", "--eval_datasets",
            "--num_blocks", "1", "--num_residual_units", "8", "--scale", "2",
            "--train_batch_size", "8", "--lr_patch_size", "16",
            # 8 imgs x6 = 48 items -> 6 steps/epoch
            "--num_patches", "6", "--epochs", "3",
        ]

    ref = tmp_path / "uninterrupted"
    from mobilesuperresolution_tpu.cli import pretrain as pretrain_cli

    pretrain_cli.main(flags(ref))

    job = tmp_path / "crashed"
    # subprocess output goes to a FILE, not a PIPE: the child may emit
    # many KB of backend warnings before we'd ever drain a pipe, and a
    # full 64 KiB pipe blocks its main thread before "epoch 1" is reached
    out_path = tmp_path / "crashed_stdout.txt"
    with open(out_path, "w") as out_f:
        proc = subprocess.Popen(
            [sys.executable, "-c", script, *flags(job),
             "--checkpoint_every_steps", "1"],
            stdout=out_f, stderr=subprocess.STDOUT, text=True, env=env,
        )
    log = job / "result.log"
    try:
        deadline = time.time() + 300
        while time.time() < deadline:
            if log.exists() and "epoch 1:" in log.read_text():
                break
            assert proc.poll() is None, out_path.read_text()
            time.sleep(0.25)
        else:
            raise AssertionError("training never reached epoch 1")
        proc.kill()  # SIGKILL: no clean-exit path runs
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert "Finish Training" not in log.read_text()  # it really died mid-run

    pretrain_cli.main([*flags(job), "--resume"])
    assert "Finish Training" in log.read_text()

    a, b = _load_npz(ref), _load_npz(job)
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_multiprocess_sigterm_stops_all_hosts(tmp_path):
    """The deadlock-risk path (train/preemption.py module docstring): in a
    2-process cluster, SIGTERM delivered to ONE process must stop BOTH at
    the same allgather-synchronized step boundary — a half-stopped job would
    hang in the next collective. Both processes must exit 0 with a mid-epoch
    checkpoint written."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()

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
        "--dataset", "synthetic_isr", "--eval_datasets",
        "--model_type", "BASIC_MODEL", "--num_blocks", "1",
        "--num_residual_units", "8", "--scale", "2",
        # 8 imgs x3 = 24 items, 12 per host, 6 steps/epoch: the sync
        # boundary (step 16) falls MID-epoch (epoch 3, batch 4)
        "--train_batch_size", "2", "--num_patches", "3",
        "--lr_patch_size", "16", "--epochs", "50",
        "--coordinator_address", f"localhost:{port}",
        "--num_processes", "2",
    ]
    # per-worker output FILES, not PIPEs: backend warnings can exceed pipe
    # capacity long before we drain, freezing the worker mid-startup (and a
    # frozen worker stalls the whole cluster at the next collective)
    out_paths = [tmp_path / f"worker{i}_stdout.txt" for i in range(2)]
    procs = []
    for i in range(2):
        with open(out_paths[i], "w") as out_f:
            procs.append(subprocess.Popen(
                [sys.executable, "-c", script, *common,
                 "--process_id", str(i)],
                stdout=out_f,
                stderr=subprocess.STDOUT,
                text=True,
                env=env,
            ))
    try:
        # signal only after the guard is installed and training is underway
        # (the first end-of-epoch log line); before that, default SIGTERM
        # disposition would kill the process
        log = job / "result.log"
        deadline = time.time() + 300
        while time.time() < deadline:
            if log.exists() and "epoch 1:" in log.read_text():
                break
            if any(p.poll() is not None for p in procs):
                outs = [p.read_text() for p in out_paths]
                raise AssertionError(f"worker died early:\n{outs}")
            time.sleep(1.0)
        else:
            raise AssertionError("training never reached epoch 1")
        procs[1].send_signal(signal.SIGTERM)  # the NON-chief process only
        for p, path in zip(procs, out_paths):
            p.wait(timeout=300)
            assert p.returncode == 0, path.read_text()
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    text = log.read_text()
    assert "preempted at epoch" in text  # chief logged the synchronized stop
    assert (job / "ckpt").exists()
    assert (job / "weights" / "models.npz").exists()
