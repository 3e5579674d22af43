"""Multi-process (multi-host) DP dryrun (parallel/multihost.py).

Every other multi-device gate in this suite is single-process
virtual-device; this one launches REAL ``jax.distributed`` worker
processes (gloo CPU collectives) and checks the things only a process
boundary can break: global-vs-local device indexing, per-host batch
assembly, gradient psum across processes, checkpoint-on-process-0, and
bit-identical loss vs a single-process replay of the same global batch.
SURVEY §2 "multi-host feeding over DCN with per-host dataset shards".
"""

import json
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_dryrun_multihost_two_processes(tmp_path):
    # The launcher spawns its own fresh subprocesses with prepared env, so
    # it is safe to call from within this (already-jax-initialized) process.
    from video_captioning_tpu.parallel.multihost import dryrun_multihost

    report = dryrun_multihost(
        num_processes=2, devices_per_process=2, workdir=tmp_path,
        rows_per_process=4,
    )
    assert report["ok"]
    assert report["global_devices"] == 4
    # Bit-identical loss across the process boundary AND vs the replay.
    assert report["loss"] == report["replay_loss"]
    # Per-host shards are disjoint and cover all 8 rows.
    assert sorted(report["rows"]) == [f"clip{i:03d}" for i in range(8)]
    # Chief-only checkpoint landed.
    assert (tmp_path / "ckpt" / "checkpoint_epoch_0000.pth").exists()
    assert (tmp_path / "ckpt" / "latest_checkpoint.pth").exists()


@pytest.mark.slow
def test_multihost_worker_refuses_unprepared_env(tmp_path):
    """The worker entry hard-fails without the launcher's env contract
    rather than silently initializing a wrong-size backend."""
    result = subprocess.run(
        [sys.executable, "-m", "video_captioning_tpu.parallel.multihost",
         "--worker", "--process-id", "0", "--num-processes", "1",
         "--coordinator", "127.0.0.1:1", "--workdir", str(tmp_path)],
        capture_output=True, text=True, timeout=120,
        env={"PATH": "/usr/bin:/bin", "PYTHONPATH": "/root/repo"},
    )
    assert result.returncode != 0
    assert "launched by dryrun_multihost" in (result.stderr + result.stdout)
