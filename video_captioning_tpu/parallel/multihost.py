"""Multi-process (multi-host) data-parallel dryrun.

SURVEY §2 plans "multi-host feeding over DCN with per-host dataset
shards". Every other multi-device artifact in this repo is single-process
virtual-device (the dryrun, trainer mesh e2e, mesh serving), which cannot
catch process-count bugs: global-vs-local device indexing, per-host batch
math, checkpoint-on-process-0. This module executes the plan as an ACTUAL
multi-process SPMD program — the same launch shape as N TPU hosts, with
gloo CPU collectives standing in for ICI/DCN:

* N ``jax.distributed``-initialized worker processes, each with K local
  virtual CPU devices (global mesh = N·K devices);
* the real per-host-sharded ``data.pipeline.DataLoader``
  (``shard_index=process_index, num_shards=process_count``) feeding each
  process ONLY its disjoint rows;
* ``jax.make_array_from_process_local_data`` assembling the global batch
  (host-local shard → its slice of the global ``data``-sharded array);
* ONE jitted DP train step whose gradient psum crosses the process
  boundary, loss replicated back to every process;
* a checkpoint written by process 0 only (the multi-host discipline
  ``utils/checkpoint.py`` consumers must follow).

The launcher then replays the IDENTICAL global batch single-process on an
equal-size virtual mesh and demands bit-identical loss — the reduction
tree is the same, only the process boundary differs, so any divergence is
a multi-process bug, not noise.

No reference analog: the reference is strictly single-process
(SURVEY §2 "Distributed comm backend: none").
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

_WORKER_ENV_READY = "_VCT_MULTIHOST_WORKER"


# --------------------------------------------------------------------------
# Worker (runs in a fresh subprocess; env prepared by the launcher)
# --------------------------------------------------------------------------


def _build_dataset(workdir: Path, n_rows: int, feat_dim: int, frames: int):
    """Synthetic features + CSV, deterministic. Built ONCE by the launcher
    before any worker spawns (workers only read the shared ``workdir``)."""
    import numpy as np
    import pandas as pd

    feat_dir = workdir / "features"
    feat_dir.mkdir(parents=True, exist_ok=True)
    words = ["man", "dog", "cat", "rides", "runs", "sits", "horse", "park"]
    rows = []
    rs = np.random.RandomState(7)
    for i in range(n_rows):
        path = feat_dir / f"clip{i:03d}.npy"
        if not path.exists():
            np.save(path, rs.randn(frames, feat_dim).astype(np.float32))
        else:
            rs.randn(frames, feat_dim)  # keep the stream aligned
        caption = " ".join(words[(i + j) % len(words)] for j in range(4))
        rows.append({
            "video_id": f"clip{i:03d}",
            "video_path": f"clip{i:03d}.mp4",
            "feature_path": str(path),
            "caption": caption,
        })
    csv_path = workdir / "dataset.csv"
    if not csv_path.exists():
        pd.DataFrame(rows).to_csv(csv_path, index=False)
    return csv_path


def _tiny_config(feat_dim: int, frames: int):
    from ..config import Config

    config = Config()
    config.model.cnn_feature_dim = feat_dim
    config.model.encoder_hidden_dim = 16
    config.model.decoder_hidden_dim = 16
    config.model.embedding_dim = 12
    config.model.attention_dim = 16
    config.model.max_sequence_length = 6
    config.model.video_sequence_length = frames
    config.data.frames_per_video = frames
    config.data.vocab_threshold = 1
    config.validate()
    return config


def _global_step(config, mesh, global_batch, checkpoint_dir=None,
                 is_chief=True):
    """Init replicated params ON the mesh, run one jitted DP train step,
    return the (replicated) loss as a float. Shared by the worker and the
    launcher's single-process replay so the programs are identical."""
    import jax
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..models import captioner
    from ..training import losses, optim

    replicated = NamedSharding(mesh, P())
    vocab_size = config.model.vocab_size

    # Functional init under jit with replicated out-shardings: identical on
    # every process, and never materialized host-side (the multi-host-safe
    # way to place params — a host-side device_put of non-addressable
    # shards would fail).
    params = jax.jit(
        lambda: captioner.init_model(jax.random.PRNGKey(0), config, vocab_size),
        out_shardings=replicated,
    )()

    tx = optim.build_optimizer(config)
    opt_state = jax.jit(tx.init, out_shardings=replicated)(params)

    def train_step(params, opt_state, batch):
        def loss_fn(p):
            out = captioner.apply_model(
                p, config, batch["video_features"], batch["input_tokens"]
            )
            return losses.label_smoothed_cross_entropy(
                out["logits"], batch["target_tokens"], 0,
                config.training.label_smoothing,
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt_state, loss

    step = jax.jit(train_step, donate_argnums=(0, 1),
                   out_shardings=(replicated, replicated, replicated))
    params, opt_state, loss = step(params, opt_state, global_batch)
    loss_val = float(loss)  # replicated → identical on every process

    if checkpoint_dir is not None and is_chief:
        # Checkpoint-on-process-0: fully-replicated arrays are host-
        # readable on every process, but only the chief writes.
        from ..utils.checkpoint import CheckpointManager

        CheckpointManager(checkpoint_dir).save_checkpoint(
            params, opt_state, epoch=0, metrics={"loss": loss_val},
            config=config,
        )
    return loss_val


def _assemble_global_batch(mesh, local_batch, num_processes, local_rows):
    """Per-process local rows → global data-sharded arrays."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    return {
        k: jax.make_array_from_process_local_data(sharding, local_batch[k])
        for k in ("video_features", "input_tokens", "target_tokens")
    }


def _worker_main(argv) -> None:
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--process-id", type=int, required=True)
    parser.add_argument("--num-processes", type=int, required=True)
    parser.add_argument("--coordinator", type=str, required=True)
    parser.add_argument("--workdir", type=str, required=True)
    parser.add_argument("--rows-per-process", type=int, default=4)
    args = parser.parse_args(argv)

    assert os.environ.get(_WORKER_ENV_READY) == "1", (
        "worker must be launched by dryrun_multihost (env not prepared)"
    )

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    import numpy as np
    from jax.sharding import Mesh

    from ..data.pipeline import DataLoader, VideoCaptioningDataset
    from ..data.vocabulary import build_vocabulary_from_csv

    workdir = Path(args.workdir)
    feat_dim, frames = 32, 10
    csv_path = workdir / "dataset.csv"
    assert csv_path.exists(), (
        "launcher must build the dataset before spawning workers "
        "(concurrent workers would race on the feature files)"
    )
    config = _tiny_config(feat_dim, frames)

    import pandas as pd

    vocab = build_vocabulary_from_csv(csv_path, config)
    config.data.max_vocab_size = len(vocab)
    config.validate()
    df = pd.read_csv(csv_path)

    # The real per-host input sharding: this process loads ONLY its rows.
    dataset = VideoCaptioningDataset(df, vocab, config)
    loader = DataLoader(
        dataset,
        batch_size=args.rows_per_process,
        shuffle=True,
        seed=42,
        drop_last=True,
        num_workers=2,
        shard_index=jax.process_index(),
        num_shards=jax.process_count(),
    )
    local_batch = next(iter(loader))

    devices = jax.devices()  # GLOBAL device list
    mesh = Mesh(np.asarray(devices).reshape(len(devices), 1),
                ("data", "model"))
    global_batch = _assemble_global_batch(
        mesh, local_batch, args.num_processes, args.rows_per_process
    )

    # Data-coverage fingerprint: replicated sum over the GLOBAL token
    # array — identical on every process, and it only matches the
    # launcher's replay if the shards are disjoint AND complete.
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    token_sum = int(
        jax.jit(lambda t: jnp.sum(t), out_shardings=NamedSharding(mesh, P()))(
            global_batch["target_tokens"]
        )
    )

    loss = _global_step(
        config, mesh, global_batch,
        checkpoint_dir=workdir / "ckpt",
        is_chief=jax.process_index() == 0,
    )

    print(json.dumps({
        "process_id": jax.process_index(),
        "process_count": jax.process_count(),
        "global_devices": len(devices),
        "local_devices": len(jax.local_devices()),
        "loss": loss,
        "token_sum": token_sum,
        "local_rows": [str(v) for v in local_batch["video_id"]],
    }), flush=True)


# --------------------------------------------------------------------------
# Launcher
# --------------------------------------------------------------------------


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def dryrun_multihost(
    num_processes: int = 2,
    devices_per_process: int = 2,
    workdir=None,
    rows_per_process: int = 4,
    timeout: float = 600.0,
) -> dict:
    """Spawn the workers, then replay the identical global batch
    single-process and assert bit-identical loss. Returns a report dict."""
    import tempfile

    workdir = Path(workdir) if workdir else Path(tempfile.mkdtemp(
        prefix="vct_multihost_"))
    workdir.mkdir(parents=True, exist_ok=True)
    _build_dataset(workdir, rows_per_process * num_processes,
                   feat_dim=32, frames=10)
    port = _free_port()
    repo_root = str(Path(__file__).resolve().parents[2])

    procs = []
    for pid in range(num_processes):
        env = dict(os.environ)
        flags = " ".join(
            f for f in env.get("XLA_FLAGS", "").split()
            if "host_platform_device_count" not in f
        )
        env["XLA_FLAGS"] = (
            flags +
            f" --xla_force_host_platform_device_count={devices_per_process}"
        ).strip()
        env["JAX_PLATFORMS"] = "cpu"
        env[_WORKER_ENV_READY] = "1"
        env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(subprocess.Popen(
            [
                sys.executable, "-m",
                "video_captioning_tpu.parallel.multihost",
                "--worker",
                "--process-id", str(pid),
                "--num-processes", str(num_processes),
                "--coordinator", f"127.0.0.1:{port}",
                "--workdir", str(workdir),
                "--rows-per-process", str(rows_per_process),
            ],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        ))

    reports = []
    for pid, proc in enumerate(procs):
        try:
            out, err = proc.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            raise RuntimeError(f"multihost worker {pid} timed out")
        if proc.returncode != 0:
            raise RuntimeError(
                f"multihost worker {pid} failed (rc={proc.returncode}):\n"
                f"{out}\n{err}"
            )
        last = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
        reports.append(json.loads(last))

    losses = [r["loss"] for r in reports]
    token_sums = [r["token_sum"] for r in reports]
    assert len(set(losses)) == 1, f"losses diverged across processes: {losses}"
    assert len(set(token_sums)) == 1, (
        f"global batch diverged across processes: {token_sums}"
    )
    all_rows = [v for r in sorted(reports, key=lambda r: r["process_id"])
                for v in r["local_rows"]]
    assert len(set(all_rows)) == len(all_rows), (
        f"per-host shards overlap: {all_rows}"
    )
    ckpt = workdir / "ckpt" / "checkpoint_epoch_0000.pth"
    assert ckpt.exists(), "process 0 did not write the checkpoint"

    # Single-process replay of the IDENTICAL global batch (same shard
    # split, same global row order = process-major) on an equal-size
    # virtual mesh → the loss must match bit for bit.
    replay = _single_process_replay(
        workdir, num_processes, devices_per_process, rows_per_process
    )
    assert replay["token_sum"] == token_sums[0], (
        f"replay saw a different global batch: {replay['token_sum']} "
        f"vs {token_sums[0]} — per-host sharding is broken"
    )
    assert replay["loss"] == losses[0], (
        f"multi-process loss {losses[0]!r} != single-process replay "
        f"{replay['loss']!r}"
    )

    report = {
        "ok": True,
        "num_processes": num_processes,
        "devices_per_process": devices_per_process,
        "global_devices": reports[0]["global_devices"],
        "loss": losses[0],
        "replay_loss": replay["loss"],
        "token_sum": token_sums[0],
        "checkpoint": str(ckpt),
        "rows": all_rows,
    }
    print(f"dryrun_multihost OK: {num_processes} procs x "
          f"{devices_per_process} devices, loss={losses[0]:.6f} "
          f"(single-process replay identical)")
    return report


def _single_process_replay(workdir, num_shards, devices_per_process,
                           rows_per_process) -> dict:
    """Run the same global program in ONE subprocess with
    num_shards·devices_per_process virtual devices, assembling the global
    batch from the same per-shard loaders in process order."""
    n_devices = num_shards * devices_per_process
    env = dict(os.environ)
    flags = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f
    )
    env["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    env["JAX_PLATFORMS"] = "cpu"
    env[_WORKER_ENV_READY] = "1"
    repo_root = str(Path(__file__).resolve().parents[2])
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    result = subprocess.run(
        [
            sys.executable, "-m",
            "video_captioning_tpu.parallel.multihost",
            "--replay",
            "--num-shards", str(num_shards),
            "--workdir", str(workdir),
            "--rows-per-process", str(rows_per_process),
        ],
        env=env, capture_output=True, text=True, timeout=600,
    )
    if result.returncode != 0:
        raise RuntimeError(
            f"single-process replay failed:\n{result.stdout}\n{result.stderr}"
        )
    last = [ln for ln in result.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(last)


def _replay_main(argv) -> None:
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--num-shards", type=int, required=True)
    parser.add_argument("--workdir", type=str, required=True)
    parser.add_argument("--rows-per-process", type=int, default=4)
    args = parser.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import pandas as pd
    from jax.sharding import Mesh

    from ..data.pipeline import DataLoader, VideoCaptioningDataset
    from ..data.vocabulary import build_vocabulary_from_csv

    workdir = Path(args.workdir)
    feat_dim, frames = 32, 10
    csv_path = workdir / "dataset.csv"
    config = _tiny_config(feat_dim, frames)
    vocab = build_vocabulary_from_csv(csv_path, config)
    config.data.max_vocab_size = len(vocab)
    config.validate()
    df = pd.read_csv(csv_path)
    dataset = VideoCaptioningDataset(df, vocab, config)

    # Same shard split and the multi-process global order: shard 0's rows
    # occupy the first local_rows slots (process-major concatenation).
    shards = []
    for shard in range(args.num_shards):
        loader = DataLoader(
            dataset, batch_size=args.rows_per_process, shuffle=True,
            seed=42, drop_last=True, num_workers=2,
            shard_index=shard, num_shards=args.num_shards,
        )
        shards.append(next(iter(loader)))
    global_batch_np = {
        k: np.concatenate([s[k] for s in shards])
        for k in ("video_features", "input_tokens", "target_tokens")
    }

    devices = jax.devices()
    mesh = Mesh(np.asarray(devices).reshape(len(devices), 1),
                ("data", "model"))
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    global_batch = {
        k: jax.device_put(v, NamedSharding(mesh, P("data")))
        for k, v in global_batch_np.items()
    }
    token_sum = int(
        jax.jit(lambda t: jnp.sum(t), out_shardings=NamedSharding(mesh, P()))(
            global_batch["target_tokens"]
        )
    )
    loss = _global_step(config, mesh, global_batch)
    print(json.dumps({"loss": loss, "token_sum": token_sum}), flush=True)


def main() -> None:
    argv = sys.argv[1:]
    if argv and argv[0] == "--worker":
        _worker_main(argv[1:])
    elif argv and argv[0] == "--replay":
        _replay_main(argv[1:])
    else:
        n = int(argv[0]) if argv else 2
        dryrun_multihost(num_processes=n)


if __name__ == "__main__":
    main()
