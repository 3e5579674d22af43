"""Training loop.

Capability parity with the reference trainer (src/training/trainer.py:22-465):
optimizer/scheduler factories, label-smoothed CE with PAD ignore, gradient
clipping, per-epoch validation with greedy decode + caption metrics,
best-by-BLEU-4 checkpointing, early stopping (patience 10), periodic saves,
TensorBoard/W&B logging (both optional), resume, and a
``training_results.json`` dump.

TPU-native design:

* the whole optimization step — forward, backward, global-norm clip,
  optimizer update — is ONE jitted function with donated (params,
  opt_state); the reference's per-batch host sync (``loss.item()``,
  trainer.py:240) becomes an async device scalar fetched lazily,
* data parallelism is sharding, not code: batches are placed with a
  ``P('data')`` sharding over the mesh and XLA inserts the gradient psum
  over ICI (params follow :mod:`..parallel.sharding` rules; with a 1-chip
  mesh everything degenerates to local execution),
* validation greedy decode runs fully on device (``lax.while_loop``),
* optional bf16 compute policy: fp32 master params cast to bf16 inside the
  loss; reductions stay fp32,
* optional ``jax.profiler`` trace of the first training steps
  (``experiment.profile_dir``).

Reference defects fixed (documented): best-score fallback compared loss
with ``>`` (trainer.py:382-383 — higher-loss-is-better); ``val_metrics``
possibly unbound when ``val_every_n_epochs > 1`` (trainer.py:410,420);
history only appended on the validation path (trainer.py:405-406).
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..data.pipeline import prefetch_to_device
from ..data.vocabulary import Vocabulary
from ..generation import greedy_generate
from ..models import captioner
from ..parallel import make_mesh, param_shardings, replicated, shard_batch
from ..utils.checkpoint import CheckpointManager, restore_params
from ..utils.metrics import CaptionMetrics
from . import optim
from .losses import label_smoothed_cross_entropy


def _maybe_tensorboard(log_dir: Path):
    # Torch-free (CLAUDE.md invariant): tensorboardX when installed, else a
    # dependency-free raw event-file writer — TB logging never silently
    # vanishes on torch-free installs.
    try:
        from ..utils.tb_writer import create_summary_writer

        return create_summary_writer(log_dir)
    except Exception:
        return None


class VideoCaptioningTrainer:
    """Orchestrates jitted training over a device mesh."""

    def __init__(
        self,
        params,
        config: Config,
        vocabulary: Vocabulary,
        train_loader,
        val_loader,
        mesh=None,
    ):
        self.config = config
        self.vocabulary = vocabulary
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.logger = logging.getLogger(__name__)

        self.mesh = mesh if mesh is not None else make_mesh(config)
        data_size = self.mesh.shape["data"]
        if config.training.batch_size % data_size != 0:
            raise ValueError(
                f"batch_size={config.training.batch_size} must be divisible "
                f"by the data mesh axis ({data_size} devices); adjust "
                "batch_size or pass a smaller mesh"
            )

        # Optimizer (optionally with the encoder subtree frozen)
        frozen = ("encoder",) if config.training.freeze_encoder else ()
        self.tx = optim.build_optimizer(config, frozen_prefixes=frozen)

        # Place params per sharding rules, init opt state on-device so its
        # moments inherit the param shardings.
        shardings = param_shardings(self.mesh, params)
        self.params = jax.tree_util.tree_map(jax.device_put, params, shardings)
        self.opt_state = jax.jit(self.tx.init)(self.params)

        # Parameter EMA (training.ema_decay): a second tree that shadows
        # the raw params; validation/export read it (production-standard
        # weight averaging — absent in the reference).
        self.ema_params = None
        if config.training.ema_decay > 0.0:
            self.ema_params = self._copy_tree(self.params)

        self.metrics = CaptionMetrics(vocabulary)
        self.checkpoint_manager = CheckpointManager(config.experiment.checkpoint_dir)
        self.orbax_manager = None
        if config.experiment.checkpoint_backend == "orbax":
            from ..utils.orbax_ckpt import OrbaxCheckpointManager

            self.orbax_manager = OrbaxCheckpointManager(
                Path(config.experiment.checkpoint_dir) / "orbax"
            )

        self.tensorboard_writer = None
        if config.experiment.use_tensorboard:
            self.tensorboard_writer = _maybe_tensorboard(
                Path(config.experiment.checkpoint_dir) / "tensorboard"
            )
        self.use_wandb = config.experiment.use_wandb
        self._wandb = None
        if self.use_wandb:
            try:
                import wandb

                wandb.init(
                    project=config.experiment.project_name,
                    name=config.experiment.experiment_name,
                    config=config.to_dict(),
                )
                self._wandb = wandb
            except Exception as e:
                self.logger.warning(f"wandb unavailable: {e}")
                self.use_wandb = False

        # Scheduler
        self.plateau = None
        if config.training.scheduler.lower() == "plateau":
            self.plateau = optim.PlateauScheduler(lr=config.training.learning_rate)

        # Training state
        self.current_epoch = 0
        self.global_step = 0
        self.best_val_score = -float("inf")
        # Host-side snapshot of the best-validation-epoch eval params,
        # kept under the orbax backend (which writes no best_model.pth;
        # the retention window may also GC the best epoch). A host COPY,
        # never a reference — self.params/ema buffers get donated later.
        self.best_eval_params = None
        self.patience_counter = 0
        self.train_history = []
        self.val_history = []

        self._rng = jax.random.PRNGKey(config.training.seed)
        self._build_steps()

    # ----------------------------------------------------------- jitted

    def _build_steps(self) -> None:
        config = self.config
        tx = self.tx
        pad_idx = self.vocabulary.pad_idx
        ls = config.training.label_smoothing
        compute_dtype = (
            jnp.bfloat16
            if config.training.compute_dtype == "bfloat16"
            else jnp.float32
        )

        def cast(tree):
            if compute_dtype == jnp.float32:
                return tree
            return jax.tree_util.tree_map(
                lambda x: x.astype(compute_dtype)
                if x.dtype == jnp.float32
                else x,
                tree,
            )

        def loss_fn(params, batch, rng):
            out = captioner.apply_model(
                cast(params),
                config,
                batch["video_features"].astype(compute_dtype),
                batch["input_tokens"],
                train=True,
                rng=rng,
            )
            return label_smoothed_cross_entropy(
                out["logits"], batch["target_tokens"], pad_idx, ls
            )

        accum = config.training.grad_accum_steps

        def train_step(params, opt_state, batch, rng):
            if accum > 1:
                # Micro-batch the loader batch inside the jitted step:
                # lax.scan over (accum, B/accum, ...) slices, mean the
                # gradients, ONE optimizer update. Residency per
                # micro-step shrinks by accum while the update sees the
                # full effective batch.
                micro = jax.tree_util.tree_map(
                    lambda x: x.reshape(
                        (accum, x.shape[0] // accum) + x.shape[1:]
                    ),
                    batch,
                )

                def body(carry, inp):
                    g_acc, l_acc, i = carry
                    mb = inp
                    l, g = jax.value_and_grad(loss_fn)(
                        params, mb, jax.random.fold_in(rng, i)
                    )
                    g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                    return (g_acc, l_acc + l, i + 1), None

                zeros = jax.tree_util.tree_map(
                    lambda p: jnp.zeros(p.shape, jnp.float32), params
                )
                (g_sum, l_sum, _), _ = jax.lax.scan(
                    body, (zeros, jnp.float32(0.0), jnp.int32(0)), micro
                )
                inv = jnp.float32(1.0 / accum)
                grads = jax.tree_util.tree_map(lambda g: g * inv, g_sum)
                loss = l_sum * inv
            else:
                loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
            updates, new_opt_state = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_opt_state, loss

        donate = (0, 1) if config.training.donate_state else ()
        self._train_step = jax.jit(train_step, donate_argnums=donate)

        ema_decay = config.training.ema_decay
        if ema_decay > 0.0:

            def train_step_ema(params, opt_state, ema, batch, rng, step):
                new_params, new_opt_state, loss = train_step(
                    params, opt_state, batch, rng
                )
                # Decay warmup d_t = min(d, (1+t)/(10+t)): the shadow starts
                # from init params, so a flat d=0.999 would keep validation /
                # best-selection on near-init weights for ~1/(1-d) steps.
                # The ramp makes the early EMA an average of *recent* params
                # and converges to the configured decay.
                t = step.astype(jnp.float32)
                d = jnp.minimum(jnp.float32(ema_decay), (1.0 + t) / (10.0 + t))
                new_ema = jax.tree_util.tree_map(
                    lambda e, p: (
                        e * d + p.astype(jnp.float32) * (1.0 - d)
                    ).astype(e.dtype),
                    ema,
                    new_params,
                )
                return new_params, new_opt_state, new_ema, loss

            self._train_step_ema = jax.jit(
                train_step_ema,
                donate_argnums=(0, 1, 2) if config.training.donate_state else (),
            )

        def eval_loss(params, batch):
            out = captioner.apply_model(
                cast(params),
                config,
                batch["video_features"].astype(compute_dtype),
                batch["input_tokens"],
                train=False,
            )
            return label_smoothed_cross_entropy(
                out["logits"], batch["target_tokens"], pad_idx, ls
            )

        self._eval_loss = jax.jit(eval_loss)

        start_idx = self.vocabulary.start_idx
        end_idx = self.vocabulary.end_idx
        max_len = config.model.max_sequence_length

        def gen_step(params, features):
            cp = cast(params)
            enc_outs, final, mask = captioner.encode(
                cp, config, features.astype(compute_dtype)
            )
            return greedy_generate(
                cp, config, enc_outs, final, start_idx, end_idx, max_len, mask,
            )["generated_tokens"]

        self._generate = jax.jit(gen_step)

    # ------------------------------------------------------------ epoch

    def train_epoch(self) -> Dict[str, float]:
        total_loss = 0.0
        num_batches = len(self.train_loader)
        self.train_loader.set_epoch(self.current_epoch)

        profiling = (
            self.config.experiment.profile_dir is not None
            and self.current_epoch == 0
        )
        if profiling:
            jax.profiler.start_trace(str(self.config.experiment.profile_dir))

        pending_loss = None
        bad_steps = 0
        max_bad = self.config.training.max_bad_steps
        # Overlap host→device transfer of batch N+1 with step N.
        device_batches = prefetch_to_device(
            iter(self.train_loader), self._place, lookahead=1
        )
        for batch_idx, device_batch in enumerate(device_batches):
            self._rng, step_rng = jax.random.split(self._rng)
            if self.ema_params is not None:
                (
                    self.params,
                    self.opt_state,
                    self.ema_params,
                    loss,
                ) = self._train_step_ema(
                    self.params, self.opt_state, self.ema_params,
                    device_batch, step_rng,
                    jnp.int32(self.global_step + 1),
                )
            else:
                self.params, self.opt_state, loss = self._train_step(
                    self.params, self.opt_state, device_batch, step_rng
                )
            self.global_step += 1

            if profiling and batch_idx == 4:
                jax.block_until_ready(loss)
                jax.profiler.stop_trace()
                profiling = False

            # Lazy host sync: log the *previous* step's loss so the device
            # queue never drains (the reference syncs every step).
            if pending_loss is not None:
                loss_val = float(pending_loss)
                total_loss += loss_val
                # Failure detection (absent in the reference, SURVEY §5):
                # abort on persistent non-finite loss instead of silently
                # training garbage.
                if not np.isfinite(loss_val):
                    bad_steps += 1
                    if max_bad and bad_steps >= max_bad:
                        raise RuntimeError(
                            f"Non-finite loss for {bad_steps} consecutive "
                            f"steps at global step {self.global_step}"
                        )
                else:
                    bad_steps = 0
            pending_loss = loss

            if batch_idx % self.config.experiment.log_every_n_steps == 0:
                loss_val = float(loss)
                lr = optim.get_learning_rate(self.opt_state)
                self.logger.info(
                    f"Epoch {self.current_epoch}, Batch {batch_idx}/{num_batches}, "
                    f"Loss: {loss_val:.4f}, LR: {lr:.6f}"
                )
                if self.tensorboard_writer:
                    self.tensorboard_writer.add_scalar(
                        "Train/BatchLoss", loss_val, self.global_step
                    )
                    self.tensorboard_writer.add_scalar(
                        "Train/LearningRate", lr, self.global_step
                    )
                if self.use_wandb:
                    self._wandb.log(
                        {
                            "train/batch_loss": loss_val,
                            "train/learning_rate": lr,
                            "global_step": self.global_step,
                        }
                    )
        if profiling:
            jax.profiler.stop_trace()
        if pending_loss is not None:
            total_loss += float(pending_loss)

        avg = total_loss / max(num_batches, 1)
        return {"loss": avg}

    @property
    def eval_params(self):
        """Parameters used for validation/export: the EMA shadow when
        ``training.ema_decay`` is on, the raw params otherwise."""
        return self.ema_params if self.ema_params is not None else self.params

    def validate_epoch(self) -> Dict[str, float]:
        total_loss = 0.0
        count = 0
        all_predictions = []
        all_references = []
        eval_params = self.eval_params

        for batch in self.val_loader:
            n = batch["video_features"].shape[0]
            padded = self._pad_batch(batch)
            device_batch = self._place(padded)
            loss = self._eval_loss(eval_params, device_batch)
            total_loss += float(loss)
            count += 1

            tokens = self._generate(eval_params, device_batch["video_features"])
            tokens = np.asarray(tokens)[:n]
            all_predictions.extend(
                self.vocabulary.decode_caption(seq.tolist()) for seq in tokens
            )
            all_references.extend(
                self.vocabulary.decode_caption(np.asarray(t).tolist())
                for t in padded["target_tokens"][:n]
            )

        avg_loss = total_loss / max(count, 1)
        scores = self.metrics.compute_metrics(all_predictions, all_references)
        return {"loss": avg_loss, **scores}

    # ------------------------------------------------------------- main

    def train(self) -> Dict[str, Any]:
        self.logger.info("Starting training...")
        self.logger.info(
            f"Model has {captioner.count_params(self.params):,} trainable parameters"
        )
        start_time = time.time()
        val_metrics: Dict[str, float] = {}
        start_epoch = self.current_epoch

        last_val_epoch = -1
        for epoch in range(start_epoch, self.config.training.num_epochs):
            self.current_epoch = epoch
            train_metrics = self.train_epoch()
            # Every epoch is recorded, including non-validation and
            # early-stop epochs (finishes fixing reference trainer.py:405-406
            # where history only grew on the validation path).
            self.train_history.append({"epoch": epoch, **train_metrics})

            stop = False
            if epoch % self.config.training.val_every_n_epochs == 0:
                val_metrics = self.validate_epoch()
                last_val_epoch = epoch
                self.val_history.append({"epoch": epoch, **val_metrics})
                self.logger.info(
                    f"Epoch {epoch}: Train Loss: {train_metrics['loss']:.4f}, "
                    f"Val Loss: {val_metrics['loss']:.4f}, "
                    f"Val BLEU-4: {val_metrics.get('bleu_4', 0):.4f}"
                )
                self._log_epoch(epoch, train_metrics, val_metrics)

                # Best-model selection: BLEU-4 when available, else negative
                # loss (fixes reference trainer.py:382-383 which compared a
                # loss fallback with ``>``).
                current_score = val_metrics.get("bleu_4", -val_metrics["loss"])
                if current_score > self.best_val_score:
                    self.best_val_score = current_score
                    self.patience_counter = 0
                    self._save(epoch, val_metrics, is_best=True)
                else:
                    self.patience_counter += 1

                if self.patience_counter >= self.config.training.early_stopping_patience:
                    self.logger.info(f"Early stopping at epoch {epoch}")
                    stop = True

            if stop:
                break

            self._scheduler_step(epoch, val_metrics)

            if epoch % self.config.training.save_every_n_epochs == 0:
                # Periodic saves carry this epoch's train loss; validation
                # metrics are included only with the epoch they came from
                # (previously {} or silently stale when val_every_n > 1).
                save_metrics = {"train_loss": train_metrics["loss"]}
                if last_val_epoch >= 0:
                    save_metrics.update(val_metrics)
                    save_metrics["val_epoch"] = last_val_epoch
                self._save(epoch, save_metrics, is_best=False)

        total_time = time.time() - start_time
        self.logger.info(f"Training completed in {total_time:.2f} seconds")

        results = {
            "best_val_score": self.best_val_score,
            "total_epochs": self.current_epoch + 1,
            "total_time": total_time,
            "train_history": self.train_history,
            "val_history": self.val_history,
        }
        results_file = Path(self.config.experiment.checkpoint_dir) / "training_results.json"
        with open(results_file, "w") as f:
            json.dump(results, f, indent=2)

        if self.orbax_manager is not None:
            self.orbax_manager.wait()
        if self.tensorboard_writer:
            self.tensorboard_writer.close()
        if self.use_wandb:
            self._wandb.finish()
        return results

    # ---------------------------------------------------------- helpers

    def _copy_tree(self, tree):
        """Materialize an independent on-device copy. (``device_put`` can
        alias; a later donated step would free the shared buffers.)"""
        return jax.jit(lambda t: jax.tree_util.tree_map(lambda x: x + 0, t))(tree)

    def _place(self, batch: dict) -> dict:
        arrays = {
            k: v
            for k, v in batch.items()
            if isinstance(v, np.ndarray)
        }
        if self.config.training.compute_dtype == "bfloat16":
            # Cast features on the host so the host→device transfer ships
            # half the bytes; the train step would cast on-device anyway.
            import ml_dtypes

            arrays["video_features"] = arrays["video_features"].astype(
                ml_dtypes.bfloat16
            )
        return shard_batch(self.mesh, arrays)

    def _pad_batch(self, batch: dict) -> dict:
        """Pad a ragged final batch up to batch_size (static shapes under
        jit; extras masked out by the caller)."""
        B = batch["video_features"].shape[0]
        target = self.config.training.batch_size
        if B == target:
            return batch
        out = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray):
                pad_width = [(0, target - B)] + [(0, 0)] * (v.ndim - 1)
                out[k] = np.pad(v, pad_width)
            else:
                out[k] = v
        return out

    def _scheduler_step(self, epoch: int, val_metrics: Dict[str, float]) -> None:
        sched = self.config.training.scheduler.lower()
        if sched in ("cosine", "step"):
            lr = optim.lr_at_epoch(self.config, epoch + 1)
            self.opt_state = optim.set_learning_rate(self.opt_state, lr)
        elif sched == "plateau" and self.plateau is not None:
            metric = val_metrics.get("bleu_4", -val_metrics.get("loss", 0.0))
            lr = self.plateau.step(metric)
            self.opt_state = optim.set_learning_rate(self.opt_state, lr)

    def _log_epoch(self, epoch, train_metrics, val_metrics) -> None:
        if self.tensorboard_writer:
            self.tensorboard_writer.add_scalar(
                "Train/EpochLoss", train_metrics["loss"], epoch
            )
            self.tensorboard_writer.add_scalar(
                "Val/EpochLoss", val_metrics["loss"], epoch
            )
            for name, value in val_metrics.items():
                if name != "loss":
                    self.tensorboard_writer.add_scalar(f"Val/{name}", value, epoch)
        if self.use_wandb:
            self._wandb.log(
                {
                    "train/epoch_loss": train_metrics["loss"],
                    "val/epoch_loss": val_metrics["loss"],
                    **{f"val/{k}": v for k, v in val_metrics.items() if k != "loss"},
                    "epoch": epoch,
                }
            )

    def _opt_state_fingerprint(self, opt_state) -> int:
        """CRC of the optax state's pytree structure + leaf shapes/dtypes.
        Restoring into a differently-configured optimizer (e.g. a changed
        ``freeze_encoder`` or optimizer type) silently misassigns moments
        when only flat leaves are compared — the fingerprint turns that
        into a loud error."""
        import zlib

        leaves, treedef = jax.tree_util.tree_flatten(opt_state)
        desc = str(treedef) + "|" + ";".join(
            f"{getattr(x, 'shape', ())}:{getattr(x, 'dtype', type(x).__name__)}"
            for x in leaves
        )
        return zlib.crc32(desc.encode())

    def _save(self, epoch: int, metrics: Dict[str, float], is_best: bool) -> None:
        if self.orbax_manager is not None:
            if is_best:
                self.best_eval_params = jax.tree_util.tree_map(
                    np.asarray, self.eval_params
                )
            # Async sharded save; training continues while it lands.
            self.orbax_manager.save(
                epoch, self.params, self.opt_state, metrics=metrics,
                extra={
                    "global_step": self.global_step,
                    "best_val_score": self.best_val_score,
                    "opt_state_fingerprint": self._opt_state_fingerprint(
                        self.opt_state
                    ),
                },
                ema_params=self.ema_params,
            )
            return
        additional = {
            "global_step": self.global_step,
            "best_val_score": self.best_val_score,
        }
        if self.ema_params is not None:
            from ..utils.checkpoint import _to_numpy_tree

            additional["ema_state_dict"] = _to_numpy_tree(self.ema_params)
        self.checkpoint_manager.save_checkpoint(
            self.params,
            self.opt_state,
            epoch,
            metrics,
            scheduler_state=self.plateau.state_dict() if self.plateau else None,
            config=self.config,
            is_best=is_best,
            additional_info=additional,
            # Best-model selection is scored on the EMA shadow, so the
            # best_model.pth a consumer loads must hold those weights
            # (raw params stay under raw_model_state_dict for resume).
            best_model_state=self.ema_params,
        )

    def load_orbax_checkpoint(self, epoch: Optional[int] = None) -> None:
        """Resume from the orbax backend (latest epoch by default)."""
        if self.orbax_manager is None:
            raise RuntimeError("orbax backend not enabled")
        restored = self.orbax_manager.restore(epoch)
        shardings = param_shardings(self.mesh, restored["params"])
        self.params = jax.tree_util.tree_map(
            jax.device_put, restored["params"], shardings
        )
        if self.config.training.ema_decay > 0.0:
            if "ema_params" in restored:
                self.ema_params = jax.tree_util.tree_map(
                    jax.device_put, restored["ema_params"], shardings
                )
            else:
                self.ema_params = self._copy_tree(self.params)
        # opt_state comes back as a plain dict pytree; rebuild the typed
        # optax state by initializing and overwriting leaf values. This is
        # only sound when the current optimizer config matches save time —
        # validate before unflattening instead of silently misassigning.
        typed = jax.jit(self.tx.init)(self.params)
        flat_vals = jax.tree_util.tree_leaves(restored["opt_state"])
        typed_leaves, treedef = jax.tree_util.tree_flatten(typed)
        saved_fp = restored["meta"].get("opt_state_fingerprint")
        if saved_fp is not None:
            current_fp = self._opt_state_fingerprint(typed)
            if int(saved_fp) != current_fp:
                raise ValueError(
                    "Orbax checkpoint was saved with a different optimizer "
                    "configuration (opt_state fingerprint mismatch) — e.g. "
                    "optimizer type, freeze_encoder, or model shape changed. "
                    "Resume with the training config used at save time."
                )
        if len(flat_vals) != len(typed_leaves) or any(
            getattr(s, "shape", None) != getattr(t, "shape", None)
            for s, t in zip(flat_vals, typed_leaves)
        ):
            raise ValueError(
                "Restored optimizer state does not match the current "
                f"optimizer ({len(flat_vals)} vs {len(typed_leaves)} leaves "
                "or shape mismatch) — the optimizer config differs from "
                "save time."
            )
        self.opt_state = jax.tree_util.tree_unflatten(
            treedef, [jax.device_put(v) for v in flat_vals]
        )
        self.current_epoch = int(restored["meta"]["epoch"])
        self.global_step = int(restored["meta"]["global_step"])
        self.best_val_score = float(restored["meta"]["best_val_score"])
        self.logger.info(f"Loaded orbax checkpoint from epoch {self.current_epoch}")

    def load_checkpoint(self, checkpoint_path: Path) -> Dict[str, Any]:
        """Resume training state (parity: reference trainer.py:449-465)."""
        checkpoint = self.checkpoint_manager.load_checkpoint(checkpoint_path)
        # best_model.pth stores the EMA shadow as its primary
        # model_state_dict; the raw training params live under
        # raw_model_state_dict — prefer those for resume.
        params = restore_params(
            checkpoint.get("raw_model_state_dict", checkpoint["model_state_dict"])
        )
        shardings = param_shardings(self.mesh, params)
        self.params = jax.tree_util.tree_map(jax.device_put, params, shardings)
        self.opt_state = jax.device_put(
            restore_params(checkpoint["optimizer_state_dict"])
        )
        if self.plateau is not None and "scheduler_state_dict" in checkpoint:
            self.plateau.load_state_dict(checkpoint["scheduler_state_dict"])
        if self.config.training.ema_decay > 0.0:
            if "ema_state_dict" in checkpoint:
                ema = restore_params(checkpoint["ema_state_dict"])
                self.ema_params = jax.tree_util.tree_map(
                    jax.device_put, ema, shardings
                )
            else:
                # Checkpoint predates EMA being enabled: restart the
                # average from the restored raw params.
                self.ema_params = self._copy_tree(self.params)
        self.current_epoch = checkpoint["epoch"]
        self.global_step = checkpoint.get("global_step", 0)
        self.best_val_score = checkpoint.get("best_val_score", -float("inf"))
        self.logger.info(f"Loaded checkpoint from epoch {self.current_epoch}")
        return checkpoint
