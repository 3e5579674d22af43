"""Training CLI (parity: reference src/train.py:22-173).

Same flags and behavior: ``--data-file`` CSV in, vocabulary built-or-loaded
at ``<checkpoint-dir>/vocabulary.json``, sklearn seed-42 splits, resume via
``--resume``, post-training inference-package save, KeyboardInterrupt →
emergency checkpoint. Plus a *working* ``--config`` YAML/JSON loader (the
reference parses the flag but never reads it, train.py:60) and TPU knobs
(``--compute-dtype``, ``--attention-type``).
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

from ..config import Config
from ..utils.logging import setup_logging


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Train video captioning model")
    parser.add_argument("--config", type=str, help="Path to config file (YAML/JSON)")
    parser.add_argument("--data-file", type=str, required=True, help="Path to captions CSV file")
    parser.add_argument("--checkpoint-dir", type=str, default="checkpoints", help="Checkpoint directory")
    parser.add_argument("--resume", type=str, help="Path to checkpoint to resume from")
    parser.add_argument("--batch-size", type=int, help="Batch size override")
    parser.add_argument("--learning-rate", type=float, help="Learning rate override")
    parser.add_argument("--epochs", type=int, help="Number of epochs override")
    parser.add_argument("--device", type=str, help="Platform override (tpu/cpu)")
    parser.add_argument("--log-level", type=str, default="INFO", help="Logging level")
    parser.add_argument("--wandb", action="store_true", help="Use Weights & Biases logging")
    parser.add_argument("--no-tensorboard", action="store_true", help="Disable TensorBoard logging")
    parser.add_argument("--attention-type", type=str, choices=["bahdanau", "luong", "multihead"],
                        help="Attention mechanism override")
    parser.add_argument("--architecture", type=str, choices=["lstm", "transformer"],
                        help="Model family override (default lstm; transformer "
                        "is the TPU-first parallel-teacher-forcing family)")
    parser.add_argument("--compute-dtype", type=str, choices=["float32", "bfloat16"],
                        help="Device compute dtype")
    parser.add_argument("--seed", type=int, help="Random seed override")
    parser.add_argument("--freeze-encoder", action="store_true",
                        help="Freeze the video encoder (train decoder only)")
    parser.add_argument("--checkpoint-backend", type=str,
                        choices=["native", "orbax"],
                        help="Checkpoint backend override")
    parser.add_argument("--profile-dir", type=str, help="Write a jax.profiler trace here")
    parser.add_argument("--grad-accum-steps", type=int,
                        help="Micro-batches per optimizer update "
                        "(batch_size must divide evenly)")
    parser.add_argument("--ema-decay", type=float,
                        help="Parameter EMA decay (e.g. 0.999); validation "
                        "and the exported model use the averaged weights")
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    setup_logging(args.log_level, log_file="training.log")
    logger = logging.getLogger(__name__)

    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)

    config = Config.from_file(Path(args.config)) if args.config else Config()

    if args.batch_size:
        config.training.batch_size = args.batch_size
    if args.learning_rate:
        config.training.learning_rate = args.learning_rate
    if args.epochs:
        config.training.num_epochs = args.epochs
    if args.wandb:
        config.experiment.use_wandb = True
    if args.no_tensorboard:
        config.experiment.use_tensorboard = False
    if args.attention_type:
        config.model.attention_type = args.attention_type
    if args.architecture:
        config.model.architecture = args.architecture
    if args.compute_dtype:
        config.training.compute_dtype = args.compute_dtype
    if args.seed is not None:
        config.training.seed = args.seed
    if args.profile_dir:
        config.experiment.profile_dir = Path(args.profile_dir)
    if args.freeze_encoder:
        config.training.freeze_encoder = True
    if args.checkpoint_backend:
        config.experiment.checkpoint_backend = args.checkpoint_backend
    if args.grad_accum_steps is not None:
        config.training.grad_accum_steps = args.grad_accum_steps
    if args.ema_decay is not None:
        config.training.ema_decay = args.ema_decay

    config.data.captions_file = Path(args.data_file)
    config.experiment.checkpoint_dir = Path(args.checkpoint_dir)
    config.validate()
    config.ensure_dirs()

    from ..utils.compile_cache import maybe_enable_from_config

    maybe_enable_from_config(config)

    import jax

    from ..data.pipeline import create_data_loaders, prepare_data
    from ..data.vocabulary import Vocabulary, build_vocabulary_from_csv
    from ..models import captioner
    from ..training.trainer import VideoCaptioningTrainer
    from ..utils.checkpoint import CheckpointManager

    logger.info(f"Devices: {jax.devices()}")

    logger.info("Preparing data...")
    train_df, val_df, test_df = prepare_data(config)

    vocabulary_path = config.experiment.checkpoint_dir / "vocabulary.json"
    if vocabulary_path.exists():
        logger.info("Loading existing vocabulary...")
        vocabulary = Vocabulary.load(vocabulary_path, config)
    else:
        logger.info("Building new vocabulary...")
        vocabulary = build_vocabulary_from_csv(config.data.captions_file, config, "caption")
        vocabulary.save(vocabulary_path)
    config.model.vocab_size = len(vocabulary)

    logger.info("Creating data loaders...")
    train_loader, val_loader, test_loader = create_data_loaders(
        config, vocabulary, train_df, val_df, test_df,
        shard_index=jax.process_index(), num_shards=jax.process_count(),
    )

    logger.info("Initializing model...")
    params = captioner.init_model(
        jax.random.PRNGKey(config.training.seed), config, len(vocabulary)
    )
    logger.info(f"Model has {captioner.count_params(params):,} trainable parameters")

    trainer = VideoCaptioningTrainer(
        params, config, vocabulary, train_loader, val_loader
    )

    if args.resume:
        logger.info(f"Resuming from checkpoint: {args.resume}")
        trainer.load_checkpoint(Path(args.resume))

    logger.info("Starting training...")
    try:
        results = trainer.train()
        logger.info("Training completed successfully!")
        logger.info(f"Best validation score: {results['best_val_score']:.4f}")

        manager = CheckpointManager(config.experiment.checkpoint_dir)
        # Export the weights that actually earned best_val_score: the best
        # checkpoint's primary model_state_dict (the EMA shadow from the
        # best-validation epoch when training.ema_decay is on — NOT the
        # final-epoch EMA, which kept drifting after the best epoch).
        from ..utils.checkpoint import restore_params

        best = manager.load_best_model()
        if best is not None:
            export_params = restore_params(best["model_state_dict"])
            logger.info(
                f"Packaging best-epoch weights (epoch {best.get('epoch')})"
            )
        elif trainer.best_eval_params is not None:
            # Orbax backend: no best_model.pth exists; the trainer kept a
            # host snapshot of the best-validation-epoch eval params.
            export_params = trainer.best_eval_params
            logger.info("Packaging best-epoch weights (orbax snapshot)")
        else:
            # No validation ran / no best checkpoint: fall back to the
            # trainer's current eval params (EMA shadow if enabled).
            export_params = trainer.eval_params
        pkg = manager.save_model_for_inference(export_params, vocabulary, config)
        logger.info(f"Saved inference model to: {pkg}")

    except KeyboardInterrupt:
        logger.info("Training interrupted by user")
        trainer._save(trainer.current_epoch, {}, is_best=False)
        if trainer.orbax_manager is not None:
            # The orbax save is async — block until it is durable before
            # the interpreter tears down mid-write.
            trainer.orbax_manager.wait()
        logger.info("Saved current training state")


if __name__ == "__main__":
    main()
