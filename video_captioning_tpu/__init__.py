"""TPU-native video-captioning framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
angadbawa/Video-Captioning: offline CNN feature extraction, BiLSTM video
encoder + attention LSTM decoder training, on-device greedy/beam caption
generation, BLEU/METEOR/ROUGE/CIDEr evaluation, checkpointing, and CLIs —
designed SPMD-first over a ``(data, model)`` device mesh.
"""

__version__ = "0.1.0"

from .config import (  # noqa: F401
    Config,
    DataConfig,
    ExperimentConfig,
    InferenceConfig,
    KernelConfig,
    ModelConfig,
    ParallelConfig,
    TrainingConfig,
    get_config,
)
from .data.vocabulary import Vocabulary, build_vocabulary_from_csv  # noqa: F401


def __getattr__(name):  # lazy heavy imports: jax loads only when needed
    if name == "VideoCaptionPredictor":
        from .inference.predictor import VideoCaptionPredictor

        return VideoCaptionPredictor
    if name == "BatchPredictor":
        from .inference.predictor import BatchPredictor

        return BatchPredictor
    if name == "VideoCaptioningTrainer":
        from .training.trainer import VideoCaptioningTrainer

        return VideoCaptioningTrainer
    raise AttributeError(name)
