from .predictor import BatchPredictor, VideoCaptionPredictor  # noqa: F401
