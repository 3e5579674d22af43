from .export import ExportedPredictor, export_serving_artifact  # noqa: F401
from .predictor import BatchPredictor, VideoCaptionPredictor  # noqa: F401
