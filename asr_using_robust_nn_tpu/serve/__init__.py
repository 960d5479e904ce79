from .engine import InferenceEngine, load_checkpoint  # noqa: F401
