from .mlp import MLPConfig, apply_mlp, init_mlp, predict_probs  # noqa: F401
