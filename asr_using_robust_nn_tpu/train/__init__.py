from .trainer import TrainConfig, Trainer, adam_optimizer  # noqa: F401
from .multi_run import fit_multi_run  # noqa: F401
