from .mesh import data_mesh, replicated, sharded_batch  # noqa: F401
from .data_parallel import DataParallelTrainer, psum_train_step  # noqa: F401
