from .mesh import (  # noqa: F401
    batch_sharding, make_mesh, replicate, shard_batch)
from .train import TrainState, create_train_state, make_lr_schedule  # noqa: F401
