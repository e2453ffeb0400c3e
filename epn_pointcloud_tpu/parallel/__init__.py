from .distributed import (  # noqa: F401
    global_batch_from_local, init_distributed, process_slice)
from .mesh import (  # noqa: F401
    batch_sharding, constrain_feats, get_global_mesh, make_mesh,
    replicate, set_global_mesh, shard_batch)
from .train import TrainState, create_train_state, make_lr_schedule  # noqa: F401
