from . import pc, synthetic  # noqa: F401
from .modelnet40 import (  # noqa: F401
    DataLoader, Dataloader_ModelNet40, Dataloader_ModelNet40Alignment)
