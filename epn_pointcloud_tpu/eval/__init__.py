from . import evaluation_3dmatch  # noqa: F401
from .evaluation_3dmatch import (  # noqa: F401
    TAU_RANGE, evaluate_fragment_pair, evaluate_scene, read_gt_log)
from .retrieval import modelnet_retrieval_mAP  # noqa: F401
