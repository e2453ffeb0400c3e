from .tool import Config  # noqa: F401
from . import fpfh, fusion, keypoints  # noqa: F401
