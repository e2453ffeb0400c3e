from .config import (  # noqa: F401
    HierarchyArgumentParser, build_parser, default_opt, dump_args, parse_args)
from .logger import Logger, Summary, Timer  # noqa: F401
from .trainer import Trainer  # noqa: F401
