"""Model registry. `build_model_from(opt)` dispatches on opt.model.model the
way the reference trainers do via importlib (ref: trainer_modelnet.py:42-49).
"""

from . import cls_so3net_pn, inv_so3net_pn, reg_so3net  # noqa: F401
from .cls_so3net_pn import ClsSO3ConvModel  # noqa: F401
from .inv_so3net_pn import InvSO3ConvModel  # noqa: F401
from .reg_so3net import RegSO3ConvModel  # noqa: F401

_REGISTRY = {
    'cls_so3net_pn': cls_so3net_pn,
    'inv_so3net_pn': inv_so3net_pn,
    'reg_so3net': reg_so3net,
}


def get_module(name: str):
    if name not in _REGISTRY:
        raise KeyError(f'unknown model {name!r}; available: {sorted(_REGISTRY)}')
    return _REGISTRY[name]


def build_model_from(opt, outfile_path=None):
    return get_module(opt.model.model).build_model_from(opt, outfile_path)
