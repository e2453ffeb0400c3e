from .layers import (  # noqa: F401
    BasicSO3Conv, BatchNorm, Dense1x1, InstanceNorm, InstanceNorm1d,
    InterSO3Conv, IntraSO3Conv, KernelPropagation, PointnetSO3Conv, make_norm)
from .blocks import (  # noqa: F401
    BasicSO3ConvBlock, InterSO3ConvBlock, IntraSO3ConvBlock,
    PropagationBlock, SeparableSO3ConvBlock)
from .heads import (  # noqa: F401
    ClsOutBlockPointnet, ClsOutBlockR, InvOutBlockMVD, InvOutBlockPointnet,
    InvOutBlockR, RelSO3OutBlockR, SO3OutBlockR)
from .zpconv import AnchorProp, BasicZPConv, InterZPConv, IntraZPConv  # noqa: F401
