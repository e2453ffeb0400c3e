from . import icosahedron, kernel_points, ply, rotation, sampling, so3conv  # noqa: F401
from .icosahedron import get_anchors, get_anchors_full, get_intra_idx  # noqa: F401
from .kernel_points import get_spherical_kernel_points, KERNEL_CONDENSE_RATIO  # noqa: F401
from .sampling import (  # noqa: F401
    furthest_point_sampling, furthest_sample, ball_query, gather_points,
    batched_index_select, add_shadow_point, add_shadow_feature,
    inter_grouping_ball)
from .so3conv import SphericalPointCloud, preprocess_input  # noqa: F401
