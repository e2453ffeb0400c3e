"""EPN-PointCloud-TPU: a TPU-native (JAX/XLA/Pallas) framework for
SE(3)/SO(3)-equivariant point-cloud learning.

A ground-up rebuild of the capabilities of nintendops/EPN_PointCloud
("Equivariant Point Network for 3D Point Cloud Analysis", CVPR 2021) designed
for TPU: static-shape dense tensor algebra on the MXU, pjit/shard_map data
parallelism over device meshes, and Pallas kernels for the hot grouping ops.
"""

__version__ = '0.1.0'

from . import ops  # noqa: F401
