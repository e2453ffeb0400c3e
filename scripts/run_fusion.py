"""Offline TSDF fusion of RGB-D scans into fused fragments (rebuild of
SPConvNets/datasets/preprocess/run_fusion.py; numpy TSDF instead of open3d).

Usage: python scripts/run_fusion.py --data-path RAW --output-path OUT
Input layout: RAW/<scene>/seq-*/frame-N.{depth.png,pose.txt} +
RAW/<scene>/camera-intrinsics.txt
Output: OUT/fused_fragments/<scene>/cloud_bin_K.ply + cloud_bin_K_pose.txt
"""

import argparse
import os
import sys

sys.path.insert(0, '.')

from epn_pointcloud_tpu.data.preprocess.fusion import run_rgbd_fusion  # noqa: E402
from epn_pointcloud_tpu.data.preprocess.tool import Config  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--data-path', type=str, required=True)
    parser.add_argument('--output-path', type=str, required=True)
    args = parser.parse_args()
    cfg = Config()
    run_rgbd_fusion(os.path.join(args.output_path, 'fused_fragments'),
                    args.data_path, cfg)
    print('Done!!!')


if __name__ == '__main__':
    main()
