"""Offline FPFH keypoint-pair mining between fused fragments (rebuild of
SPConvNets/datasets/preprocess/run_keypoint.py; numpy FPFH instead of open3d).

Usage: python scripts/run_keypoint.py --data-path OUT  (expects
OUT/fused_fragments from scripts/run_fusion.py; writes OUT/kpts/...)
"""

import argparse
import sys

sys.path.insert(0, '.')

from epn_pointcloud_tpu.data.preprocess.keypoints import run_keypoint_mining  # noqa: E402
from epn_pointcloud_tpu.data.preprocess.tool import Config  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--data-path', type=str, required=True)
    parser.add_argument('--output-path', type=str, default=None)
    parser.add_argument('--max-pair-gap', type=int, default=3)
    args = parser.parse_args()
    run_keypoint_mining(args.data_path, args.output_path or args.data_path,
                        Config(), args.max_pair_gap)
    print('Done!!!')


if __name__ == '__main__':
    main()
