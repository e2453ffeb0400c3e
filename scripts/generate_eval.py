"""Precompute 3DMatch test patches per scene (rebuild of
SPConvNets/datasets/generate_eval.py — same scene list and disk outputs:
grouped_data_r%.2f/grouped_cloud_bin_N.npz with 2048-point patches)."""

import argparse
import sys
from types import SimpleNamespace

sys.path.insert(0, '.')

from epn_pointcloud_tpu.data.match_3dmatch import SceneTestLoader  # noqa: E402

ALLSCENES = [
    '7-scenes-redkitchen',
    'sun3d-home_at-home_at_scan1_2013_jan_1',
    'sun3d-home_md-home_md_scan9_2012_sep_30',
    'sun3d-hotel_uc-scan3',
    'sun3d-hotel_umd-maryland_hotel1',
    'sun3d-hotel_umd-maryland_hotel3',
    'sun3d-mit_76_studyroom-76-1studyroom2',
    'sun3d-mit_lab_hj-lab_hj_tea_nov_2_2012_scan1_erika',
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--data-path', type=str, required=True)
    parser.add_argument('--search-radius', type=float, default=0.4)
    parser.add_argument('--input-num', type=int, default=2048)
    parser.add_argument('--num-worker', type=int, default=8)
    parser.add_argument('--scenes', nargs='*', default=None)
    args = parser.parse_args()

    opt = SimpleNamespace(
        dataset_path=args.data_path, batch_size=8, seed=2913,
        model=SimpleNamespace(input_num=args.input_num,
                              search_radius=args.search_radius))

    for scene in (args.scenes or ALLSCENES):
        print(f'Working on scene {scene}!')
        dataset = SceneTestLoader(opt)
        dataset.prepare(scene)
        dataset.precompute_patches(scale=1.0, input_num=args.input_num,
                                   num_worker=args.num_worker)
    print('Done!')


if __name__ == '__main__':
    main()
