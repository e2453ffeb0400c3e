"""3DMatch entry point (rebuild of the reference's run_3dmatch.py — same CLI
and scene list)."""

from epn_pointcloud_tpu.app import config as config_lib
from epn_pointcloud_tpu.app.trainer_3dmatch import Trainer3DMatch

SCENE_TO_TEST = [
    '7-scenes-redkitchen',
    'sun3d-home_at-home_at_scan1_2013_jan_1',
    'sun3d-home_md-home_md_scan9_2012_sep_30',
    'sun3d-hotel_uc-scan3',
    'sun3d-hotel_umd-maryland_hotel1',
    'sun3d-hotel_umd-maryland_hotel3',
    'sun3d-mit_76_studyroom-76-1studyroom2',
    'sun3d-mit_lab_hj-lab_hj_tea_nov_2_2012_scan1_erika',
]


def config_opt_3dmatch(opt):
    """(ref: run_3dmatch.py:15-31)"""
    opt.model.search_radius = 0.4
    opt.model.flag = 'attention'
    opt.model.model = 'inv_so3net_pn'
    opt.no_augmentation = True
    if opt.mode == 'train':
        opt.npt = 16
        opt.batch_size = 1
        opt.num_iterations = 150000
        opt.save_freq = 4000
        opt.train_lr.decay_step = 20000
    elif opt.mode == 'eval':
        opt.npt = 24
        opt.batch_size = 8
    return opt


def main(argv=None, scenes=None):
    opt = config_opt_3dmatch(config_lib.parse_args(argv))
    scenes = scenes if scenes is not None else SCENE_TO_TEST
    if opt.mode == 'train':
        trainer = Trainer3DMatch(opt)
        trainer.train()
    elif opt.mode == 'eval':
        assert opt.resume_path is not None
        opt.experiment_id = opt.resume_path.split('/')[2]
        trainer = Trainer3DMatch(opt)
        trainer.eval(scenes)
    return trainer


if __name__ == '__main__':
    main()
