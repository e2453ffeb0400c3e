"""ModelNet40 classification entry point (rebuild of the reference's
run_modelnet.py — same CLI: `python run_modelnet.py experiment -d PATH ...`)."""

from epn_pointcloud_tpu.app import config as config_lib
from epn_pointcloud_tpu.app.trainer_modelnet import TrainerModelNet


def main(argv=None):
    opt = config_lib.parse_args(argv)
    # per-task hard overrides (ref: run_modelnet.py:5-13)
    opt.model.flag = 'attention'
    opt.model.model = 'cls_so3net_pn'
    if opt.mode == 'train':
        opt.batch_size = 12
        opt.train_lr.decay_rate = 0.5
        opt.train_lr.decay_step = 20000
        opt.train_loss.attention_loss_type = 'default'

    trainer = TrainerModelNet(opt)
    if opt.mode == 'train':
        trainer.train()
    elif opt.mode in ('eval', 'test'):
        trainer.eval()
    return trainer


if __name__ == '__main__':
    main()
