"""ModelNet rotation-alignment entry point (rebuild of the reference's
run_modelnet_rotation.py)."""

from epn_pointcloud_tpu.app import config as config_lib
from epn_pointcloud_tpu.app.trainer_modelnet_rotation import \
    TrainerModelNetRotation


def main(argv=None):
    opt = config_lib.parse_args(argv)
    # per-task hard overrides (ref: run_modelnet_rotation.py:5-14)
    opt.model.flag = 'rotation'
    opt.model.model = 'reg_so3net'
    if opt.mode == 'train':
        opt.batch_size = 8
        # NOTE: the reference sets opt.decay_rate / opt.decay_step on the TOP
        # namespace (a latent bug — the LR scheduler reads opt.train_lr.*, so
        # those overrides never take effect there). We apply them where they
        # were clearly intended.
        opt.train_lr.decay_rate = 0.97
        opt.train_lr.decay_step = 3000
        opt.model.dropout_rate = 0.0
        opt.train_loss.attention_loss_type = 'default'

    trainer = TrainerModelNetRotation(opt)
    if opt.mode == 'train':
        trainer.train()
    elif opt.mode in ('eval', 'test'):
        trainer.eval()
    return trainer


if __name__ == '__main__':
    main()
