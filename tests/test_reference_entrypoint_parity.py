"""Entry-point-level eval parity vs the PyTorch reference.

BASELINE.md's contract reads "through the same entry points": this test runs
the REFERENCE's own eval loop (SPConvNets/trainer_modelnet.py:138-209, the
body of `run_modelnet.py --run-mode eval`) and this framework's
TrainerModelNet.eval() on identical imported weights and an identical
deterministic fixture dataset, asserting the reported average accuracy is
equal.

Determinism: every testR .mat carries a stored 'R', so the eval rotation
path (modelnet40.py:64-65) is deterministic in both frameworks; the fixture
size is divisible by the batch size so mean-over-batches equals the overall
fraction correct regardless of file iteration order.
"""

import os
import sys

import numpy as np
import pytest
import scipy.io as sio

sys.path.insert(0, os.path.dirname(__file__))

import reference_harness as rh  # noqa: E402

from epn_pointcloud_tpu.data import synthetic  # noqa: E402
from epn_pointcloud_tpu.ops import icosahedron  # noqa: E402


@pytest.fixture()
def reference_mode():
    icosahedron.set_convention('reference')
    yield
    icosahedron.set_convention('native')


def _make_eval_tree(root):
    """3 categories x 4 testR samples at the model's native 1024 points
    (the non-train path skips resampling: modelnet40.py:53-55), each with a
    stored deterministic rotation."""
    from scipy.spatial.transform import Rotation
    synthetic.make_modelnet_tree(root, n_cats=3, n_train=2, n_test=4,
                                 n_points=1024, seed=31)
    k = 0
    for cat in sorted(os.listdir(root)):
        d = os.path.join(root, cat, 'testR')
        for fn in sorted(os.listdir(d)):
            path = os.path.join(d, fn)
            data = {key: val for key, val in sio.loadmat(path).items()
                    if not key.startswith('__')}
            data['R'] = Rotation.random(random_state=100 + k).as_matrix()
            sio.savemat(path, data)
            k += 1
    return root


def test_modelnet_eval_entrypoint_parity(reference_mode, tmp_path):
    import torch
    rh.install_stubs()
    root = _make_eval_tree(str(tmp_path / 'data'))

    batch_size = 6  # 12 testR samples -> 2 equal batches

    # ---- reference entry point (run_modelnet.py eval branch)
    opt = rh.build_ref_opt()
    opt.model.flag = 'attention'
    opt.model.model = 'cls_so3net_pn'
    opt.model.kanchor = 60
    opt.mode = 'eval'
    opt.dataset_path = root
    opt.batch_size = batch_size
    opt.num_thread = 0
    opt.no_augmentation = False
    opt.model_dir = str(tmp_path / 'ref_runs')
    opt.resume_path = None

    torch.manual_seed(2913)
    np.random.seed(2913)
    # build + save a reference checkpoint for both frameworks to resume from
    from SPConvNets.models import cls_so3net_pn as ref_cls
    seed_model = ref_cls.build_model_from(opt, None)
    ckpt_pth = str(tmp_path / 'ref_weights.pth')
    torch.save(seed_model.state_dict(), ckpt_pth)
    del seed_model

    opt.resume_path = ckpt_pth
    # the reference base trainer force-sets opt.device = torch.device('cuda')
    # in check_opt (vgtk/app/trainer.py:129); pin it to CPU for the oracle
    import vgtk.app.trainer as vat

    def _check_opt_cpu(self, o, print_opt=True):
        self.opt = o
        self.opt.device = 'cpu'
    monkeypatch_target = vat.Trainer
    monkeypatch_target.check_opt = _check_opt_cpu
    from SPConvNets.trainer_modelnet import Trainer as RefTrainer
    ref_trainer = RefTrainer(opt)
    ref_trainer.eval()
    ref_acc = float(ref_trainer.test_accs[-1])  # percent

    # ---- our entry point (run_modelnet.py -> TrainerModelNet, eval mode)
    import jax
    import jax.numpy as jnp
    from flax import serialization
    from epn_pointcloud_tpu import compat
    from epn_pointcloud_tpu.app.trainer_modelnet import TrainerModelNet
    from epn_pointcloud_tpu.models import cls_so3net_pn

    model = cls_so3net_pn.build_model(opt)
    x0 = jnp.zeros((1, 1024, 3), jnp.float32)
    variables = jax.jit(
        lambda: model.init({'params': jax.random.PRNGKey(0)}, x0,
                           train=False))()
    imported = compat.import_state_dict(variables, torch.load(ckpt_pth))
    ours_ckpt = str(tmp_path / 'imported.ckpt')
    with open(ours_ckpt, 'wb') as f:
        f.write(serialization.to_bytes({'params': imported['params'],
                                        'batch_stats':
                                            imported['batch_stats']}))

    opt.model_dir = str(tmp_path / 'our_runs')
    opt.resume_path = ours_ckpt
    our_trainer = TrainerModelNet(opt)
    our_acc = 100.0 * our_trainer.eval()

    assert our_acc == pytest.approx(ref_acc, abs=1e-6), (
        f'entry-point eval accuracy mismatch: ours {our_acc:.4f}% vs '
        f'reference {ref_acc:.4f}%')
