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

# multi-minute torch-oracle tests: heavy tier (see tests/conftest.py)
pytestmark = pytest.mark.heavy

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


def test_rotation_eval_entrypoint_parity(reference_mode, tmp_path,
                                         monkeypatch):
    """Reference trainer_modelnetRotation.eval() (median angular error +
    classifier acc, SPConvNets/trainer_modelnetRotation.py:136-176) vs our
    TrainerModelNetRotation.eval() on identical imported weights and an
    identical item stream.

    The reference Alignment loader draws its resample indices and eval
    rotation from GLOBAL np.random per access (modelnet40.py:115-132), so
    both loops are pinned to the same stream: np.random.seed before each
    run, our loader's rng pointed at the np.random module, file order and
    batch order aligned (both loaders swapped to sequential, the reference's
    eval uses shuffle=True which cannot be replicated cross-framework; the
    eval LOOP body under test is unchanged)."""
    import torch
    rh.install_stubs()
    root = str(tmp_path / 'data')
    synthetic.make_modelnet_tree(root, n_cats=1, n_train=2, n_test=6,
                                 n_points=2048, seed=37)
    assert os.path.isdir(os.path.join(root, 'airplane', 'testR'))
    batch_size = 3   # 6 testR samples -> 2 equal batches

    # ---- shared config (run_modelnet_rotation.py:5-14 overrides)
    opt = rh.build_ref_opt()
    opt.model.model = 'reg_so3net'
    opt.model.flag = 'rotation'
    opt.model.kanchor = 60
    opt.model.representation = 'quat'
    opt.train_loss.reg_r_weight = 10.0
    opt.mode = 'eval'
    opt.dataset_path = root
    opt.batch_size = batch_size
    opt.num_thread = 0
    opt.no_augmentation = False

    torch.manual_seed(2913)
    np.random.seed(2913)
    from SPConvNets.models import reg_so3net as ref_reg
    seed_model = ref_reg.build_model_from(opt, None)
    # '_net_' in the name so both trainers derive an exp_name and dump the
    # per-sample error vector (trainer_modelnetRotation.py:168-170)
    ckpt_pth = str(tmp_path / 'model_net_0.pth')
    torch.save(seed_model.state_dict(), ckpt_pth)
    del seed_model

    import vgtk.app.trainer as vat

    def _check_opt_cpu(self, o, print_opt=True):
        self.opt = o
        self.opt.device = 'cpu'
    vat.Trainer.check_opt = _check_opt_cpu

    # ---- reference entry point
    opt.model_dir = str(tmp_path / 'ref_runs')
    opt.resume_path = ckpt_pth
    ref_cwd = tmp_path / 'ref_cwd'
    (ref_cwd / 'data' / 'alignment_errors').mkdir(parents=True)
    from SPConvNets.trainer_modelnetRotation import Trainer as RefTrainer
    monkeypatch.chdir(ref_cwd)
    ref_trainer = RefTrainer(opt)
    ref_files = list(ref_trainer.dataset_test.dataset.all_data)
    ref_trainer.dataset_test = torch.utils.data.DataLoader(
        ref_trainer.dataset_test.dataset, batch_size=batch_size,
        shuffle=False, num_workers=0)
    np.random.seed(777)
    ref_trainer.eval()
    err_files = list((ref_cwd / 'data' / 'alignment_errors').glob('*.txt'))
    assert len(err_files) == 1, err_files
    ref_errors = np.loadtxt(str(err_files[0]))

    # ---- our entry point
    import jax
    import jax.numpy as jnp
    from flax import serialization
    from epn_pointcloud_tpu import compat
    from epn_pointcloud_tpu.app.trainer_modelnet_rotation import (
        TrainerModelNetRotation)
    from epn_pointcloud_tpu.data.modelnet40 import DataLoader as OurLoader
    from epn_pointcloud_tpu.models import reg_so3net

    model = reg_so3net.build_model(opt)
    x0 = jnp.zeros((1, 2, 1024, 3), jnp.float32)
    variables = jax.jit(
        lambda: model.init({'params': jax.random.PRNGKey(0)}, x0,
                           train=False))()
    imported = compat.import_state_dict(variables, torch.load(ckpt_pth))
    ours_ckpt = str(tmp_path / 'imported_net_0.ckpt')
    with open(ours_ckpt, 'wb') as f:
        f.write(serialization.to_bytes(
            {'params': imported['params'],
             'batch_stats': imported.get('batch_stats', {})}))

    opt.model_dir = str(tmp_path / 'our_runs')
    opt.resume_path = ours_ckpt
    our_cwd = tmp_path / 'our_cwd'
    our_cwd.mkdir()
    monkeypatch.chdir(our_cwd)
    our_trainer = TrainerModelNetRotation(opt)
    ds = our_trainer.dataset_test.dataset
    ds.all_data = ref_files          # reference glob order
    ds.rng = np.random               # reference global-stream draws
    our_trainer.dataset_test = OurLoader(ds, batch_size, shuffle=False,
                                         seed=opt.seed, drop_last=False)
    np.random.seed(777)
    our_median = our_trainer.eval()
    err_files = list((our_cwd / 'data' / 'alignment_errors').glob('*.txt'))
    assert len(err_files) == 1, err_files
    our_errors = np.loadtxt(str(err_files[0]))

    # per-sample angular errors equal to fp32 forward noise; medians match
    assert our_errors.shape == ref_errors.shape
    np.testing.assert_allclose(our_errors, ref_errors, rtol=0, atol=2e-3)
    assert our_median == pytest.approx(
        float(np.median(ref_errors) * 180 / np.pi), abs=0.05)


def test_3dmatch_eval_entrypoint_parity(reference_mode, tmp_path,
                                        monkeypatch):
    """Reference trainer_3dmatch.eval() (descriptor extraction ->
    feature%d.npy -> evaluate_scene -> recall.csv,
    SPConvNets/trainer_3dmatch.py:144-232) vs our Trainer3DMatch.eval() on
    identical imported weights and an identical synthetic scene.  The patch
    npz cache (the reference's own on-disk contract,
    match_3dmatch.py:486-496) is precomputed once and shared, so both
    entry points consume bit-identical patches; features and the final
    recall.csv must then agree."""
    import torch
    rh.install_stubs()
    scene = 'synth-scene'
    root = str(tmp_path / 'data3dm')
    # dense room: every keypoint's 0.4-radius ball must hold >= 1024 REAL
    # points — sparse fixtures pad patches from ~20 unique points, and the
    # duplicate-degenerate neighborhoods make the InstanceNorm backbone
    # (1/sqrt(var+eps) over near-constant fields) amplify cross-framework
    # fp32 noise to ~1e-1 descriptor error (measured; see git history)
    # density budget: n_points/extent-volume must put >= 1024 points in a
    # 0.4-radius ball (0.268 m^3), and kpt_margin keeps every keypoint ball
    # fully interior (boundary-clipped balls hold a fraction of the budget)
    synthetic.make_3dmatch_tree(root, scene=scene, n_frags=3, n_points=32000,
                                n_kpts=8, seed=11, extent=(2.0, 2.0, 1.6),
                                kpt_margin=0.45)

    # ---- shared config (run_3dmatch.py:15-31 eval overrides, small shapes)
    opt = rh.build_ref_opt()
    opt.model.model = 'inv_so3net_pn'
    opt.model.flag = 'attention'
    opt.model.kanchor = 60
    opt.model.search_radius = 0.4
    # input_num must stay 1024: the reference builder's int-truncated
    # neighbor derivation (inv_so3net_pn.py:67-106) yields a 0-neighbor
    # first layer for any smaller input_num and crashes in ball grouping
    opt.model.input_num = 1024
    opt.no_augmentation = True
    opt.mode = 'eval'
    opt.dataset_path = root
    opt.batch_size = 4
    opt.npt = 1
    opt.num_thread = 0
    opt.experiment_id = 'epp3dm'

    torch.manual_seed(2913)
    np.random.seed(2913)
    from SPConvNets.models import inv_so3net_pn as ref_inv
    seed_model = ref_inv.build_model_from(opt, None)
    ckpt_pth = str(tmp_path / 'model_net_0.pth')
    torch.save(seed_model.state_dict(), ckpt_pth)
    del seed_model

    # precompute the shared patch cache with our (parity-tested) pipeline
    from epn_pointcloud_tpu.data.match_3dmatch import SceneEvalLoader
    pre = SceneEvalLoader(opt, scene)
    for i in range(len(pre)):
        pre[i]
    assert os.path.exists(pre.grouped_path(0))
    # fixture-health gate: duplicate-padded patches are numerically
    # degenerate (see the density comment above) — fail loudly here rather
    # than as an inscrutable descriptor mismatch below
    patches0 = np.load(pre.grouped_path(0))['arr_0']
    n_unique = min(np.unique(pc.round(7), axis=0).shape[0]
                   for pc in patches0)
    assert n_unique >= 0.9 * patches0.shape[1], (
        f'sparse fixture: a patch has only {n_unique} unique points of '
        f'{patches0.shape[1]} — raise n_points or shrink extent')

    import vgtk.app.trainer as vat

    def _check_opt_cpu(self, o, print_opt=True):
        self.opt = o
        self.opt.device = 'cpu'
    vat.Trainer.check_opt = _check_opt_cpu

    # serial pool: the reference hardcodes multiprocessing.Pool(8)
    # (evaluation_3dmatch.py:183-185); fork-bombing a 1-core CI host is not
    # part of the contract under test
    class _SerialPool:
        def __init__(self, *a, **k):
            pass

        def starmap(self, fn, args):
            return [fn(*a) for a in args]
    from SPConvNets.datasets import evaluation_3dmatch as ref_eval3d
    monkeypatch.setattr(ref_eval3d, 'Pool', _SerialPool)

    # ---- reference entry point
    opt.model_dir = str(tmp_path / 'ref_runs')
    opt.resume_path = ckpt_pth
    ref_cwd = tmp_path / 'ref_cwd'
    ref_cwd.mkdir()
    monkeypatch.chdir(ref_cwd)
    from SPConvNets.trainer_3dmatch import Trainer as RefTrainer
    ref_trainer = RefTrainer(opt)
    ref_trainer.eval([scene])
    ref_csv = (ref_cwd / 'trained_models/evaluate/3DMatch' /
               opt.experiment_id / 'recall.csv').read_text()
    ref_featdir = (ref_cwd / 'data/evaluate/3DMatch' / opt.experiment_id /
                   scene / f'{opt.model.output_num}_dim')
    ref_feats = [np.load(str(ref_featdir / f'feature{i}.npy'))
                 for i in range(3)]

    # ---- our entry point
    import jax
    import jax.numpy as jnp
    from flax import serialization
    from epn_pointcloud_tpu import compat
    from epn_pointcloud_tpu.app.trainer_3dmatch import Trainer3DMatch
    from epn_pointcloud_tpu.models import inv_so3net_pn

    model = inv_so3net_pn.build_model(opt)
    x0 = jnp.zeros((1, opt.model.input_num, 3), jnp.float32)
    variables = jax.jit(
        lambda: model.init({'params': jax.random.PRNGKey(0)}, x0,
                           train=False))()
    imported = compat.import_state_dict(variables, torch.load(ckpt_pth))
    ours_ckpt = str(tmp_path / 'imported_net_0.ckpt')
    with open(ours_ckpt, 'wb') as f:
        f.write(serialization.to_bytes(
            {'params': imported['params'],
             'batch_stats': imported.get('batch_stats', {})}))

    opt.model_dir = str(tmp_path / 'our_runs')
    opt.resume_path = ours_ckpt
    our_cwd = tmp_path / 'our_cwd'
    our_cwd.mkdir()
    monkeypatch.chdir(our_cwd)
    our_trainer = Trainer3DMatch(opt)
    our_results = our_trainer.eval([scene])
    our_csv = (our_cwd / 'trained_models/evaluate/3DMatch' /
               opt.experiment_id / 'recall.csv').read_text()
    our_featdir = (our_cwd / 'data/evaluate/3DMatch' / opt.experiment_id /
                   scene / f'{opt.model.output_num}_dim')
    our_feats = [np.load(str(our_featdir / f'feature{i}.npy'))
                 for i in range(3)]

    # descriptors agree to fp32 forward noise; recall table agrees exactly
    for i, (a, b) in enumerate(zip(our_feats, ref_feats)):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=0, atol=2e-4,
                                   err_msg=f'fragment {i} descriptors')
    assert our_csv == ref_csv, (
        f'recall.csv mismatch:\nours:\n{our_csv}\nref:\n{ref_csv}')
    assert scene in our_results and len(our_results[scene]) == 3
