"""Golden tests for core ops vs a pure-numpy reimplementation of the
reference CUDA kernel semantics (SURVEY.md §7 stage 2)."""

import numpy as np
import jax.numpy as jnp

from epn_pointcloud_tpu.ops import sampling


# --- numpy oracles matching the reference CUDA kernels ----------------------

def fps_oracle(xyz, m):
    """grouping_cuda_kernel.cu:351-466 semantics."""
    b, n, _ = xyz.shape
    out = np.zeros((b, m), dtype=np.int32)
    for bi in range(b):
        mag = (xyz[bi] ** 2).sum(-1)
        valid = mag > 1e-3
        temp = np.full(n, np.inf)
        old = 0
        for j in range(1, m):
            d = ((xyz[bi] - xyz[bi, old]) ** 2).sum(-1)
            temp = np.minimum(temp, d)
            cand = np.where(valid, temp, -np.inf)
            old = int(np.argmax(cand))
            out[bi, j] = old
    return out


def ball_query_oracle(query, support, radius, nsample):
    """grouping_cuda_kernel.cu:67-113 semantics (with proper periodic fill)."""
    b, m, _ = query.shape
    n = support.shape[1]
    out = np.zeros((b, m, nsample), dtype=np.int32)
    for bi in range(b):
        for j in range(m):
            hits = []
            for k in range(n):
                if ((query[bi, j] - support[bi, k]) ** 2).sum() < radius ** 2:
                    hits.append(k)
                    if len(hits) == nsample:
                        break
            if hits:
                for s in range(nsample):
                    out[bi, j, s] = hits[s % len(hits)]
    return out


# --- tests -------------------------------------------------------------------

def test_gather_points():
    rng = np.random.RandomState(0)
    feats = rng.randn(2, 10, 4, 3).astype(np.float32)
    idx = rng.randint(0, 10, size=(2, 5)).astype(np.int32)
    out = np.asarray(sampling.gather_points(jnp.asarray(feats), jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_allclose(out[b], feats[b, idx[b]])


def test_gather_points_2d_idx():
    rng = np.random.RandomState(1)
    feats = rng.randn(2, 10, 3).astype(np.float32)
    idx = rng.randint(0, 10, size=(2, 4, 6)).astype(np.int32)
    out = np.asarray(sampling.gather_points(jnp.asarray(feats), jnp.asarray(idx)))
    assert out.shape == (2, 4, 6, 3)
    for b in range(2):
        np.testing.assert_allclose(out[b], feats[b][idx[b]])


def test_fps_matches_oracle():
    rng = np.random.RandomState(2)
    xyz = rng.randn(3, 64, 3).astype(np.float32)
    idx = np.asarray(sampling.furthest_point_sampling(jnp.asarray(xyz), 16))
    np.testing.assert_array_equal(idx, fps_oracle(xyz, 16))


def test_fps_skips_shadow_points():
    rng = np.random.RandomState(3)
    xyz = rng.randn(1, 32, 3).astype(np.float32) + 2.0  # away from origin
    xyz[0, 5] = 0.0  # shadow point at origin
    xyz[0, 17] = 0.01
    idx = np.asarray(sampling.furthest_point_sampling(jnp.asarray(xyz), 20))
    assert 5 not in idx[0][1:] and 17 not in idx[0][1:]


def test_fps_first_sample_is_zero():
    rng = np.random.RandomState(4)
    xyz = rng.randn(2, 32, 3).astype(np.float32)
    idx = np.asarray(sampling.furthest_point_sampling(jnp.asarray(xyz), 8))
    assert (idx[:, 0] == 0).all()


def test_lazy_sample():
    rng = np.random.RandomState(5)
    xyz = rng.randn(2, 16, 3).astype(np.float32)
    idx, sxyz = sampling.furthest_sample(jnp.asarray(xyz), 8, lazy_sample=True)
    np.testing.assert_array_equal(np.asarray(idx), np.tile(np.arange(8), (2, 1)))
    np.testing.assert_allclose(np.asarray(sxyz), xyz[:, :8])


def test_ball_query_matches_oracle():
    rng = np.random.RandomState(6)
    support = rng.rand(2, 50, 3).astype(np.float32)
    query = support[:, ::5]
    idx = np.asarray(sampling.ball_query(jnp.asarray(query), jnp.asarray(support), 0.3, 8))
    np.testing.assert_array_equal(idx, ball_query_oracle(query, support, 0.3, 8))


def test_ball_query_order_semantics():
    """First hits in index order, not nearest hits."""
    support = np.zeros((1, 6, 3), dtype=np.float32)
    support[0, 0] = [0.25, 0, 0]
    support[0, 1] = [0.05, 0, 0]   # nearer but later would not displace
    support[0, 2] = [0.28, 0, 0]
    support[0, 3] = [5, 5, 5]
    support[0, 4] = [0.01, 0, 0]
    support[0, 5] = [0.02, 0, 0]
    query = np.zeros((1, 1, 3), dtype=np.float32)
    idx = np.asarray(sampling.ball_query(jnp.asarray(query), jnp.asarray(support), 0.3, 3))
    np.testing.assert_array_equal(idx[0, 0], [0, 1, 2])


def test_ball_query_repeat_fill():
    support = np.full((1, 5, 3), 10.0, dtype=np.float32)
    support[0, 2] = [0.1, 0, 0]
    support[0, 4] = [0.0, 0.1, 0]
    query = np.zeros((1, 1, 3), dtype=np.float32)
    idx = np.asarray(sampling.ball_query(jnp.asarray(query), jnp.asarray(support), 0.5, 5))
    np.testing.assert_array_equal(idx[0, 0], [2, 4, 2, 4, 2])


def test_ball_query_empty_neighborhood():
    support = np.full((1, 5, 3), 10.0, dtype=np.float32)
    query = np.zeros((1, 2, 3), dtype=np.float32)
    idx = np.asarray(sampling.ball_query(jnp.asarray(query), jnp.asarray(support), 0.5, 4))
    np.testing.assert_array_equal(idx, 0)


def test_shadow_padding():
    xyz = np.zeros((2, 4, 3), dtype=np.float32)
    p = np.asarray(sampling.add_shadow_point(jnp.asarray(xyz)))
    assert p.shape == (2, 5, 3) and (p[:, -1] == sampling.SHADOW_COORD).all()
    feats = np.ones((2, 4, 6, 8), dtype=np.float32)
    f = np.asarray(sampling.add_shadow_feature(jnp.asarray(feats)))
    assert f.shape == (2, 5, 6, 8) and (f[:, -1] == 0).all()


def test_inter_grouping_ball_shapes_and_localization():
    rng = np.random.RandomState(7)
    xyz = rng.rand(2, 32, 3).astype(np.float32)
    gx, bidx, sidx, sxyz = sampling.inter_grouping_ball(
        jnp.asarray(xyz), stride=2, radius=0.5, n_neighbor=8, lazy_sample=True)
    assert gx.shape == (2, 16, 8, 3)
    assert bidx.shape == (2, 16, 8)
    assert sidx.shape == (2, 16)
    assert sxyz.shape == (2, 16, 3)
    # grouped coordinates are local (center-subtracted): real (non-shadow)
    # neighbors lie within the search radius
    gx = np.asarray(gx)
    real = np.linalg.norm(gx, axis=-1) < 100
    assert (np.linalg.norm(gx, axis=-1)[real] < 0.5 + 1e-5).all()


def test_gather_rows_onehot_matches_gather():
    """The one-hot MXU gather is an exact selection: bitwise equal to the
    plain gather in both fp32 (HIGHEST-precision split) and bf16 modes."""
    rng = np.random.RandomState(3)
    for dtype in (np.float32, jnp.bfloat16):
        table = jnp.asarray(rng.randn(3, 65, 200).astype(np.float32)).astype(dtype)
        idx = jnp.asarray(rng.randint(0, 65, size=(3, 300)).astype(np.int32))
        direct = jnp.take_along_axis(table, idx[:, :, None], axis=1)
        onehot = sampling.gather_rows_onehot(table, idx)
        assert onehot.dtype == table.dtype
        np.testing.assert_array_equal(np.asarray(direct, np.float32),
                                      np.asarray(onehot, np.float32))


def test_ball_query_pallas_matches_xla():
    """The Pallas min-extract ball query (interpret mode) equals the XLA
    top_k formulation, including short neighborhoods and repeat fill."""
    rng = np.random.RandomState(7)
    q = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32) * 0.5)
    s = jnp.asarray(rng.randn(2, 256, 3).astype(np.float32) * 0.5)
    for r, ns in [(0.4, 16), (0.15, 8), (1.2, 32), (0.05, 4)]:
        a = sampling.ball_query(q, s, r, ns, use_pallas=False)
        b = sampling.ball_query(q, s, r, ns, use_pallas=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b)), (r, ns)


def test_ball_query_and_fps_shard_map_multidevice():
    """The Pallas ball-query and FPS kernels run under shard_map over the
    'data' axis on multi-device meshes (GSPMD cannot partition opaque Pallas
    calls); per-shard results must equal the unsharded call."""
    import jax
    import pytest as _pytest
    from epn_pointcloud_tpu.parallel import mesh as pmesh
    from epn_pointcloud_tpu.ops.pallas import ball_query as plbq
    from epn_pointcloud_tpu.ops.pallas.fps import fps_pallas
    if len(jax.devices()) < 2:
        _pytest.skip('needs multi-device backend')
    rng = np.random.RandomState(7)
    b, m, n, k = 8, 32, 64, 8
    query = jnp.asarray(rng.randn(b, m, 3).astype(np.float32) * 0.4)
    support = jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 0.4)
    mesh = pmesh.make_mesh()
    pmesh.set_global_mesh(mesh)
    try:
        assert pmesh.data_mesh_for(b) is mesh
        assert pmesh.data_mesh_for(b - 1) is None  # batch must divide

        bq = lambda q, s: plbq.ball_query_pallas(q, s, 0.36, k,
                                                 interpret=True)
        i1, c1 = jax.jit(bq)(query, support)
        i2, c2 = jax.jit(pmesh.data_shard_map(bq, mesh, 2, 0))(query, support)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))

        fp = lambda x: fps_pallas(x, 16, 1e-3, interpret=True)
        f1 = jax.jit(fp)(support)
        f2 = jax.jit(pmesh.data_shard_map(fp, mesh, 1, 0))(support)
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    finally:
        pmesh.set_global_mesh(None)


def test_batched_index_select_matches_torch_gather():
    """batched_index_select == torch.gather with the expanded index
    (ref: spconv/functional.py:361-369), along dims 1 and 2."""
    import torch
    from epn_pointcloud_tpu.ops.sampling import batched_index_select
    rng = np.random.RandomState(11)
    x = rng.randn(3, 7, 5, 4).astype(np.float32)
    for dim, m in ((1, 9), (2, 6)):
        index = rng.randint(0, x.shape[dim], size=(3, m)).astype(np.int64)
        ti = torch.from_numpy(index)
        for ii in range(1, x.ndim):
            if ii != dim:
                ti = ti.unsqueeze(ii)
        expanse = list(x.shape)
        expanse[0] = -1
        expanse[dim] = -1
        ref = torch.gather(torch.from_numpy(x), dim, ti.expand(expanse))
        out = batched_index_select(jnp.asarray(x), dim, jnp.asarray(index))
        np.testing.assert_allclose(np.asarray(out), ref.numpy())
