import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ws3d_tpu.ops.sampling import furthest_point_sample, gather_points
from ws3d_tpu.ops.grouping import ball_query, group_points, query_and_group, group_all
from ws3d_tpu.ops.interpolate import three_nn, three_interpolate, interpolate_features


# ---------------- numpy golden references (CUDA semantics) -----------------

def np_fps(xyz, npoint):
    """sampling_gpu.cu semantics: start at 0, maximize min-dist."""
    N = xyz.shape[0]
    idx = np.zeros(npoint, np.int32)
    dist = np.full(N, 1e10)
    last = 0
    for i in range(1, npoint):
        d = np.sum((xyz - xyz[last]) ** 2, axis=1)
        dist = np.minimum(dist, d)
        last = int(np.argmax(dist))
        idx[i] = last
    return idx


def np_ball_query(radius, nsample, xyz, new_xyz):
    """ball_query_gpu.cu semantics incl. first-index padding."""
    M, N = new_xyz.shape[0], xyz.shape[0]
    out = np.zeros((M, nsample), np.int32)
    for m in range(M):
        cnt = 0
        for n in range(N):
            d2 = np.sum((new_xyz[m] - xyz[n]) ** 2)
            if d2 < radius ** 2:
                if cnt == 0:
                    out[m, :] = n
                out[m, cnt] = n
                cnt += 1
                if cnt >= nsample:
                    break
    return out


def test_fps_matches_reference(rng):
    xyz = rng.randn(2, 128, 3).astype(np.float32)
    got = np.asarray(furthest_point_sample(jnp.asarray(xyz), 16))
    for b in range(2):
        np.testing.assert_array_equal(got[b], np_fps(xyz[b], 16))


def test_fps_covers_spread_points():
    # 4 well-separated clusters: fps with npoint=4 must pick one per cluster
    centers = np.array([[0, 0, 0], [10, 0, 0], [0, 0, 10], [10, 0, 10]], np.float32)
    pts = np.concatenate([centers[i] + 0.01 * np.random.RandomState(i).randn(8, 3)
                          for i in range(4)]).astype(np.float32)
    idx = np.asarray(furthest_point_sample(jnp.asarray(pts[None]), 4))[0]
    assert len({int(i) // 8 for i in idx}) == 4


def test_gather_points(rng):
    pts = rng.randn(2, 32, 4).astype(np.float32)
    idx = rng.randint(0, 32, (2, 7)).astype(np.int32)
    got = np.asarray(gather_points(jnp.asarray(pts), jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_allclose(got[b], pts[b][idx[b]])


def test_ball_query_matches_reference(rng):
    xyz = rng.randn(2, 64, 3).astype(np.float32)
    new_xyz = xyz[:, :16] + 0.05
    got = np.asarray(ball_query(0.5, 8, jnp.asarray(xyz), jnp.asarray(new_xyz)))
    for b in range(2):
        np.testing.assert_array_equal(got[b], np_ball_query(0.5, 8, xyz[b], new_xyz[b]))


def test_ball_query_empty_center(rng):
    xyz = jnp.asarray(rng.randn(1, 32, 3).astype(np.float32))
    far = jnp.full((1, 1, 3), 100.0)
    idx = np.asarray(ball_query(0.5, 4, xyz, far))
    np.testing.assert_array_equal(idx, 0)


def test_ball_query_chunked_consistent(rng):
    xyz = jnp.asarray(rng.randn(1, 256, 3).astype(np.float32) * 0.5)
    q = xyz[:, :64]
    a = ball_query(0.4, 8, xyz, q, chunk=16)
    b = ball_query(0.4, 8, xyz, q, chunk=64)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_group_points(rng):
    pts = rng.randn(2, 32, 5).astype(np.float32)
    idx = rng.randint(0, 32, (2, 4, 3)).astype(np.int32)
    got = np.asarray(group_points(jnp.asarray(pts), jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_allclose(got[b], pts[b][idx[b]])


def test_query_and_group_shapes(rng):
    xyz = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
    new_xyz = xyz[:, :8]
    feats = jnp.asarray(rng.randn(2, 64, 6).astype(np.float32))
    out = query_and_group(1.0, 16, xyz, new_xyz, feats)
    assert out.shape == (2, 8, 16, 9)
    out2 = query_and_group(1.0, 16, xyz, new_xyz, None)
    assert out2.shape == (2, 8, 16, 3)
    ga = group_all(xyz, feats)
    assert ga.shape == (2, 1, 64, 9)


def test_three_nn_matches_bruteforce(rng):
    unknown = rng.randn(2, 40, 3).astype(np.float32)
    known = rng.randn(2, 12, 3).astype(np.float32)
    d2, idx = three_nn(jnp.asarray(unknown), jnp.asarray(known))
    d2, idx = np.asarray(d2), np.asarray(idx)
    for b in range(2):
        full = np.sum((unknown[b][:, None] - known[b][None]) ** 2, axis=-1)
        order = np.argsort(full, axis=1)[:, :3]
        np.testing.assert_allclose(
            np.sort(d2[b], axis=1), np.sort(np.take_along_axis(full, order, 1), axis=1),
            rtol=1e-4, atol=1e-5)
        # squared distances, ascending
        assert (np.diff(d2[b], axis=1) >= -1e-6).all()
        np.testing.assert_allclose(
            np.take_along_axis(full, idx[b], 1), d2[b], rtol=1e-4, atol=1e-5)


def test_three_interpolate(rng):
    feats = rng.randn(1, 10, 4).astype(np.float32)
    idx = rng.randint(0, 10, (1, 6, 3)).astype(np.int32)
    w = rng.rand(1, 6, 3).astype(np.float32)
    got = np.asarray(three_interpolate(jnp.asarray(feats), jnp.asarray(idx),
                                       jnp.asarray(w)))
    want = np.einsum("nkc,nk->nc", feats[0][idx[0]], w[0])
    np.testing.assert_allclose(got[0], want, rtol=1e-5, atol=1e-6)


def test_interpolate_exact_at_known_points(rng):
    known = jnp.asarray(rng.randn(1, 8, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(1, 8, 5).astype(np.float32))
    out = interpolate_features(known, known, feats)
    np.testing.assert_allclose(np.asarray(out), np.asarray(feats), atol=1e-3)


def test_ops_jittable(rng):
    xyz = jnp.asarray(rng.randn(1, 64, 3).astype(np.float32))

    @jax.jit
    def f(x):
        idx = furthest_point_sample(x, 8)
        nx = gather_points(x, idx)
        g = ball_query(1.0, 4, x, nx)
        return idx, nx, g

    idx, nx, g = f(xyz)
    assert idx.shape == (1, 8) and nx.shape == (1, 8, 3) and g.shape == (1, 8, 4)


def test_fused_interpolate_pallas_parity(rng):
    """Fused 3-NN+interpolate Pallas kernel (interpret mode) vs the XLA
    composition: bf16 multiplicands with f32 accumulation -> loose rtol."""
    from ws3d_tpu.ops.three_nn_pallas import three_interpolate_pallas
    from ws3d_tpu.ops.interpolate import _interpolate_xla

    unknown = jnp.asarray(rng.randn(2, 24, 3).astype(np.float32))
    known = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32) * 2)
    feats = jnp.asarray(rng.randn(2, 128, 16).astype(np.float32))
    got = np.asarray(three_interpolate_pallas(unknown, known, feats,
                                              interpret=True))
    want = np.asarray(_interpolate_xla(unknown, known, feats))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def _sorted_pair(rng, B, n, m, C, spread=3.0, cluster=False):
    unknown = rng.randn(B, n, 3).astype(np.float32) * spread
    known = rng.randn(B, m, 3).astype(np.float32) * spread
    if cluster:
        known[:, : m // 2, 2] = rng.randn(B, m // 2).astype(np.float32) * 0.2
        unknown[:, : n // 2, 2] = rng.randn(B, n // 2).astype(np.float32) * 0.2
    unknown = unknown[np.arange(B)[:, None],
                      np.argsort(unknown[..., 2], axis=1)]
    known = known[np.arange(B)[:, None], np.argsort(known[..., 2], axis=1)]
    feats = rng.randn(B, m, C).astype(np.float32)
    return (jnp.asarray(unknown), jnp.asarray(known), jnp.asarray(feats))


@pytest.mark.parametrize("cluster", [False, True])
def test_windowed_interpolate_parity(rng, cluster):
    """Ring-search windowed 3-NN+interpolate (interpret mode) vs the XLA
    composition on z-sorted clouds — exactness of the early-exit rule."""
    from ws3d_tpu.ops.three_nn_pallas import three_interpolate_window_pallas
    from ws3d_tpu.ops.interpolate import _interpolate_xla

    unknown, known, feats = _sorted_pair(rng, 2, 256, 512, 16,
                                         cluster=cluster)
    got = np.asarray(three_interpolate_window_pallas(unknown, known, feats,
                                                     interpret=True))
    want = np.asarray(_interpolate_xla(unknown, known, feats))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_windowed_interpolate_far_queries(rng):
    """Queries far outside the known z-range force long one-sided rings."""
    from ws3d_tpu.ops.three_nn_pallas import three_interpolate_window_pallas
    from ws3d_tpu.ops.interpolate import _interpolate_xla

    unknown, known, feats = _sorted_pair(rng, 1, 64, 256, 8)
    unknown = unknown + jnp.asarray([0.0, 0.0, 30.0])  # all beyond known z
    got = np.asarray(three_interpolate_window_pallas(unknown, known, feats,
                                                     interpret=True))
    want = np.asarray(_interpolate_xla(unknown, known, feats))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_fused_interpolate_grad_path(rng):
    """jax.grad through interpolate_features uses the XLA-composition VJP."""
    from ws3d_tpu.ops.interpolate import (_interpolate_fused,
                                          _interpolate_xla)

    unknown = jnp.asarray(rng.randn(1, 8, 3).astype(np.float32))
    known = jnp.asarray(rng.randn(1, 128, 3).astype(np.float32) * 2)
    feats = jnp.asarray(rng.randn(1, 128, 4).astype(np.float32))

    g_fused = jax.grad(
        lambda f: jnp.sum(_interpolate_fused(unknown, known, f, True,
                                             False)))(feats)
    g_xla = jax.grad(
        lambda f: jnp.sum(_interpolate_xla(unknown, known, f)))(feats)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_xla),
                               rtol=1e-4, atol=1e-5)


def test_group_points_custom_vjp_matches_scatter(rng):
    """The one-hot-matmul backward (C >= 32) and the scatter backward
    (C < 32) must both equal the plain XLA gather autodiff: same segment
    sum, different reduction order (HIGHEST-precision matmul on 0/1 rows
    is exact per-product, so only float reassociation differs)."""
    from ws3d_tpu.ops.grouping import group_points

    def ref_group(points, idx):
        return jax.vmap(lambda p, i: p[i])(points, idx)

    for C, chunks in ((40, False), (4, False), (40, True)):
        N = 64
        points = jnp.asarray(rng.randn(2, N, C).astype(np.float32))
        # duplicate indices exercise grad accumulation
        idx = jnp.asarray(rng.randint(0, N, size=(2, 12, 6)).astype(np.int32))
        if chunks:
            import ws3d_tpu.ops.grouping as grouping_mod
            old = grouping_mod._ONEHOT_BUDGET
            grouping_mod._ONEHOT_BUDGET = 2 * N * 8  # force multiple chunks
        try:
            cot = jnp.asarray(rng.randn(2, 12, 6, C).astype(np.float32))
            f = lambda p: jnp.sum(group_points(p, idx) * cot)
            f_ref = lambda p: jnp.sum(ref_group(p, idx) * cot)
            np.testing.assert_allclose(
                np.asarray(jax.grad(f)(points)),
                np.asarray(jax.grad(f_ref)(points)), rtol=1e-5, atol=1e-5)
            # forward unchanged
            np.testing.assert_array_equal(
                np.asarray(group_points(points, idx)),
                np.asarray(ref_group(points, idx)))
        finally:
            if chunks:
                grouping_mod._ONEHOT_BUDGET = old
