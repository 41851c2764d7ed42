"""Interpret-mode parity of the windowed fused-SA kernel
(ops/fused_sa_window_pallas.py) against the unfused XLA composition, on
z-SORTED inputs (the kernel's contract)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ws3d_tpu.ops.fused_sa_bq_pallas import _xla_reference
from ws3d_tpu.ops.fused_sa_window_pallas import fused_sa_window


def _sorted_cloud(rng, B, P, C, spread=3.0, cluster=False):
    xyz = rng.randn(B, P, 3).astype(np.float32) * spread
    if cluster:
        # strongly non-uniform z density: half the points in a thin slab —
        # exercises variable window sizes
        half = P // 2
        xyz[:, :half, 2] = rng.randn(B, half).astype(np.float32) * 0.3
    xyz = xyz[np.arange(B)[:, None], np.argsort(xyz[..., 2], axis=1)]
    feats = rng.rand(B, P, C).astype(np.float32)
    return xyz, feats


def _mlp(rng, cin, widths):
    kernels, biases = [], []
    for w in widths:
        kernels.append(rng.randn(cin, w).astype(np.float32) * 0.3)
        biases.append(rng.randn(w).astype(np.float32) * 0.1)
        cin = w
    return kernels, biases


def _run(xyz, feats, new_xyz, radius, S, kernels, biases, atol=2e-2):
    ref = _xla_reference(jnp.asarray(xyz), jnp.asarray(feats),
                         jnp.asarray(new_xyz), radius, S,
                         [jnp.asarray(k) for k in kernels],
                         [jnp.asarray(b) for b in biases])
    got = fused_sa_window(jnp.asarray(xyz), jnp.asarray(feats),
                          jnp.asarray(new_xyz), radius, S,
                          [jnp.asarray(k) for k in kernels],
                          [jnp.asarray(b) for b in biases], interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=atol, rtol=2e-2)


@pytest.mark.parametrize("radius,S", [(0.5, 16), (1.5, 32)])
def test_window_parity_uniform(radius, S):
    rng = np.random.RandomState(0)
    B, P, M, C = 2, 1024, 64, 1
    xyz, feats = _sorted_cloud(rng, B, P, C)
    qidx = np.sort(rng.choice(P, M, replace=False))
    new_xyz = xyz[:, qidx]
    kernels, biases = _mlp(rng, 3 + C, [16, 16, 32])
    _run(xyz, feats, new_xyz, radius, S, kernels, biases)


def test_window_parity_clustered_density():
    rng = np.random.RandomState(1)
    B, P, M, C = 2, 2048, 128, 4
    xyz, feats = _sorted_cloud(rng, B, P, C, cluster=True)
    qidx = np.sort(rng.choice(P, M, replace=False))
    new_xyz = xyz[:, qidx]
    kernels, biases = _mlp(rng, 3 + C, [16, 32])
    _run(xyz, feats, new_xyz, 0.4, 16, kernels, biases)


def test_window_parity_trunk_shape():
    """Stage-2 crop shape (P=512, M=256, wide C): MTsub=64 with n_sub=4
    query subtiles per program — the in-program windowing path the RCNN
    trunk dispatches to."""
    rng = np.random.RandomState(7)
    B, P, M, C = 3, 512, 256, 128
    xyz, feats = _sorted_cloud(rng, B, P, C, spread=1.5, cluster=True)
    qidx = np.sort(rng.choice(P, M, replace=False))
    new_xyz = xyz[:, qidx]
    kernels, biases = _mlp(rng, 3 + C, [32, 32])
    # wide-C reductions make the kernel's bf16-multiplicand rounding larger
    # than the narrow-C cases (reference composition is f32 on CPU)
    _run(xyz, feats, new_xyz, 0.2, 16, kernels, biases, atol=5e-2)


def test_window_parity_crop_batched():
    """B=8 crops at the trunk shape with M//MT == 1 triggers the G-blocked
    path (multiple crops per program, shared deep-MLP matmul) — parity with
    the XLA composition must be crop-exact."""
    from ws3d_tpu.ops import fused_sa_window_pallas as mod

    rng = np.random.RandomState(11)
    B, P, M, C = 8, 512, 256, 16
    xyz, feats = _sorted_cloud(rng, B, P, C, spread=1.5, cluster=True)
    qidx = np.sort(rng.choice(P, M, replace=False))
    new_xyz = xyz[:, qidx]
    kernels, biases = _mlp(rng, 3 + C, [32, 32])
    _run(xyz, feats, new_xyz, 0.3, 16, kernels, biases, atol=5e-2)


def test_window_empty_centers_take_point0():
    """Centers far outside the cloud: CUDA zero-on-empty -> point-0 row."""
    rng = np.random.RandomState(2)
    B, P, M, C = 1, 512, 8, 1
    xyz, feats = _sorted_cloud(rng, B, P, C, spread=1.0)
    new_xyz = np.full((B, M, 3), 50.0, np.float32)
    new_xyz[:, :, 2] = np.linspace(40.0, 60.0, M)   # sorted, all empty
    kernels, biases = _mlp(rng, 3 + C, [16])
    _run(xyz, feats, new_xyz, 0.5, 16, kernels, biases)


def test_window_pad_with_first_sparse():
    """Tiny radius: most centers have 1-3 neighbors -> pad-with-first path."""
    rng = np.random.RandomState(3)
    B, P, M, C = 2, 1024, 64, 2
    xyz, feats = _sorted_cloud(rng, B, P, C, spread=5.0)
    qidx = np.sort(rng.choice(P, M, replace=False))
    new_xyz = xyz[:, qidx]
    kernels, biases = _mlp(rng, 3 + C, [16, 16])
    _run(xyz, feats, new_xyz, 0.15, 16, kernels, biases)


def test_window_gradient_flows():
    """custom_vjp backward (XLA composition) produces finite grads."""
    rng = np.random.RandomState(4)
    B, P, M, C = 1, 512, 16, 1
    xyz, feats = _sorted_cloud(rng, B, P, C)
    new_xyz = xyz[:, np.sort(rng.choice(P, M, replace=False))]
    kernels, biases = _mlp(rng, 3 + C, [16])

    def loss(f, ks, bs):
        out = fused_sa_window(jnp.asarray(xyz), f, jnp.asarray(new_xyz),
                              0.5, 8, ks, bs, interpret=True)
        return jnp.sum(out ** 2)

    g_f, g_k, g_b = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(feats), tuple(jnp.asarray(k) for k in kernels),
        tuple(jnp.asarray(b) for b in biases))
    for g in (g_f,) + tuple(g_k) + tuple(g_b):
        assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g_f).sum()) > 0


def test_sa_module_window_dispatch_matches_xla(monkeypatch):
    """A BN-ful SA-1-shaped MSG stage (small C, large N, sorted_points) run
    through the WINDOWED kernel with folded BN matches the unfused eval
    path on sorted inputs."""
    from ws3d_tpu.models import pointnet2 as p2

    rng = np.random.RandomState(5)
    mod = p2.PointnetSAModuleMSG(npoint=64, radii=[0.2, 0.6],
                                 nsamples=[8, 16], mlps=[[16, 16], [16, 32]],
                                 use_bn=True, sorted_points=True)
    xyz = rng.randn(2, 2048, 3).astype(np.float32) * 3
    xyz = xyz[np.arange(2)[:, None], np.argsort(xyz[..., 2], axis=1)]
    xyz = jnp.asarray(xyz)
    feats = jnp.asarray(rng.randn(2, 2048, 1).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(0), xyz, feats, train=False)
    variables = dict(variables)
    variables["batch_stats"] = jax.tree.map(
        lambda x: x + 0.3 * np.abs(np.random.RandomState(6)
                                   .randn(*x.shape)).astype(np.float32),
        variables.get("batch_stats", {}))

    assert not mod._use_window(xyz, feats, train=False)    # CPU backend
    _, want = mod.apply(variables, xyz, feats, train=False)
    monkeypatch.setattr(p2, "FORCE_FUSED_INTERPRET", True)
    assert mod._use_window(xyz, feats, train=False)
    _, got = mod.apply(variables, xyz, feats, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-2, rtol=3e-2)


def test_sorted_points_sorts_fps_picks():
    """sorted_points re-sorts the FPS picks so new_xyz stays z-sorted and
    the invariant propagates to the next stage."""
    from ws3d_tpu.models import pointnet2 as p2

    rng = np.random.RandomState(7)
    mod = p2.PointnetSAModuleMSG(npoint=32, radii=[0.8], nsamples=[8],
                                 mlps=[[8]], use_bn=False,
                                 sorted_points=True)
    xyz = rng.randn(1, 256, 3).astype(np.float32)
    xyz = xyz[:, np.argsort(xyz[0, :, 2])]
    feats = rng.rand(1, 256, 1).astype(np.float32)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(xyz),
                         jnp.asarray(feats), train=False)
    new_xyz, _ = mod.apply(variables, jnp.asarray(xyz), jnp.asarray(feats),
                           train=False)
    z = np.asarray(new_xyz)[0, :, 2]
    assert np.all(np.diff(z) >= 0)


def test_window_early_exit_saturation_exact():
    """Dense slab: every query sees far more than S in-ball points, so the
    saturation early-exit (stop once min in-ball count >= S) triggers tiles
    before t_end. Output must be bit-identical to the full-window sweep —
    skipped tiles can only hold ranks > S, which match no slot target."""
    from ws3d_tpu.ops.fused_sa_window_pallas import _pallas_forward

    rng = np.random.RandomState(5)
    B, P, M, C, S = 2, 1024, 64, 4, 8
    # thin z-slab: windows span many tiles, counts saturate S immediately
    xyz = rng.randn(B, P, 3).astype(np.float32) * 0.2
    xyz = xyz[np.arange(B)[:, None], np.argsort(xyz[..., 2], axis=1)]
    feats = rng.rand(B, P, C).astype(np.float32)
    qidx = np.sort(rng.choice(P, M, replace=False))
    new_xyz = xyz[:, qidx]
    kernels, biases = _mlp(rng, 3 + C, [16, 16])
    args = (jnp.asarray(xyz), jnp.asarray(feats), jnp.asarray(new_xyz),
            1.0, S, tuple(jnp.asarray(k) for k in kernels),
            tuple(jnp.asarray(b) for b in biases))
    full = _pallas_forward(*args, interpret=True, early_exit=False)
    fast = _pallas_forward(*args, interpret=True, early_exit=True)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(full))
