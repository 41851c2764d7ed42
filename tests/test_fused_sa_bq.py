"""Interpret-mode parity tests for the fused ball-query+SA Pallas kernel."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ws3d_tpu.ops.fused_sa_bq_pallas import (fused_sa_ballquery,
                                             _xla_reference)


def _setup(rng, B=3, P=256, M=32, C=8, widths=(16, 16)):
    xyz = jnp.asarray(rng.randn(B, P, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(B, P, C).astype(np.float32))
    new_xyz = jnp.asarray(rng.randn(B, M, 3).astype(np.float32))
    kernels, biases = [], []
    cin = 3 + C
    for w in widths:
        kernels.append(jnp.asarray(rng.randn(cin, w).astype(np.float32)
                                   * 0.2))
        biases.append(jnp.asarray(rng.randn(w).astype(np.float32) * 0.1))
        cin = w
    return xyz, feats, new_xyz, kernels, biases


@pytest.mark.parametrize("radius,nsample", [(0.8, 8), (0.3, 16), (2.5, 4)])
def test_fused_sa_bq_parity(rng, radius, nsample):
    xyz, feats, new_xyz, kernels, biases = _setup(rng)
    got = fused_sa_ballquery(xyz, feats, new_xyz, radius, nsample,
                             kernels, biases, interpret=True)
    want = _xla_reference(xyz, feats, new_xyz, radius, nsample,
                          kernels, biases)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-2, rtol=2e-2)


def test_fused_sa_bq_empty_and_full_balls(rng):
    """Centers with zero in-radius points (point-0 fallback) and with more
    than nsample in-radius points (truncation) both match the XLA path."""
    xyz, feats, new_xyz, kernels, biases = _setup(rng, P=128, M=8)
    # one far-away center (empty ball), one at the centroid (overfull ball)
    new_xyz = new_xyz.at[:, 0].set(100.0)
    new_xyz = new_xyz.at[:, 1].set(0.0)
    got = fused_sa_ballquery(xyz, feats, new_xyz, 1.5, 4,
                             kernels, biases, interpret=True)
    want = _xla_reference(xyz, feats, new_xyz, 1.5, 4, kernels, biases)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-2, rtol=2e-2)


def test_fused_sa_bq_gradients(rng):
    """custom_vjp backward (XLA composition) produces finite grads matching
    the reference composition."""
    xyz, feats, new_xyz, kernels, biases = _setup(rng, B=2, P=128, M=8,
                                                  C=4, widths=(8,))

    def loss_fused(f, ks, bs):
        return jnp.sum(fused_sa_ballquery(xyz, f, new_xyz, 0.8, 4, ks, bs,
                                          interpret=True) ** 2)

    def loss_ref(f, ks, bs):
        return jnp.sum(_xla_reference(xyz, f, new_xyz, 0.8, 4, ks, bs) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(feats, tuple(kernels),
                                                 tuple(biases))
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(feats, tuple(kernels),
                                               tuple(biases))
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-2, rtol=5e-2)


def test_bn_folded_fused_matches_unfused_eval(rng, monkeypatch):
    """A BN-ful MSG stage run through the fused kernel with folded BN
    (inference) matches the unfused eval path."""
    from ws3d_tpu.models import pointnet2 as p2

    mod = p2.PointnetSAModuleMSG(npoint=16, radii=[0.8], nsamples=[8],
                                 mlps=[[16, 16]], use_bn=True)
    xyz = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(2, 128, 30).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(0), xyz, feats, train=False)
    # non-trivial running stats
    bs = jax.tree.map(lambda x: x, variables.get("batch_stats", {}))
    variables = dict(variables)
    variables["batch_stats"] = jax.tree.map(
        lambda x: x + 0.3 * np.abs(rng.randn(*x.shape)).astype(np.float32),
        bs)

    _, want = mod.apply(variables, xyz, feats, train=False)
    monkeypatch.setattr(p2, "FORCE_FUSED_INTERPRET", True)
    _, got = mod.apply(variables, xyz, feats, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-2, rtol=3e-2)
    # sanity: the two paths were actually different code paths
    assert mod._use_fused(xyz, feats, train=False)
