"""Fused SA kernel (gather+MLP+maxpool) vs the XLA composition, value and
gradient, in interpret mode."""
import jax
import jax.numpy as jnp
import numpy as np

from ws3d_tpu.ops.fused_sa_pallas import (fused_sa_single_scale,
                                          _xla_reference)
from ws3d_tpu.ops.grouping import ball_query


def _setup(rng, B=2, P=512, C=16, M=64, S=16):
    xyz = jnp.asarray(rng.randn(B, P, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(B, P, C).astype(np.float32))
    new_xyz = jnp.asarray(rng.randn(B, M, 3).astype(np.float32))
    idx = ball_query(1.0, S, xyz, new_xyz)
    ks, bs = [], []
    cin = 3 + C
    for c in (32, 32, 64):
        ks.append(jnp.asarray(rng.randn(cin, c).astype(np.float32) * 0.1))
        bs.append(jnp.asarray(rng.randn(c).astype(np.float32) * 0.1))
        cin = c
    return xyz, feats, new_xyz, idx, ks, bs


def test_fused_sa_value_parity(rng):
    xyz, feats, new_xyz, idx, ks, bs = _setup(rng)
    ref = _xla_reference(xyz, feats, new_xyz, idx, ks, bs)
    got = fused_sa_single_scale(xyz, feats, new_xyz, idx, ks, bs,
                                interpret=True)
    # the kernel gathers in bf16 (see fused_sa_pallas) -> bf16-level match
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=2e-2, atol=2e-2)


def test_fused_sa_gradient_parity(rng):
    xyz, feats, new_xyz, idx, ks, bs = _setup(rng, P=256, M=32)

    def loss_fused(args):
        x, f, k_, b_ = args
        return jnp.sum(fused_sa_single_scale(x, f, new_xyz, idx, k_, b_,
                                             interpret=True) ** 2)

    def loss_ref(args):
        x, f, k_, b_ = args
        return jnp.sum(_xla_reference(x, f, new_xyz, idx, k_, b_) ** 2)

    g1 = jax.grad(loss_fused)((xyz, feats, tuple(ks), tuple(bs)))
    g2 = jax.grad(loss_ref)((xyz, feats, tuple(ks), tuple(bs)))
    # backward is the exact f32 XLA vjp; only the forward's bf16 gather
    # perturbs the cotangent entering it
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=5e-2)
