"""Pallas fused multi-scale ball query vs the XLA path (interpret mode)."""
import jax.numpy as jnp
import numpy as np
import pytest

from ws3d_tpu.ops.ball_query_pallas import ball_query_pallas
from ws3d_tpu.ops.grouping import ball_query_multi


@pytest.mark.parametrize("n,m,radii,ks", [
    (512, 64, [0.5, 1.5], [8, 16]),
    (256, 32, [1.0], [4]),
    (128, 16, [0.2, 0.8], [2, 4]),
])
def test_pallas_ball_query_matches_xla(rng, n, m, radii, ks):
    xyz = jnp.asarray(rng.randn(2, n, 3).astype(np.float32) * 3)
    new_xyz = jnp.asarray(rng.randn(2, m, 3).astype(np.float32) * 3)
    ref = ball_query_multi(radii, ks, xyz, new_xyz)
    got = ball_query_pallas(radii, ks, xyz, new_xyz, interpret=True)
    for s in range(len(radii)):
        np.testing.assert_array_equal(np.asarray(ref[s]), np.asarray(got[s]))


def test_pallas_ball_query_empty_and_pad(rng):
    # centers far from all points -> all-zero indices; sparse -> pad w/ first
    xyz = jnp.asarray(rng.randn(1, 128, 3).astype(np.float32) * 0.1)
    new_xyz = jnp.asarray(np.array([[[50.0, 50, 50], [0, 0, 0]] * 4],
                                   np.float32))
    ref = ball_query_multi([0.5], [8], xyz, new_xyz)
    got = ball_query_pallas([0.5], [8], xyz, new_xyz, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
    assert (np.asarray(got[0])[0, 0] == 0).all()   # empty center -> zeros
