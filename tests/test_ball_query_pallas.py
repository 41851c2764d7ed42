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


def test_wrap_pad_matches_first_k_wraparound(rng):
    """wrap_pad mode reproduces roipool's s % cnt duplication + counts."""
    import jax.numpy as jnp
    from ws3d_tpu.ops.ball_query_pallas import ball_query_pallas
    from ws3d_tpu.ops.roipool import _first_k_wraparound

    B, N, M, S = 2, 256, 16, 12
    xyz = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    new = jnp.asarray(rng.randn(B, M, 3).astype(np.float32))
    new = new.at[:, 0].set(50.0)          # one empty center
    (idx,), (cnt,) = ball_query_pallas([0.9], [S], xyz, new,
                                       interpret=True, wrap_pad=True)
    d2 = jnp.sum(jnp.square(new[:, :, None] - xyz[:, None]), -1)
    for b in range(B):
        want_idx, want_empty = _first_k_wraparound(
            np.asarray(d2[b]) < 0.9 * 0.9, S)
        np.testing.assert_array_equal(np.asarray(idx[b]),
                                      np.asarray(want_idx))
        np.testing.assert_array_equal(np.asarray(cnt[b]) == 0,
                                      np.asarray(want_empty))
