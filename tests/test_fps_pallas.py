"""Pallas FPS kernel vs the lax.scan reference (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np
import pytest

from ws3d_tpu.ops.sampling import _fps_scan, _fps_pallas


def _fps_pallas_interpret(xyz, npoint):
    return _fps_pallas(xyz, npoint, interpret=True)


@pytest.mark.parametrize("n,npoint", [(128, 32), (256, 64)])
def test_pallas_fps_matches_scan(rng, n, npoint):
    xyz = jnp.asarray(rng.randn(2, n, 3).astype(np.float32))
    a = np.asarray(_fps_scan(xyz, npoint))
    b = np.asarray(_fps_pallas_interpret(xyz, npoint))
    np.testing.assert_array_equal(a, b)


def test_pallas_fps_first_index_zero(rng):
    xyz = jnp.asarray(rng.randn(1, 64, 3).astype(np.float32))
    out = np.asarray(_fps_pallas_interpret(xyz, 16))
    assert out[0, 0] == 0
    assert len(set(out[0].tolist())) == 16   # distinct picks
