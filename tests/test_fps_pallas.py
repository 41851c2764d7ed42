"""Pallas FPS kernel vs the lax.scan reference (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np
import pytest

from ws3d_tpu.ops.sampling import _fps_scan, _fps_pallas, gather_points


def _fps_pallas_interpret(xyz, npoint):
    return _fps_pallas(xyz, npoint, interpret=True)


@pytest.mark.parametrize("n,npoint", [(128, 32), (256, 64)])
def test_pallas_fps_matches_scan(rng, n, npoint):
    xyz = jnp.asarray(rng.randn(2, n, 3).astype(np.float32))
    a = np.asarray(_fps_scan(xyz, npoint))
    b, coords = _fps_pallas_interpret(xyz, npoint)
    np.testing.assert_array_equal(a, np.asarray(b))
    # emitted coordinates == gather of the emitted indices
    np.testing.assert_allclose(np.asarray(coords),
                               np.asarray(gather_points(xyz, b)))


def test_pallas_fps_first_index_zero(rng):
    xyz = jnp.asarray(rng.randn(1, 64, 3).astype(np.float32))
    out, coords = _fps_pallas_interpret(xyz, 16)
    out = np.asarray(out)
    assert out[0, 0] == 0
    assert len(set(out[0].tolist())) == 16   # distinct picks
    np.testing.assert_allclose(np.asarray(coords)[0, 0],
                               np.asarray(xyz)[0, 0])


def test_pallas_fps_multichunk_coords(rng):
    """npoint > 128 exercises the chunked flush path for all four outputs."""
    xyz = jnp.asarray(rng.randn(1, 512, 3).astype(np.float32))
    a = np.asarray(_fps_scan(xyz, 256))
    b, coords = _fps_pallas_interpret(xyz, 256)
    np.testing.assert_array_equal(a, np.asarray(b))
    np.testing.assert_allclose(np.asarray(coords),
                               np.asarray(gather_points(xyz, b)))
