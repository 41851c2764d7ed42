import numpy as np
import jax.numpy as jnp

from ws3d_tpu.ops.roipool import _first_k_wraparound, cylinder_crop, roipool3d


def test_first_k_wraparound_duplication():
    mask = jnp.asarray(np.array([
        [0, 1, 0, 1, 1, 0, 0, 0],   # cnt=3 -> 1,3,4,1,3 (k % cnt wrap)
        [0, 0, 0, 0, 0, 0, 0, 0],   # empty
        [1, 1, 1, 1, 1, 1, 1, 1],   # full
    ], bool))
    idx, empty = _first_k_wraparound(mask, 5)
    np.testing.assert_array_equal(np.asarray(idx[0]), [1, 3, 4, 1, 3])
    np.testing.assert_array_equal(np.asarray(idx[1]), 0)
    np.testing.assert_array_equal(np.asarray(idx[2]), [0, 1, 2, 3, 4])
    assert np.asarray(empty).tolist() == [False, True, False]


def test_roipool3d_selects_in_box_points(rng):
    pts = np.concatenate([
        rng.uniform(-0.4, 0.4, (20, 3)),            # inside unit-ish box
        rng.uniform(5, 6, (30, 3)),                  # far away
    ]).astype(np.float32)
    pts[:, 1] = np.abs(pts[:, 1]) * 0.4              # y in [0, ~0.4]
    feats = rng.randn(50, 2).astype(np.float32)
    boxes = np.array([[0, 0.5, 0, 1.0, 1.0, 1.0, 0.0],
                      [100, 0, 100, 1.0, 1.0, 1.0, 0.0]], np.float32)
    pooled, empty = roipool3d(jnp.asarray(pts), jnp.asarray(feats),
                              jnp.asarray(boxes), extra_width=0.2,
                              num_sampled=32)
    assert np.asarray(empty).tolist() == [False, True]
    got = np.asarray(pooled[0])
    # all pooled xyz must come from the first 20 points
    assert got.shape == (32, 5)
    for row in got:
        dists = np.linalg.norm(pts[:20] - row[:3], axis=1)
        assert dists.min() < 1e-5
    np.testing.assert_allclose(np.asarray(pooled[1]), 0.0)


def test_cylinder_crop_recenters(rng):
    pts = rng.uniform(-1, 1, (40, 3)).astype(np.float32)
    pts[:20, 0] += 10.0  # cluster near x=10
    feats = rng.randn(40, 1).astype(np.float32)
    centers = np.array([[10.0, 0.0]], np.float32)
    xyz, f, empty = cylinder_crop(jnp.asarray(pts), jnp.asarray(feats),
                                  jnp.asarray(centers), radius=3.0,
                                  num_sampled=16)
    assert not bool(empty[0])
    got = np.asarray(xyz[0])
    # recentered: x values near 0 now
    assert np.abs(got[:, 0]).max() < 3.0
    # selected only from the first 20 points (the in-radius cluster)
    for row in got:
        orig = row + np.array([10.0, 0.0, 0.0])
        dists = np.linalg.norm(pts[:20] - orig, axis=1)
        assert dists.min() < 1e-5
