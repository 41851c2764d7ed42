import numpy as np
import jax.numpy as jnp

from ws3d_tpu.ops.boxes import (
    boxes3d_to_bev,
    boxes3d_to_corners3d,
    enlarge_box3d,
    points_in_rotated_boxes,
    rotate_points_along_y,
    rotation_matrix_y,
)


def _np_corners(box):
    """Independent numpy corner construction for cross-checking."""
    x, y, z, h, w, l, ry = box
    xs = np.array([l / 2, l / 2, -l / 2, -l / 2] * 2)
    zs = np.array([w / 2, -w / 2, -w / 2, w / 2] * 2)
    ys = np.array([0.0] * 4 + [-h] * 4)
    c, s = np.cos(ry), np.sin(ry)
    xr = c * xs + s * zs
    zr = -s * xs + c * zs
    return np.stack([xr + x, ys + y, zr + z], axis=-1)


def test_corners_match_reference_convention(rng):
    boxes = rng.rand(10, 7).astype(np.float32)
    boxes[:, 3:6] += 1.0
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, 10)
    got = np.asarray(boxes3d_to_corners3d(jnp.asarray(boxes)))
    want = np.stack([_np_corners(b) for b in boxes])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_corners_axis_aligned():
    box = jnp.array([[1.0, 2.0, 3.0, 1.5, 1.6, 3.9, 0.0]])
    c = np.asarray(boxes3d_to_corners3d(box))[0]
    assert np.isclose(c[:, 0].max(), 1.0 + 3.9 / 2)
    assert np.isclose(c[:, 2].max(), 3.0 + 1.6 / 2)
    assert np.isclose(c[:, 1].min(), 2.0 - 1.5)  # top face (y down)
    assert np.isclose(c[:, 1].max(), 2.0)        # bottom face


def test_rotation_roundtrip(rng):
    pts = jnp.asarray(rng.randn(4, 16, 3).astype(np.float32))
    ang = jnp.asarray(rng.uniform(-np.pi, np.pi, 4).astype(np.float32))
    back = rotate_points_along_y(rotate_points_along_y(pts, ang), -ang)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)


def test_rotation_matrix_consistent_with_rotate(rng):
    pts = jnp.asarray(rng.randn(1, 8, 3).astype(np.float32))
    ang = jnp.asarray(np.float32(0.7))
    R = rotation_matrix_y(ang)
    # reference canonicalization xyz @ R(-ry)^T (rcnn_net.py:342-343) equals
    # rotate_points_along_y(xyz, +ry): applying R(-a) to a point is the same
    # as the (x,z)-plane rotation by +a in the rotate_pc convention.
    viaR = jnp.einsum("bnk,kl->bnl", pts, rotation_matrix_y(-ang).T)
    direct = rotate_points_along_y(pts, ang)
    np.testing.assert_allclose(np.asarray(viaR), np.asarray(direct), atol=1e-5)
    assert R.shape == (3, 3)


def test_bev_and_enlarge():
    box = jnp.array([[5.0, 1.0, 10.0, 2.0, 1.5, 4.0, 0.3]])
    bev = np.asarray(boxes3d_to_bev(box))[0]
    np.testing.assert_allclose(bev, [5 - 2, 10 - 0.75, 5 + 2, 10 + 0.75, 0.3],
                               atol=1e-6)
    big = np.asarray(enlarge_box3d(box, 0.5))[0]
    np.testing.assert_allclose(big, [5, 1.5, 10, 3.0, 2.5, 5.0, 0.3], atol=1e-6)


def test_points_in_rotated_boxes(rng):
    box = jnp.array([[0.0, 0.0, 0.0, 2.0, 1.0, 4.0, np.pi / 2]])
    # after the pi/2 rotation, the long axis (l=4) lies along z
    pts = jnp.array([
        [0.0, -0.5, 0.0],    # inside
        [0.0, -0.5, 1.9],    # inside (long axis along z now)
        [1.9, -0.5, 0.0],    # outside (x beyond w/2)
        [0.0, -3.0, 0.0],    # outside in y
        [0.0, 0.99, 0.0],    # y in [bottom-h, bottom]... y down: [-2, 0]
    ])
    got = np.asarray(points_in_rotated_boxes(pts, box))[:, 0]
    assert list(got) == [True, True, False, False, False]

    # corners of a random box must test as inside (shrunk slightly)
    b = np.array([[3.0, 1.0, 8.0, 1.5, 1.6, 3.9, 0.77]], np.float32)
    corners = np.asarray(boxes3d_to_corners3d(jnp.asarray(b)))[0]
    inner = corners * 0.99 + np.array([3.0, 1.0 - 0.75, 8.0]) * 0.01
    got = np.asarray(points_in_rotated_boxes(jnp.asarray(inner), jnp.asarray(b)))
    assert got.all()
