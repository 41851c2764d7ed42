"""3D box geometry in KITTI rect-camera coordinates (x right, y down, z fwd).

Box layout is the reference 7-DoF convention ``(x, y, z, h, w, l, ry)`` with
``y`` at the *bottom* face center and ``ry`` the heading around +y.
Mirrors the behavior of /root/reference/lib/utils/kitti_utils.py
(boxes3d_to_corners3d:66-101, boxes3d_to_bev_torch:134-147,
enlarge_box3d:150-160) as fixed-shape, batch-first jnp code.
"""
from __future__ import annotations

import jax.numpy as jnp

# corner ordering: 4 bottom corners then 4 top corners, counter-clockwise in
# BEV when seen from +y (down): (l/2,w/2), (l/2,-w/2), (-l/2,-w/2), (-l/2,w/2)
_X_SIGNS = jnp.array([0.5, 0.5, -0.5, -0.5, 0.5, 0.5, -0.5, -0.5])
_Z_SIGNS = jnp.array([0.5, -0.5, -0.5, 0.5, 0.5, -0.5, -0.5, 0.5])
_Y_SIGNS = jnp.array([0.0, 0.0, 0.0, 0.0, -1.0, -1.0, -1.0, -1.0])


def rotation_matrix_y(angle: jnp.ndarray) -> jnp.ndarray:
    """(...,) -> (..., 3, 3) rotation about +y: R = [[c,0,s],[0,1,0],[-s,0,c]].

    Matches get_rotation_matrix in the reference rcnn_net.py:232-239.
    """
    c, s = jnp.cos(angle), jnp.sin(angle)
    zeros, ones = jnp.zeros_like(c), jnp.ones_like(c)
    rows = jnp.stack([
        jnp.stack([c, zeros, s], axis=-1),
        jnp.stack([zeros, ones, zeros], axis=-1),
        jnp.stack([-s, zeros, c], axis=-1),
    ], axis=-2)
    return rows


def rotate_points_along_y(points: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotate ``points (..., N, 3+C)`` by ``angle (...)`` around +y.

    Same (x, z) update as the reference rotate_pc_along_y_torch
    (kitti_utils.py:45-63): x' = x*cos - z*sin, z' = x*sin + z*cos.
    Extra channels beyond xyz pass through untouched.
    """
    c = jnp.cos(angle)[..., None]
    s = jnp.sin(angle)[..., None]
    x, z = points[..., 0], points[..., 2]
    xr = x * c - z * s
    zr = x * s + z * c
    return jnp.concatenate(
        [xr[..., None], points[..., 1:2], zr[..., None], points[..., 3:]], axis=-1
    )


def boxes3d_to_corners3d(boxes3d: jnp.ndarray) -> jnp.ndarray:
    """(..., 7) -> (..., 8, 3) box corners.

    Bottom 4 corners first (y = box y), then top 4 (y = box y - h),
    reproducing kitti_utils.boxes3d_to_corners3d:66-101.
    """
    h, w, l = boxes3d[..., 3], boxes3d[..., 4], boxes3d[..., 5]
    ry = boxes3d[..., 6]
    x_c = l[..., None] * _X_SIGNS          # (..., 8)
    z_c = w[..., None] * _Z_SIGNS
    y_c = h[..., None] * _Y_SIGNS
    c, s = jnp.cos(ry)[..., None], jnp.sin(ry)[..., None]
    # R @ [x, y, z]: x' = c*x + s*z ; z' = -s*x + c*z  (matches the torch
    # variant boxes3d_to_corners3d_torch which uses R=[[c,0,s],[0,1,0],[-s,0,c]])
    xr = c * x_c + s * z_c
    zr = -s * x_c + c * z_c
    corners = jnp.stack([xr, y_c, zr], axis=-1)  # (..., 8, 3)
    return corners + boxes3d[..., None, 0:3]


def boxes3d_to_bev(boxes3d: jnp.ndarray) -> jnp.ndarray:
    """(..., 7) -> (..., 5) rotated BEV rep [x1, z1, x2, z2, ry].

    Same encoding as boxes3d_to_bev_torch (kitti_utils.py:134-147): an
    axis-aligned (l, w) extent around (x, z) plus the heading angle.
    """
    cu, cv = boxes3d[..., 0], boxes3d[..., 2]
    half_l, half_w = boxes3d[..., 5] / 2, boxes3d[..., 4] / 2
    return jnp.stack(
        [cu - half_l, cv - half_w, cu + half_l, cv + half_w, boxes3d[..., 6]],
        axis=-1,
    )


def enlarge_box3d(boxes3d: jnp.ndarray, extra_width: float) -> jnp.ndarray:
    """Grow each dim by 2*extra_width and push bottom y down by extra_width
    (kitti_utils.enlarge_box3d:150-160)."""
    return jnp.concatenate([
        boxes3d[..., 0:1],
        boxes3d[..., 1:2] + extra_width,
        boxes3d[..., 2:3],
        boxes3d[..., 3:6] + extra_width * 2,
        boxes3d[..., 6:],
    ], axis=-1)


def points_in_rotated_boxes(points: jnp.ndarray, boxes3d: jnp.ndarray) -> jnp.ndarray:
    """Point-in-rotated-3D-box test.

    :param points: (N, 3)
    :param boxes3d: (M, 7) bottom-y boxes
    :return: (N, M) bool

    Same test as the reference roipool3d pt_in_box3d
    (lib/utils/roipool3d/src/roipool3d_kernel.cu:14-28): |dy - cy| <= h/2 with
    cy the box *vertical center* (y - h/2), and (x, z) rotated into the box
    frame compared against l/2, w/2.
    """
    shift = points[:, None, :] - boxes3d[None, :, 0:3]       # (N, M, 3)
    h, w, l = boxes3d[:, 3], boxes3d[:, 4], boxes3d[:, 5]
    ry = boxes3d[:, 6]
    cy = -h / 2.0  # box vertical center relative to bottom-y
    c, s = jnp.cos(ry), jnp.sin(ry)
    # rotate offsets into the box frame (inverse of the corner transform):
    # x_loc = c*dx - s*dz ; z_loc = s*dx + c*dz  (roipool3d_kernel.cu:22-24)
    x_loc = shift[..., 0] * c - shift[..., 2] * s
    z_loc = shift[..., 0] * s + shift[..., 2] * c
    in_x = jnp.abs(x_loc) <= l / 2.0
    in_z = jnp.abs(z_loc) <= w / 2.0
    in_y = jnp.abs(shift[..., 1] - cy) <= h / 2.0
    return in_x & in_y & in_z
