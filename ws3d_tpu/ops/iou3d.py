"""Rotated BEV overlap / IoU — vectorized polygon clipping, fixed buffers.

TPU-native equivalent of /root/reference/lib/utils/iou3d/src/iou3d_kernel.cu
(box_overlap:108-212, iou_bev:214-221, pairwise kernels:223-248) and the
Python composition boxes_iou3d_gpu (iou3d_utils.py:21-56).

The CUDA kernel walks edge pairs sequentially per box pair; here every box
pair evaluates a fixed 24-candidate vertex buffer (16 edge-edge intersections
+ 2x4 corner-in-box tests) fully vectorized on the VPU, followed by an
angle-sort + shoelace over the fixed buffer. Constants EPS=1e-8 and
MARGIN=1e-5 match the reference.
"""
from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-8
MARGIN = 1e-5


def _bev_corners(bev: jnp.ndarray) -> jnp.ndarray:
    """bev (..., 5) [x1, y1, x2, y2, angle] -> (..., 4, 2) rotated corners.

    Corners of the axis-aligned rect rotated around its center with the same
    orientation convention as rotate_around_center (iou3d_kernel.cu:100-104):
    new = [dx*cos + dy*sin, -dx*sin + dy*cos] + center.
    """
    x1, y1, x2, y2, ang = (bev[..., 0], bev[..., 1], bev[..., 2],
                           bev[..., 3], bev[..., 4])
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    dx = jnp.stack([x1 - cx, x2 - cx, x2 - cx, x1 - cx], axis=-1)  # (..., 4)
    dy = jnp.stack([y1 - cy, y1 - cy, y2 - cy, y2 - cy], axis=-1)
    c, s = jnp.cos(ang)[..., None], jnp.sin(ang)[..., None]
    px = dx * c + dy * s + cx[..., None]
    py = -dx * s + dy * c + cy[..., None]
    return jnp.stack([px, py], axis=-1)


def _point_in_bev(bev: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """bev (..., 5), pts (..., K, 2) -> (..., K) bool (check_in_box2d:50-66)."""
    x1, y1, x2, y2, ang = (bev[..., 0], bev[..., 1], bev[..., 2],
                           bev[..., 3], bev[..., 4])
    cx, cy = ((x1 + x2) / 2)[..., None], ((y1 + y2) / 2)[..., None]
    c = jnp.cos(-ang)[..., None]
    s = jnp.sin(-ang)[..., None]
    rx = (pts[..., 0] - cx) * c + (pts[..., 1] - cy) * s + cx
    ry = -(pts[..., 0] - cx) * s + (pts[..., 1] - cy) * c + cy
    return ((rx > x1[..., None] - MARGIN) & (rx < x2[..., None] + MARGIN)
            & (ry > y1[..., None] - MARGIN) & (ry < y2[..., None] + MARGIN))


def _edge_intersections(ca: jnp.ndarray, cb: jnp.ndarray):
    """ca, cb (..., 4, 2) corner loops -> (..., 16, 2) pts, (..., 16) valid.

    Vectorized `intersection` (iou3d_kernel.cu:69-97) over all 4x4 edge pairs,
    including the degenerate-denominator fallback branch.
    """
    a0 = jnp.repeat(ca, 4, axis=-2)                       # edge i start, x4
    a1 = jnp.repeat(jnp.roll(ca, -1, axis=-2), 4, axis=-2)  # edge i end
    b0 = jnp.tile(cb, (1,) * (cb.ndim - 2) + (4, 1))
    b1 = jnp.tile(jnp.roll(cb, -1, axis=-2), (1,) * (cb.ndim - 2) + (4, 1))

    # bounding-rect early exclusion (check_rect_cross:42-48)
    def mins(u, v):
        return jnp.minimum(u, v)

    def maxs(u, v):
        return jnp.maximum(u, v)

    rect = ((mins(a0[..., 0], a1[..., 0]) <= maxs(b0[..., 0], b1[..., 0]))
            & (mins(b0[..., 0], b1[..., 0]) <= maxs(a0[..., 0], a1[..., 0]))
            & (mins(a0[..., 1], a1[..., 1]) <= maxs(b0[..., 1], b1[..., 1]))
            & (mins(b0[..., 1], b1[..., 1]) <= maxs(a0[..., 1], a1[..., 1])))

    # argument order follows the CUDA call intersection(p1=a1, p0=a0, q1=b1,
    # q0=b0): s1=cross(q0,p1,p0), s2=cross(p1,q1,p0), s3=cross(p0,q1,q0),
    # s4=cross(q1,p1,q0)
    s1 = _cross3(b0, a1, a0)
    s2 = _cross3(a1, b1, a0)
    s3 = _cross3(a0, b1, b0)
    s4 = _cross3(b1, a1, b0)
    valid = rect & (s1 * s2 > 0) & (s3 * s4 > 0)

    s5 = _cross3(b1, a1, a0)
    denom = s5 - s1
    primary = jnp.abs(denom) > EPS
    safe = jnp.where(primary, denom, 1.0)
    ix1 = (s5 * b0[..., 0] - s1 * b1[..., 0]) / safe
    iy1 = (s5 * b0[..., 1] - s1 * b1[..., 1]) / safe

    a0_, b0_ = a0, b0
    la0 = a0_[..., 1] - a1[..., 1]
    lb0 = a1[..., 0] - a0_[..., 0]
    lc0 = a0_[..., 0] * a1[..., 1] - a1[..., 0] * a0_[..., 1]
    la1 = b0_[..., 1] - b1[..., 1]
    lb1 = b1[..., 0] - b0_[..., 0]
    lc1 = b0_[..., 0] * b1[..., 1] - b1[..., 0] * b0_[..., 1]
    D = la0 * lb1 - la1 * lb0
    Dsafe = jnp.where(jnp.abs(D) > 0, D, 1.0)
    ix2 = (lb0 * lc1 - lb1 * lc0) / Dsafe
    iy2 = (la1 * lc0 - la0 * lc1) / Dsafe

    ix = jnp.where(primary, ix1, ix2)
    iy = jnp.where(primary, iy1, iy2)
    pts = jnp.stack([ix, iy], axis=-1)
    return jnp.where(valid[..., None], pts, 0.0), valid


def _cross3(p1, p2, p0):
    """cross(p1, p2, p0) = (p1-p0) x (p2-p0) (iou3d_kernel.cu:38-40)."""
    return ((p1[..., 0] - p0[..., 0]) * (p2[..., 1] - p0[..., 1])
            - (p2[..., 0] - p0[..., 0]) * (p1[..., 1] - p0[..., 1]))


def rotated_overlap_bev(bev_a: jnp.ndarray, bev_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise rotated-rect intersection areas.

    :param bev_a: (M, 5) [x1, y1, x2, y2, angle]
    :param bev_b: (N, 5)
    :return: (M, N) intersection areas (box_overlap:108-212 vectorized)
    """
    M, N = bev_a.shape[0], bev_b.shape[0]
    A = jnp.broadcast_to(bev_a[:, None, :], (M, N, 5))
    B = jnp.broadcast_to(bev_b[None, :, :], (M, N, 5))
    return _overlap_pairs(A, B)


def _overlap_pairs(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """A, B (..., 5) aligned pairs -> (...) intersection area."""
    ca = _bev_corners(A)                                  # (..., 4, 2)
    cb = _bev_corners(B)
    inter_pts, inter_valid = _edge_intersections(ca, cb)  # (..., 16, 2)
    a_in_b = _point_in_bev(B, ca)                         # (..., 4)
    b_in_a = _point_in_bev(A, cb)
    pts = jnp.concatenate([inter_pts,
                           jnp.where(a_in_b[..., None], ca, 0.0),
                           jnp.where(b_in_a[..., None], cb, 0.0)], axis=-2)
    valid = jnp.concatenate([inter_valid, a_in_b, b_in_a], axis=-1)  # (..., 24)

    cnt = jnp.sum(valid, axis=-1)                          # (...,)
    denom = jnp.maximum(cnt, 1)
    center = jnp.sum(pts, axis=-2) / denom[..., None]      # (..., 2)

    ang = jnp.arctan2(pts[..., 1] - center[..., None, 1],
                      pts[..., 0] - center[..., None, 0])
    ang = jnp.where(valid, ang, 1e9)                       # invalid last
    order = jnp.argsort(ang, axis=-1)
    sorted_pts = jnp.take_along_axis(pts, order[..., None], axis=-2)
    sorted_valid = jnp.take_along_axis(valid, order, axis=-1)

    first = sorted_pts[..., 0:1, :]
    poly = jnp.where(sorted_valid[..., None], sorted_pts, first)
    nxt = jnp.roll(poly, -1, axis=-2)
    cross = (poly[..., 0] * nxt[..., 1] - nxt[..., 0] * poly[..., 1])
    area = jnp.abs(jnp.sum(cross, axis=-1)) / 2.0
    return jnp.where(cnt >= 3, area, 0.0)


def boxes_iou_bev(bev_a: jnp.ndarray, bev_b: jnp.ndarray) -> jnp.ndarray:
    """(M, 5) x (N, 5) -> (M, N) rotated BEV IoU (iou_bev:214-221)."""
    sa = ((bev_a[:, 2] - bev_a[:, 0]) * (bev_a[:, 3] - bev_a[:, 1]))[:, None]
    sb = ((bev_b[:, 2] - bev_b[:, 0]) * (bev_b[:, 3] - bev_b[:, 1]))[None, :]
    inter = rotated_overlap_bev(bev_a, bev_b)
    return inter / jnp.maximum(sa + sb - inter, EPS)


def boxes_iou3d(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray):
    """(N, 7) x (M, 7) bottom-y boxes -> (iou2d, iou3d) each (N, M).

    Mirrors boxes_iou3d_gpu (iou3d_utils.py:21-56): y is down so the vertical
    extent is [y - h, y]; BEV overlap x height overlap over volumes.
    """
    from ws3d_tpu.ops.boxes import boxes3d_to_bev
    bev_a = boxes3d_to_bev(boxes_a)
    bev_b = boxes3d_to_bev(boxes_b)
    overlaps_bev = rotated_overlap_bev(bev_a, bev_b)

    a_min = (boxes_a[:, 1] - boxes_a[:, 3])[:, None]
    a_max = boxes_a[:, 1][:, None]
    b_min = (boxes_b[:, 1] - boxes_b[:, 3])[None, :]
    b_max = boxes_b[:, 1][None, :]
    overlaps_h = jnp.clip(jnp.minimum(a_max, b_max) - jnp.maximum(a_min, b_min),
                          min=0.0)

    s_a = (boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    s_b = (boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    iou2d = overlaps_bev / jnp.maximum(s_a + s_b - overlaps_bev, 1e-7)

    overlaps_3d = overlaps_bev * overlaps_h
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    iou3d = overlaps_3d / jnp.maximum(vol_a + vol_b - overlaps_3d, 1e-7)
    return iou2d, iou3d


def aligned_overlap_bev(bev_a: jnp.ndarray, bev_b: jnp.ndarray) -> jnp.ndarray:
    """Axis-aligned pairwise IoU ignoring the angle (iou_normal:306-320),
    used by NMS_TYPE=normal. (M, 5) x (N, 5) -> (M, N)."""
    lx = jnp.maximum(bev_a[:, None, 0], bev_b[None, :, 0])
    ly = jnp.maximum(bev_a[:, None, 1], bev_b[None, :, 1])
    rx = jnp.minimum(bev_a[:, None, 2], bev_b[None, :, 2])
    ry = jnp.minimum(bev_a[:, None, 3], bev_b[None, :, 3])
    inter = jnp.clip(rx - lx, min=0.0) * jnp.clip(ry - ly, min=0.0)
    sa = ((bev_a[:, 2] - bev_a[:, 0]) * (bev_a[:, 3] - bev_a[:, 1]))[:, None]
    sb = ((bev_b[:, 2] - bev_b[:, 0]) * (bev_b[:, 3] - bev_b[:, 1]))[None, :]
    return inter / jnp.maximum(sa + sb - inter, EPS)
