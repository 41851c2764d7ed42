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

import jax
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


def _corners_xy(bev: jnp.ndarray):
    """bev (P, 5) -> corner coordinate planes (P, 4), (P, 4).

    Same corners as _bev_corners but with x/y split into separate arrays so
    every downstream op runs at (pairs, vertices) shape — pairs on sublanes,
    the small vertex axis on lanes. The (..., k, 2)-trailing layout wasted
    ~98% of each VPU lane-tile (2-wide last dim padded to 128)."""
    x1, y1, x2, y2, ang = bev[:, 0], bev[:, 1], bev[:, 2], bev[:, 3], bev[:, 4]
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    dx = jnp.stack([x1 - cx, x2 - cx, x2 - cx, x1 - cx], axis=-1)   # (P, 4)
    dy = jnp.stack([y1 - cy, y1 - cy, y2 - cy, y2 - cy], axis=-1)
    c, s = jnp.cos(ang)[:, None], jnp.sin(ang)[:, None]
    return dx * c + dy * s + cx[:, None], -dx * s + dy * c + cy[:, None]


def _point_in_bev_xy(bev: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray):
    """bev (P, 5), px/py (P, K) -> (P, K) bool (check_in_box2d:50-66)."""
    x1, y1, x2, y2, ang = bev[:, 0], bev[:, 1], bev[:, 2], bev[:, 3], bev[:, 4]
    cx, cy = ((x1 + x2) / 2)[:, None], ((y1 + y2) / 2)[:, None]
    c = jnp.cos(-ang)[:, None]
    s = jnp.sin(-ang)[:, None]
    rx = (px - cx) * c + (py - cy) * s + cx
    ry = -(px - cx) * s + (py - cy) * c + cy
    return ((rx > x1[:, None] - MARGIN) & (rx < x2[:, None] + MARGIN)
            & (ry > y1[:, None] - MARGIN) & (ry < y2[:, None] + MARGIN))


def _cross3_xy(p1x, p1y, p2x, p2y, p0x, p0y):
    """cross(p1, p2, p0) = (p1-p0) x (p2-p0) (iou3d_kernel.cu:38-40)."""
    return (p1x - p0x) * (p2y - p0y) - (p2x - p0x) * (p1y - p0y)


def _edge_intersections_xy(cax, cay, cbx, cby):
    """Corner loops (P, 4)x2 -> intersection x/y (P, 16) + valid (P, 16).

    Vectorized `intersection` (iou3d_kernel.cu:69-97) over all 4x4 edge
    pairs, including the degenerate-denominator fallback branch.
    """
    def expand(cx, cy):
        e0x, e0y = jnp.repeat(cx, 4, -1), jnp.repeat(cy, 4, -1)
        e1x = jnp.repeat(jnp.roll(cx, -1, -1), 4, -1)
        e1y = jnp.repeat(jnp.roll(cy, -1, -1), 4, -1)
        return e0x, e0y, e1x, e1y

    a0x, a0y, a1x, a1y = expand(cax, cay)                 # edge i of A, x4
    b0x = jnp.tile(cbx, (1, 4))
    b0y = jnp.tile(cby, (1, 4))
    b1x = jnp.tile(jnp.roll(cbx, -1, -1), (1, 4))
    b1y = jnp.tile(jnp.roll(cby, -1, -1), (1, 4))

    # bounding-rect early exclusion (check_rect_cross:42-48)
    rect = ((jnp.minimum(a0x, a1x) <= jnp.maximum(b0x, b1x))
            & (jnp.minimum(b0x, b1x) <= jnp.maximum(a0x, a1x))
            & (jnp.minimum(a0y, a1y) <= jnp.maximum(b0y, b1y))
            & (jnp.minimum(b0y, b1y) <= jnp.maximum(a0y, a1y)))

    # argument order follows the CUDA call intersection(p1=a1, p0=a0, q1=b1,
    # q0=b0): s1=cross(q0,p1,p0), s2=cross(p1,q1,p0), s3=cross(p0,q1,q0),
    # s4=cross(q1,p1,q0)
    s1 = _cross3_xy(b0x, b0y, a1x, a1y, a0x, a0y)
    s2 = _cross3_xy(a1x, a1y, b1x, b1y, a0x, a0y)
    s3 = _cross3_xy(a0x, a0y, b1x, b1y, b0x, b0y)
    s4 = _cross3_xy(b1x, b1y, a1x, a1y, b0x, b0y)
    valid = rect & (s1 * s2 > 0) & (s3 * s4 > 0)

    s5 = _cross3_xy(b1x, b1y, a1x, a1y, a0x, a0y)
    denom = s5 - s1
    primary = jnp.abs(denom) > EPS
    safe = jnp.where(primary, denom, 1.0)
    ix1 = (s5 * b0x - s1 * b1x) / safe
    iy1 = (s5 * b0y - s1 * b1y) / safe

    la0 = a0y - a1y
    lb0 = a1x - a0x
    lc0 = a0x * a1y - a1x * a0y
    la1 = b0y - b1y
    lb1 = b1x - b0x
    lc1 = b0x * b1y - b1x * b0y
    D = la0 * lb1 - la1 * lb0
    Dsafe = jnp.where(jnp.abs(D) > 0, D, 1.0)
    ix2 = (lb0 * lc1 - lb1 * lc0) / Dsafe
    iy2 = (la1 * lc0 - la0 * lc1) / Dsafe

    ix = jnp.where(primary, ix1, ix2)
    iy = jnp.where(primary, iy1, iy2)
    return (jnp.where(valid, ix, 0.0), jnp.where(valid, iy, 0.0), valid)


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
    """A, B (..., 5) aligned pairs -> (...) intersection area.

    Internals run pair-flattened with x/y coordinate planes split into
    separate (pairs, vertices) arrays: the pair axis rides the sublanes and
    the 24-vertex buffer the lanes. The previous (..., 24, 2)-trailing
    layout padded every op's 2-wide lane dim to 128 (~64x VPU waste) and
    cost ~35 ms per 8x(64x64) finalize NMS; this layout is ~10x faster at
    identical arithmetic."""
    shape = A.shape[:-1]
    A = A.reshape(-1, 5)
    B = B.reshape(-1, 5)
    cax, cay = _corners_xy(A)                              # (P, 4)
    cbx, cby = _corners_xy(B)
    ix, iy, inter_valid = _edge_intersections_xy(cax, cay, cbx, cby)
    a_in_b = _point_in_bev_xy(B, cax, cay)                 # (P, 4)
    b_in_a = _point_in_bev_xy(A, cbx, cby)
    px = jnp.concatenate([ix, jnp.where(a_in_b, cax, 0.0),
                          jnp.where(b_in_a, cbx, 0.0)], axis=-1)  # (P, 24)
    py = jnp.concatenate([iy, jnp.where(a_in_b, cay, 0.0),
                          jnp.where(b_in_a, cby, 0.0)], axis=-1)
    valid = jnp.concatenate([inter_valid, a_in_b, b_in_a], axis=-1)

    cnt = jnp.sum(valid, axis=-1)                          # (P,)
    denom = jnp.maximum(cnt, 1)
    cx = jnp.sum(px, axis=-1) / denom                      # (P,)
    cy = jnp.sum(py, axis=-1) / denom

    ang = jnp.arctan2(py - cy[:, None], px - cx[:, None])
    ang = jnp.where(valid, ang, 1e9)                       # invalid last
    # one multi-operand lane-axis sort co-sorts the coordinates with the
    # angle key — argsort + take_along_axis lowered to per-element dynamic
    # lane gathers that cost ~25 ms per 8x(64x64) NMS block on their own
    _, spx, spy, sorted_valid = jax.lax.sort(
        (ang, px, py, valid), dimension=-1, num_keys=1)

    poly_x = jnp.where(sorted_valid, spx, spx[:, 0:1])
    poly_y = jnp.where(sorted_valid, spy, spy[:, 0:1])
    nxt_x = jnp.roll(poly_x, -1, axis=-1)
    nxt_y = jnp.roll(poly_y, -1, axis=-1)
    cross = poly_x * nxt_y - nxt_x * poly_y
    area = jnp.abs(jnp.sum(cross, axis=-1)) / 2.0
    return jnp.where(cnt >= 3, area, 0.0).reshape(shape)


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
