"""Differentiable rotated 3D IoU / GIoU losses.

Equivalent of /root/reference/lib/utils/gious.py (1378 lines of hand-written
autograd polygon clipping: compute_vertex:17, sort_vertex:300,
area_polygon:367, rinter_area_compute:572, mbr_area_compute:646,
ious_3D:996-1056, gious_3D:897) and the wrappers in giou_utils.py:262-290.

Here the whole thing is ~100 lines: the vertex-enumeration overlap in
ws3d_tpu.ops.iou3d is plain jnp, so jax.grad differentiates it directly —
no custom autograd Functions. The GIoU enclosing term uses the convex hull
of both boxes' BEV corners (angle-sort + shoelace over a fixed 8-vertex
buffer) x the enclosing height interval.
"""
from __future__ import annotations

import jax.numpy as jnp

from ws3d_tpu.ops.boxes import boxes3d_to_bev
from ws3d_tpu.ops.iou3d import _bev_corners, _overlap_pairs


def _hull_area_8(pts: jnp.ndarray) -> jnp.ndarray:
    """pts (..., 8, 2) -> (...) area of the convex hull.

    Angle-sort around the centroid + shoelace. Exact for the union of two
    convex quads whenever all 8 points are hull vertices; for interior
    points the shoelace over the angular order still upper-bounds the union
    and lower-bounds the true MBR only negligibly — matching the reference's
    mbr_area_compute tolerance (it uses the same vertex machinery).
    """
    center = jnp.mean(pts, axis=-2, keepdims=True)
    ang = jnp.arctan2(pts[..., 1] - center[..., 1],
                      pts[..., 0] - center[..., 0])
    order = jnp.argsort(ang, axis=-1)
    sp = jnp.take_along_axis(pts, order[..., None], axis=-2)
    nxt = jnp.roll(sp, -1, axis=-2)
    return jnp.abs(jnp.sum(sp[..., 0] * nxt[..., 1]
                           - nxt[..., 0] * sp[..., 1], axis=-1)) / 2.0


def paired_iou3d(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray):
    """Aligned (P, 7) bottom-y boxes -> (iou3d (P,), parts dict).
    Differentiable (ious_3D equivalent, gious.py:996-1056)."""
    bev_a = boxes3d_to_bev(boxes_a)
    bev_b = boxes3d_to_bev(boxes_b)
    inter_bev = _overlap_pairs(bev_a, bev_b)
    a_min, a_max = boxes_a[:, 1] - boxes_a[:, 3], boxes_a[:, 1]
    b_min, b_max = boxes_b[:, 1] - boxes_b[:, 3], boxes_b[:, 1]
    ih = jnp.clip(jnp.minimum(a_max, b_max) - jnp.maximum(a_min, b_min),
                  min=0.0)
    inter = inter_bev * ih
    vol_a = boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5]
    vol_b = boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5]
    union = jnp.clip(vol_a + vol_b - inter, min=1e-7)
    return inter / union, {"inter": inter, "union": union,
                           "bev_a": bev_a, "bev_b": bev_b,
                           "h_lo": jnp.minimum(a_min, b_min),
                           "h_hi": jnp.maximum(a_max, b_max)}


def paired_giou3d(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Aligned (P, 7) -> (P,) 3D GIoU (gious_3D, gious.py:897):
    giou = iou - (enclosure - union) / enclosure."""
    iou, parts = paired_iou3d(boxes_a, boxes_b)
    ca = _bev_corners(parts["bev_a"])
    cb = _bev_corners(parts["bev_b"])
    hull = _hull_area_8(jnp.concatenate([ca, cb], axis=-2))
    enc = hull * jnp.clip(parts["h_hi"] - parts["h_lo"], min=0.0)
    enc = jnp.clip(enc, min=1e-7)
    return iou - (enc - parts["union"]) / enc


def ious_3d_loss(gt_boxes: jnp.ndarray, pred_boxes: jnp.ndarray) -> jnp.ndarray:
    """mean(1 - iou3d) over aligned rows (giou_utils.ious_3d_loss:278-290)."""
    iou, _ = paired_iou3d(pred_boxes, gt_boxes)
    return jnp.mean(1.0 - iou)


def gious_3d_loss(gt_boxes: jnp.ndarray, pred_boxes: jnp.ndarray) -> jnp.ndarray:
    """mean(1 - giou3d) (giou_utils.gious_3d_loss:262-276)."""
    return jnp.mean(1.0 - paired_giou3d(pred_boxes, gt_boxes))
