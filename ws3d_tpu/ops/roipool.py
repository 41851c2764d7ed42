"""RoI point pooling — fixed-size in-box crops with wraparound padding.

TPU-native equivalent of /root/reference/lib/utils/roipool3d
(roipool3d_kernel.cu:97-194, roipool3d_utils.py:7-59): for each (enlarged)
box, select the first ``num_sampled`` in-box points in index order; when the
box holds fewer points, repeat them cyclically (`k % cnt` duplication,
roipool3d_kernel.cu:123-160); empty boxes raise an empty flag and return
zeros. Also provides the 4 m-cylinder crop used by the eval/auto-annotator
flows (eval_auto.py:286-292) under the same selection semantics.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ws3d_tpu.ops.boxes import enlarge_box3d, points_in_rotated_boxes


def _first_k_wraparound(mask: jnp.ndarray, k: int):
    """mask (M, N) bool -> idx (M, k) int32, empty (M,) bool.

    First-k true positions in ascending index order with `s % cnt` cyclic
    duplication for boxes with fewer than k hits.
    """
    from ws3d_tpu.ops.grouping import first_k_true_indices
    M, N = mask.shape
    kk = min(k, N)
    sel = first_k_true_indices(mask, kk)         # (M, kk) ascending; invalid=N
    cnt = jnp.sum(mask, axis=1).astype(jnp.int32)
    empty = cnt == 0
    slots = jax.lax.broadcasted_iota(jnp.int32, (M, k), 1)
    wrap = jnp.mod(slots, jnp.maximum(cnt, 1)[:, None])
    wrap = jnp.minimum(wrap, kk - 1)
    idx = jnp.take_along_axis(sel, wrap, axis=1)
    return jnp.where(empty[:, None], 0, idx), empty


def roipool3d(pts: jnp.ndarray, features: jnp.ndarray, boxes3d: jnp.ndarray,
              extra_width: float = 1.0, num_sampled: int = 512):
    """Pool per-box point crops.

    :param pts: (N, 3) scene points
    :param features: (N, C) per-point features
    :param boxes3d: (M, 7) bottom-y boxes
    :return: (pooled (M, num_sampled, 3+C), empty_flag (M,) bool)
    """
    big = enlarge_box3d(boxes3d, extra_width)
    mask = points_in_rotated_boxes(pts, big).T          # (M, N)
    idx, empty = _first_k_wraparound(mask, num_sampled)
    feats = jnp.concatenate([pts, features], axis=-1)   # (N, 3+C)
    pooled = feats[idx]                                  # (M, k, 3+C)
    return jnp.where(empty[:, None, None], 0.0, pooled), empty


def cylinder_crop(pts: jnp.ndarray, features: jnp.ndarray,
                  centers_xz: jnp.ndarray, radius: float = 4.0,
                  num_sampled: int = 512):
    """Crop points within a BEV radius of each center (eval_auto.py:286-292),
    recentered in x/z, first-k + wraparound sampling.

    :param pts: (N, 3)
    :param features: (N, C)
    :param centers_xz: (M, 2) BEV centers (x, z)
    :return: (xyz (M, k, 3) recentered, feats (M, k, C), empty (M,) bool)
    """
    d2 = (jnp.square(pts[None, :, 0] - centers_xz[:, None, 0])
          + jnp.square(pts[None, :, 2] - centers_xz[:, None, 1]))  # (M, N)
    mask = d2 < radius * radius
    idx, empty = _first_k_wraparound(mask, num_sampled)
    xyz = pts[idx]                                       # (M, k, 3)
    offs = jnp.stack([centers_xz[:, 0], jnp.zeros_like(centers_xz[:, 0]),
                      centers_xz[:, 1]], axis=-1)
    xyz = xyz - offs[:, None, :]
    feats = features[idx]
    zero = empty[:, None, None]
    return jnp.where(zero, 0.0, xyz), jnp.where(zero, 0.0, feats), empty
