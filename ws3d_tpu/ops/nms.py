"""Greedy NMS variants as fixed-shape jit-compatible loops.

Equivalents of the reference's suppression flows:
- rotated / axis-aligned bitmask NMS (iou3d_kernel.cu:250-348 + the host
  greedy sweep in iou3d.cpp:73-170)  -> rotated_nms
- the per-scene greedy *radius* NMS python loop over decoded center votes
  (tools/eval_auto.py:263-279, generate_box_dataset.py:122-136) -> radius_nms
- score threshold + top-k pre-selection (eval_auto.py:255-262)
  -> score_threshold_topk

All run on device over fixed-size arrays with validity masks; XLA unrolls the
O(K) greedy sweep as a lax.fori_loop over the precomputed pairwise matrix.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ws3d_tpu.ops.iou3d import aligned_overlap_bev, boxes_iou_bev


def _greedy_suppress(pair_mat: jnp.ndarray, thresh: float,
                     valid: jnp.ndarray) -> jnp.ndarray:
    """Greedy sweep in score order (rows already sorted by descending score).

    :param pair_mat: (K, K) pairwise overlap metric
    :param valid: (K,) bool — candidates that may be kept at all
    :return: (K,) bool keep mask
    """
    K = pair_mat.shape[0]
    suppress = pair_mat > thresh

    def body(i, keep):
        # i survives if valid and not suppressed by any kept earlier box
        killed = jnp.any(keep & suppress[:, i] & (jnp.arange(K) < i))
        keep_i = valid[i] & ~killed
        return keep.at[i].set(keep_i)

    return jax.lax.fori_loop(0, K, body, jnp.zeros((K,), dtype=bool))


def rotated_nms(bev: jnp.ndarray, scores: jnp.ndarray, thresh: float,
                valid: jnp.ndarray | None = None, rotated: bool = True):
    """Greedy BEV NMS. bev (K, 5), scores (K,) -> (keep (K,) bool, order (K,)).

    Returned mask/order are in *sorted-by-score* space: ``order`` maps rank ->
    original index, matching nms_gpu / nms_normal_gpu (iou3d_utils.py:59-90)
    which return kept original indices in score order.
    """
    K = bev.shape[0]
    if valid is None:
        valid = jnp.ones((K,), dtype=bool)
    neg = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-neg)
    bev_s = bev[order]
    valid_s = valid[order]
    iou = boxes_iou_bev(bev_s, bev_s) if rotated else aligned_overlap_bev(bev_s, bev_s)
    keep = _greedy_suppress(iou, thresh, valid_s)
    return keep, order


def radius_nms(centers_xz: jnp.ndarray, scores: jnp.ndarray, radius: float,
               valid: jnp.ndarray | None = None):
    """Greedy BEV radius NMS on center votes.

    Keeps a candidate iff no higher-scoring kept center lies within
    ``radius`` (strict <, like the `(dis < PROP_DIST).sum() == 0` check in
    eval_auto.py:270-276).

    :param centers_xz: (K, 2)
    :return: (keep (K,) bool, order (K,)) in sorted space.
    """
    K = centers_xz.shape[0]
    if valid is None:
        valid = jnp.ones((K,), dtype=bool)
    neg = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-neg)
    c = centers_xz[order]
    valid_s = valid[order]
    dist = jnp.sqrt(jnp.sum(jnp.square(c[:, None] - c[None, :]), axis=-1))
    keep = _greedy_suppress(-(dist - radius), 0.0, valid_s)  # dist < radius
    return keep, order


def score_threshold_topk(scores: jnp.ndarray, thresh: float, k: int,
                         valid: jnp.ndarray | None = None):
    """Select the top-k scores above ``thresh``.

    :return: (idx (k,), ok (k,) bool) — indices into the original array and a
        mask of which slots hold real selections.
    """
    if valid is not None:
        scores = jnp.where(valid, scores, -jnp.inf)
    top, idx = jax.lax.top_k(scores, k)
    return idx, top > thresh
