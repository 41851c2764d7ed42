"""Legacy top-N proposal selection (PointRCNN capability).

Equivalent of the selection logic in /root/reference/lib/rpn/proposal_layer.py
and center_proposal_layer.py (:38-130): score- or distance-based pre-NMS
top-N, oriented/axis-aligned BEV NMS at cfg[mode].RPN_NMS_THRESH, post-NMS
top-N — the consumers of the ``RPN_PRE/POST_NMS_TOP_N`` / ``RPN_NMS_THRESH``
/ ``RPN.NMS_TYPE`` / ``RPN_DISTANCE_BASED_PROPOSE`` config knobs. (In the
reference these layers are dead in the shipped weakly-supervised flow — the
live flow proposes via center votes + radius NMS, which here is
``pipeline.inference.rpn_propose`` — but the capability is part of the
PointRCNN surface, so it is kept callable and tested.)

TPU-native shape discipline: everything is fixed-shape with validity masks —
the reference's dynamic boolean indexing becomes -inf score masking + top_k,
and the greedy NMS sweep runs on a fixed (M, M) pairwise matrix.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ws3d_tpu.ops.boxes import boxes3d_to_bev
from ws3d_tpu.ops.nms import rotated_nms


def _select(scores, boxes, keep_sorted, order, top_n: int):
    """Top ``top_n`` kept entries (sorted space) -> fixed slots + validity."""
    rank_score = jnp.where(keep_sorted, scores[order], -jnp.inf)
    top, rank_idx = jax.lax.top_k(rank_score, top_n)
    sel = order[rank_idx]
    valid = jnp.isfinite(top)
    return (jnp.where(valid[:, None], boxes[sel], 0.0),
            jnp.where(valid, scores[sel], 0.0), valid)


def score_based_proposal(scores: jnp.ndarray, boxes3d: jnp.ndarray,
                         pre_top_n: int, post_top_n: int, nms_thresh: float,
                         rotated: bool = True,
                         valid: jnp.ndarray | None = None):
    """Single scene: scores (N,), boxes3d (N, 7) ->
    (boxes (post, 7), scores (post,), valid (post,)).

    proposal_layer.py:124-160 semantics: pre-NMS top-N by score, BEV NMS
    (NMS_TYPE 'rotate' -> rotated IoU, 'normal' -> axis-aligned), post-NMS
    top-N. (The reference function short-circuits before its own NMS lines —
    dead code below an early return; this implements the full written
    pipeline.)
    """
    N = scores.shape[0]
    pre = min(int(pre_top_n), N)
    masked = scores if valid is None else jnp.where(valid, scores, -jnp.inf)
    top, idx = jax.lax.top_k(masked, pre)
    cand_boxes = boxes3d[idx]
    cand_valid = jnp.isfinite(top)
    bev = boxes3d_to_bev(cand_boxes)
    keep, order = rotated_nms(bev, top, nms_thresh, valid=cand_valid,
                              rotated=rotated)
    return _select(top, cand_boxes, keep, order, min(int(post_top_n), pre))


def distance_based_proposal(scores: jnp.ndarray, boxes3d: jnp.ndarray,
                            pre_top_n: int, post_top_n: int,
                            nms_thresh: float, rotated: bool = True,
                            valid: jnp.ndarray | None = None):
    """Two-region proposal split (proposal_layer.py:61-123): the 0-40 m
    region gets 70% of the pre/post budgets, the 40-80 m region the rest;
    each region runs its own BEV NMS and the kept sets are concatenated.

    Fixed-shape variant: region membership becomes a score mask (the
    reference's empty-far-region fallback to leftover near boxes is covered
    by the near region's own budget).
    """
    N = scores.shape[0]
    pre_n = [int(pre_top_n * 0.7), int(pre_top_n) - int(pre_top_n * 0.7)]
    post_n = [int(post_top_n * 0.7), int(post_top_n) - int(post_top_n * 0.7)]
    ranges = [(0.0, 40.0), (40.0, 80.0)]
    ok = jnp.ones((N,), bool) if valid is None else valid

    outs = []
    for (lo, hi), pre, post in zip(ranges, pre_n, post_n):
        pre = min(pre, N)
        in_rng = ok & (boxes3d[:, 2] > lo) & (boxes3d[:, 2] <= hi)
        masked = jnp.where(in_rng, scores, -jnp.inf)
        top, idx = jax.lax.top_k(masked, pre)
        cand_boxes = boxes3d[idx]
        cand_valid = jnp.isfinite(top)
        bev = boxes3d_to_bev(cand_boxes)
        keep, order = rotated_nms(bev, top, nms_thresh, valid=cand_valid,
                                  rotated=rotated)
        outs.append(_select(top, cand_boxes, keep, order, min(post, pre)))

    return (jnp.concatenate([o[0] for o in outs], axis=0),
            jnp.concatenate([o[1] for o in outs], axis=0),
            jnp.concatenate([o[2] for o in outs], axis=0))


def make_proposal_fn(cfg, mode: str = "TEST"):
    """Build the jittable batched legacy proposal function from the config
    knobs: cfg[mode].RPN_PRE/POST_NMS_TOP_N, cfg[mode].RPN_NMS_THRESH,
    cfg[mode].RPN_DISTANCE_BASED_PROPOSE, cfg.RPN.NMS_TYPE.

    Returns fn(scores (B, N), boxes3d (B, N, 7)) ->
    (boxes (B, M, 7), scores (B, M), valid (B, M)) with
    M = RPN_POST_NMS_TOP_N.
    """
    m = cfg[mode]
    nms_type = str(cfg.RPN.NMS_TYPE)
    if nms_type not in ("normal", "rotate"):
        raise NotImplementedError(f"RPN.NMS_TYPE {nms_type!r}")
    base = (distance_based_proposal if bool(m.RPN_DISTANCE_BASED_PROPOSE)
            else score_based_proposal)
    one = partial(base, pre_top_n=int(m.RPN_PRE_NMS_TOP_N),
                  post_top_n=int(m.RPN_POST_NMS_TOP_N),
                  nms_thresh=float(m.RPN_NMS_THRESH),
                  rotated=nms_type == "rotate")
    return jax.vmap(one)
