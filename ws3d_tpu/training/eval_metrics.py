"""Training-time eval metrics.

Equivalents of the reference's Trainer eval loops
(tools/train_utils/train_utils.py):
- eval_epoch_rpn (:150-245): per-point vote precision + gt-center recall
  with a 1.4 m center match
- eval_epoch_rcnn (:248-343): IoU-0.5/0.7 recall over proposals, including
  the deduplicated "single" recall (one hit per gt)
- eval_epoch_ioun (:346-515): same plus refined-box recall and the
  predicted-IoU error
Computed as fixed-shape array ops over model outputs, host-reduced.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def rpn_vote_metrics(pred_centers: np.ndarray, scores_norm: np.ndarray,
                     gt_centers: np.ndarray, gt_count: int,
                     score_thresh: float = 0.3,
                     match_radius: float = 1.4) -> Dict[str, float]:
    """Per-scene vote precision/recall (train_utils.py:186-243).

    pred_centers (N, 3) decoded votes; scores_norm (N,); gt_centers (G, 3)
    padded, gt_count valid rows.
    """
    sel = scores_norm > score_thresh
    votes = pred_centers[sel]
    gts = gt_centers[:gt_count]
    if gts.shape[0] == 0:
        return {"vote_precision": 0.0, "gt_recall": 0.0,
                "num_votes": int(sel.sum()), "num_gt": 0}
    if votes.shape[0] == 0:
        return {"vote_precision": 0.0, "gt_recall": 0.0,
                "num_votes": 0, "num_gt": int(gts.shape[0])}
    d = np.sqrt((votes[:, None, 0] - gts[None, :, 0]) ** 2
                + (votes[:, None, 2] - gts[None, :, 2]) ** 2)
    vote_hit = (d < match_radius).any(axis=1)
    gt_hit = (d < match_radius).any(axis=0)
    return {"vote_precision": float(vote_hit.mean()),
            "gt_recall": float(gt_hit.mean()),
            "num_votes": int(votes.shape[0]),
            "num_gt": int(gts.shape[0])}


def box_recall_metrics(pred_boxes: np.ndarray, gt_boxes: np.ndarray,
                       thresholds=(0.5, 0.7)) -> Dict[str, float]:
    """IoU-threshold recall incl. dedup 'single' recall
    (train_utils.py:248-343): plain recall counts any prediction over the
    threshold per gt; 'single' recall greedily assigns each gt at most one
    prediction."""
    import jax.numpy as jnp
    from ws3d_tpu.ops.iou3d import boxes_iou3d
    out: Dict[str, float] = {}
    if gt_boxes.shape[0] == 0 or pred_boxes.shape[0] == 0:
        for t in thresholds:
            out[f"recall_{t}"] = 0.0
            out[f"single_recall_{t}"] = 0.0
        return out
    _, iou3d = boxes_iou3d(jnp.asarray(pred_boxes), jnp.asarray(gt_boxes))
    iou3d = np.asarray(iou3d)                       # (P, G)
    for t in thresholds:
        out[f"recall_{t}"] = float((iou3d.max(axis=0) > t).mean())
        # greedy one-to-one assignment in decreasing IoU order
        m = iou3d.copy()
        hit = 0
        for _ in range(min(m.shape)):
            i, j = np.unravel_index(m.argmax(), m.shape)
            if m[i, j] <= t:
                break
            hit += 1
            m[i, :] = -1
            m[:, j] = -1
        out[f"single_recall_{t}"] = hit / iou3d.shape[1]
    return out


def iou_prediction_error(pred_iou: np.ndarray, pred_boxes: np.ndarray,
                         gt_boxes: np.ndarray) -> Dict[str, float]:
    """Mean |predicted_iou - iou(refined, gt)^2| over aligned rows
    (eval_epoch_ioun's histogram summarized, train_utils.py:346-515)."""
    from ws3d_tpu.losses import pairwise_diag_iou3d
    import jax.numpy as jnp
    if pred_boxes.shape[0] == 0:
        return {"iou_pred_mae": 0.0}
    true_iou = np.asarray(pairwise_diag_iou3d(jnp.asarray(pred_boxes),
                                              jnp.asarray(gt_boxes)))
    return {"iou_pred_mae": float(np.abs(pred_iou.reshape(-1)
                                         - true_iou ** 2).mean())}
