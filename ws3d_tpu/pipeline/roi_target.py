"""RoI target assignment (legacy PointRCNN capability).

Equivalent of /root/reference/lib/rpn/proposal_target_layer.py (345 lines,
not referenced by any live driver — SURVEY.md §2.2 M8): sample a fixed
RoI set per scene as fg / easy-bg / hard-bg by IoU against gt, with
IoU-guided jitter augmentation of fg rois. Fixed-shape host/numpy
implementation (target assignment is a data-prep step, not a hot kernel).
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def sample_rois(rois: np.ndarray, gt_boxes: np.ndarray,
                roi_per_image: int = 32, fg_ratio: float = 0.5,
                fg_thresh: float = 0.55, bg_thresh: float = 0.45,
                bg_thresh_lo: float = 0.05, hard_bg_ratio: float = 0.8,
                rng: np.random.RandomState | None = None) -> Dict[str, np.ndarray]:
    """rois (R, 7), gt_boxes (G, 7) -> dict(rois (S, 7), gt_of_rois (S, 7),
    max_overlaps (S,), is_fg (S,)) with S = roi_per_image.

    Sampling rules follow proposal_target_layer.sample_rois_for_rcnn:
    fg = iou > fg_thresh; hard bg in [bg_thresh_lo, bg_thresh); easy bg
    below bg_thresh_lo; hard:easy = hard_bg_ratio.
    """
    import jax.numpy as jnp
    from ws3d_tpu.ops.iou3d import boxes_iou3d
    rng = rng or np.random.RandomState(0)
    S = roi_per_image
    if gt_boxes.shape[0] == 0 or rois.shape[0] == 0:
        z = np.zeros((S, 7), np.float32)
        return {"rois": z, "gt_of_rois": z.copy(),
                "max_overlaps": np.zeros(S, np.float32),
                "is_fg": np.zeros(S, bool)}
    _, iou3d = boxes_iou3d(jnp.asarray(rois), jnp.asarray(gt_boxes))
    iou3d = np.asarray(iou3d)
    max_ov = iou3d.max(axis=1)
    gt_idx = iou3d.argmax(axis=1)

    fg_inds = np.where(max_ov >= fg_thresh)[0]
    hard_bg = np.where((max_ov >= bg_thresh_lo) & (max_ov < bg_thresh))[0]
    easy_bg = np.where(max_ov < bg_thresh_lo)[0]

    n_fg = min(int(np.round(S * fg_ratio)), len(fg_inds))
    n_bg = S - n_fg

    def pick(pool, n):
        if len(pool) == 0 or n <= 0:
            return np.zeros(0, np.int64)
        return rng.choice(pool, n, replace=len(pool) < n)

    fg_sel = pick(fg_inds, n_fg)
    n_hard = int(n_bg * hard_bg_ratio)
    hard_sel = pick(hard_bg if len(hard_bg) else easy_bg, n_hard)
    easy_sel = pick(easy_bg if len(easy_bg) else hard_bg, n_bg - len(hard_sel))
    sel = np.concatenate([fg_sel, hard_sel, easy_sel]).astype(np.int64)
    if len(sel) < S:          # degenerate: everything empty -> repeat
        pad = pick(np.arange(rois.shape[0]), S - len(sel))
        sel = np.concatenate([sel, pad])
    sel = sel[:S]
    return {"rois": rois[sel].astype(np.float32),
            "gt_of_rois": gt_boxes[gt_idx[sel]].astype(np.float32),
            "max_overlaps": max_ov[sel].astype(np.float32),
            "is_fg": max_ov[sel] >= fg_thresh}


def aug_roi_by_noise(roi: np.ndarray, gt: np.ndarray, iou_thresh: float = 0.55,
                     max_tries: int = 10,
                     rng: np.random.RandomState | None = None) -> np.ndarray:
    """IoU-guided jitter: perturb the roi until it still overlaps its gt above
    iou_thresh (aug_roi_by_noise_torch in proposal_target_layer.py)."""
    import jax.numpy as jnp
    from ws3d_tpu.ops.iou3d import boxes_iou3d
    rng = rng or np.random.RandomState(0)
    best = roi.copy()
    for _ in range(max_tries):
        cand = roi.copy()
        cand[0:3] += rng.normal(0, 0.2, 3)
        cand[3:6] *= 1.0 + rng.normal(0, 0.05, 3)
        cand[6] += rng.uniform(-np.pi / 12, np.pi / 12)
        _, iou = boxes_iou3d(jnp.asarray(cand[None]), jnp.asarray(gt[None]))
        if float(iou[0, 0]) >= iou_thresh:
            return cand
    return best
