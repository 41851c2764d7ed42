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


def random_aug_box3d(box: np.ndarray, method: str = "multiple",
                     rng: np.random.RandomState | None = None) -> np.ndarray:
    """One jittered copy of a (7,) box per cfg.RCNN.REG_AUG_METHOD
    (random_aug_box3d, proposal_target_layer.py:247-285):

    - 'single': uniform ±0.5 m shift, ±15% scale, ±pi/12 rotation
    - 'multiple': one of 5 (pos, scale, angle) range tiers chosen uniformly
    - 'normal': per-dim ADDITIVE gaussian on x/y/z/h/w/l + uniform ry
    """
    rng = rng or np.random.RandomState(0)
    if method == "single":
        pos = rng.rand(3) - 0.5
        scale = (rng.rand(3) - 0.5) / (0.5 / 0.15) + 1.0
        rot = (rng.rand(1) - 0.5) / (0.5 / (np.pi / 12))
    elif method == "multiple":
        tiers = [[0.2, 0.1, np.pi / 12], [0.3, 0.15, np.pi / 12],
                 [0.5, 0.15, np.pi / 9], [0.8, 0.15, np.pi / 6],
                 [1.0, 0.15, np.pi / 3]]
        t = tiers[rng.randint(len(tiers))]
        pos = (rng.rand(3) - 0.5) / 0.5 * t[0]
        scale = (rng.rand(3) - 0.5) / 0.5 * t[1] + 1.0
        rot = (rng.rand(1) - 0.5) / 0.5 * t[2]
    elif method == "normal":
        shift = np.array([rng.normal(0, 0.3), rng.normal(0, 0.2),
                          rng.normal(0, 0.3), rng.normal(0, 0.25),
                          rng.normal(0, 0.15), rng.normal(0, 0.5)])
        ry = (rng.rand() - 0.5) / 0.5 * np.pi / 12
        return np.concatenate([box[0:6] + shift, [box[6] + ry]]).astype(
            np.float32)
    else:
        raise ValueError(f"unknown REG_AUG_METHOD {method!r}")
    return np.concatenate([box[0:3] + pos, box[3:6] * scale,
                           box[6:7] + rot]).astype(np.float32)


def aug_roi_by_noise(roi: np.ndarray, gt: np.ndarray, iou_thresh: float = 0.55,
                     max_tries: int = 10, method: str | None = None,
                     rng: np.random.RandomState | None = None) -> np.ndarray:
    """IoU-guided jitter: perturb the roi until it still overlaps its gt above
    iou_thresh (aug_roi_by_noise_torch in proposal_target_layer.py).

    ``method`` selects the reference REG_AUG_METHOD noise model; None keeps
    the legacy gaussian jitter."""
    import jax.numpy as jnp
    from ws3d_tpu.ops.iou3d import boxes_iou3d
    rng = rng or np.random.RandomState(0)
    best = roi.copy()
    for _ in range(max_tries):
        if method is not None:
            cand = random_aug_box3d(roi, method=method, rng=rng)
        else:
            cand = roi.copy()
            cand[0:3] += rng.normal(0, 0.2, 3)
            cand[3:6] *= 1.0 + rng.normal(0, 0.05, 3)
            cand[6] += rng.uniform(-np.pi / 12, np.pi / 12)
        _, iou = boxes_iou3d(jnp.asarray(cand[None]), jnp.asarray(gt[None]))
        if float(iou[0, 0]) >= iou_thresh:
            return cand
    return best


def sample_rois_cfg(rois: np.ndarray, gt_boxes: np.ndarray, cfg,
                    rng: np.random.RandomState | None = None,
                    aug_fg: bool = True) -> Dict[str, np.ndarray]:
    """Config-driven RoI sampling: consult the cfg.RCNN sampling tree the
    way proposal_target_layer.py does (ROI_PER_IMAGE/FG_RATIO at :91,
    CLS_FG/BG_THRESH(_LO) at :113-121, HARD_BG_RATIO at :190,
    ROI_FG_AUG_TIMES + REG_AUG_METHOD + min(REG_FG_THRESH, CLS_FG_THRESH)
    at :162-171 and :219).
    """
    rng = rng or np.random.RandomState(0)
    r = cfg.RCNN
    fg_thresh = min(float(r.REG_FG_THRESH), float(r.CLS_FG_THRESH))
    out = sample_rois(rois, gt_boxes, roi_per_image=int(r.ROI_PER_IMAGE),
                      fg_ratio=float(r.FG_RATIO), fg_thresh=fg_thresh,
                      bg_thresh=float(r.CLS_BG_THRESH),
                      bg_thresh_lo=float(r.CLS_BG_THRESH_LO),
                      hard_bg_ratio=float(r.HARD_BG_RATIO), rng=rng)
    aug_times = int(r.ROI_FG_AUG_TIMES)
    if aug_fg and aug_times > 0 and gt_boxes.shape[0] > 0:
        sampled = out["rois"]
        for i in np.where(out["is_fg"])[0]:
            sampled[i] = aug_roi_by_noise(
                sampled[i], out["gt_of_rois"][i], iou_thresh=fg_thresh,
                max_tries=aug_times, method=str(r.REG_AUG_METHOD), rng=rng)
    return out
