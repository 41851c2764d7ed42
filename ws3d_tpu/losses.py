"""Loss functions — fixed-shape, mask-based jnp equivalents of the
reference's loss stack (lib/utils/loss_utils.py + the composition logic in
lib/net/train_functions.py).

Every loss that the reference computes over a dynamically-indexed foreground
subset (``tensor[fg_mask]``) is computed here as a masked mean over the full
fixed-shape batch — identical values, jit/TPU friendly.
"""
from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def sigmoid_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable BCE with logits (loss_utils.py:77-85):
    max(x, 0) - x*z + log1p(exp(-|x|))."""
    return (jnp.clip(logits, min=0) - logits * labels
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def sigmoid_focal_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                       weights: jnp.ndarray, alpha: float = 0.25,
                       gamma: float = 2.0) -> jnp.ndarray:
    """Per-element sigmoid focal loss (loss_utils.py:25-74). ``targets`` may
    be soft (the Gaussian weak labels); returns elementwise loss * weights."""
    ce = sigmoid_cross_entropy(logits, targets)
    p = jax.nn.sigmoid(logits)
    p_t = targets * p + (1.0 - targets) * (1.0 - p)
    modulating = jnp.power(1.0 - p_t, gamma) if gamma else 1.0
    alpha_w = targets * alpha + (1.0 - targets) * (1.0 - alpha)
    return modulating * alpha_w * ce * weights


def dice_loss(logits: jnp.ndarray, target: jnp.ndarray,
              ignore_target: float = -1.0) -> jnp.ndarray:
    """Soft-IoU Dice loss on sigmoid scores (loss_utils.py:8-22)."""
    x = jax.nn.sigmoid(logits.reshape(-1))
    t = target.reshape(-1).astype(x.dtype)
    mask = (t != ignore_target).astype(x.dtype)
    num = jnp.sum(jnp.minimum(x, t) * mask)
    den = jnp.clip(jnp.sum(jnp.maximum(x, t) * mask), min=1.0)
    return 1.0 - num / den


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Elementwise Huber with beta=1 (torch F.smooth_l1_loss semantics)."""
    d = jnp.abs(pred - target)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of x over rows where mask is True; 0 when the mask is empty.

    Equivalent to ``x[mask].mean()`` over fixed shapes: mask broadcasts over
    trailing dims of x, and the denominator counts broadcast elements.
    """
    m = mask.astype(x.dtype)
    while m.ndim < x.ndim:
        m = m[..., None]
    m = jnp.broadcast_to(m, x.shape)
    return jnp.sum(x * m) / jnp.clip(jnp.sum(m), min=1.0)


def softmax_cross_entropy_int(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-row CE with integer labels (torch F.cross_entropy, no reduction)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32),
                                axis=-1)[..., 0]


# ---------------------------------------------------------------------------
# RPN losses
# ---------------------------------------------------------------------------

def rpn_reg_loss(pred_reg: jnp.ndarray, reg_label: jnp.ndarray,
                 fg_mask: jnp.ndarray, loc_scope: float,
                 loc_bin_size: float) -> jnp.ndarray:
    """Bin-based (x, z) center-vote regression loss over foreground points.

    pred_reg (P, 4*n_bins), reg_label (P, 3) [dx, 0, dz], fg_mask (P,) bool.
    Masked-mean equivalent of loss_utils.get_rpn_reg_loss:88-148 evaluated on
    the fg subset.
    """
    n = int((loc_scope + 1e-3) / loc_bin_size) * 2
    loss = 0.0
    for axis, lo in ((0, 0), (2, n)):
        off = reg_label[:, axis]
        shift = jnp.clip(off + loc_scope, 0.0, loc_scope * 2 - 1e-3)
        bin_label = jnp.floor(shift / loc_bin_size).astype(jnp.int32)
        ce = softmax_cross_entropy_int(pred_reg[:, lo:lo + n], bin_label)
        loss = loss + masked_mean(ce, fg_mask)
        res = shift - (bin_label.astype(shift.dtype) * loc_bin_size
                       + loc_bin_size / 2)
        res_norm = res / (loc_bin_size / 2)
        res_slot = 2 * n + lo
        pred_res = jnp.take_along_axis(pred_reg[:, res_slot:res_slot + n],
                                       bin_label[:, None], axis=1)[:, 0]
        loss = loss + masked_mean(smooth_l1(pred_res, res_norm), fg_mask)
    return loss


def rpn_loss(rpn_cls: jnp.ndarray, rpn_reg: jnp.ndarray,
             cls_label: jnp.ndarray, reg_label: jnp.ndarray,
             loc_scope: float, loc_bin_size: float,
             focal_alpha: float = 0.25, focal_gamma: float = 2.0,
             loss_weights=(1.0, 1.0)) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Full stage-1 loss (train_functions.get_rpn_loss:163-228), Gaussian
    soft-label focal path.

    rpn_cls (B, N, 1); rpn_reg (B, N, C); cls_label (B, N) soft in [0, 1];
    reg_label (B, N, 3).
    """
    logits = rpn_cls.reshape(-1)
    target = cls_label.reshape(-1)
    pos = target
    neg = 1.0 - target
    weights = (pos + neg) / jnp.clip(jnp.sum(pos), min=1.0)
    cls_elem = sigmoid_focal_loss(logits, target, weights,
                                  alpha=focal_alpha, gamma=focal_gamma)
    loss_cls = jnp.sum(cls_elem)

    fg_mask = target > 0
    P = logits.shape[0]
    loss_reg = rpn_reg_loss(rpn_reg.reshape(P, -1), reg_label.reshape(P, 3),
                            fg_mask, loc_scope, loc_bin_size)
    has_fg = jnp.any(fg_mask)
    loss_reg = jnp.where(has_fg, loss_reg, 0.0)
    total = loss_cls * loss_weights[0] + loss_reg * loss_weights[1]
    aux = {"rpn_loss_cls": loss_cls, "rpn_loss_reg": loss_reg,
           "rpn_fg_sum": jnp.sum(fg_mask.astype(jnp.int32)),
           "rpn_loss": total}
    return total, aux


# ---------------------------------------------------------------------------
# RCNN losses
# ---------------------------------------------------------------------------

def rcnn_reg_loss(pred_reg: jnp.ndarray, reg_label: jnp.ndarray,
                  fg_mask: jnp.ndarray, anchor_size: jnp.ndarray,
                  loc_scope: float, loc_bin_size: float, num_head_bin: int,
                  get_xz_fine: bool = False, get_y_by_bin: bool = False,
                  loc_y_scope: float = 0.5, loc_y_bin_size: float = 0.25,
                  get_ry_fine: bool = False):
    """(loc, angle, size) losses over fg rows.

    pred_reg (P, 52), reg_label (P, 7) [x, y, z, h, w, l, ry] in the crop
    frame. Masked-mean equivalent of loss_utils.get_rcnn_reg_loss:151-338
    with the shipped yaml (LOC_XZ_FINE False => smooth-L1 x/z path,
    MSE y-offset, coarse 2pi/12 heading bins, anchor-relative size).
    """
    n = int((loc_scope + 1e-3) / loc_bin_size) * 2
    x_res_l = 2 * n
    z_res_l = 3 * n
    start = 4 * n
    loc_loss = 0.0

    if get_xz_fine:
        for axis, lo, res_lo in ((0, 0, x_res_l), (2, n, z_res_l)):
            off = reg_label[:, axis]
            shift = jnp.clip(off + loc_scope, 0.0, loc_scope * 2 - 1e-3)
            bin_label = jnp.floor(shift / loc_bin_size).astype(jnp.int32)
            ce = softmax_cross_entropy_int(pred_reg[:, lo:lo + n], bin_label)
            loc_loss = loc_loss + masked_mean(ce, fg_mask)
            res = shift - (bin_label.astype(shift.dtype) * loc_bin_size
                           + loc_bin_size / 2)
            pred_res = jnp.take_along_axis(pred_reg[:, res_lo:res_lo + n],
                                           bin_label[:, None], axis=1)[:, 0]
            loc_loss = loc_loss + masked_mean(
                smooth_l1(pred_res, res / (loc_bin_size / 2)), fg_mask)
    else:
        loc_loss = loc_loss + masked_mean(
            smooth_l1(pred_reg[:, x_res_l], reg_label[:, 0] / loc_scope), fg_mask)
        loc_loss = loc_loss + masked_mean(
            smooth_l1(pred_reg[:, z_res_l], reg_label[:, 2] / loc_scope), fg_mask)

    if get_y_by_bin:
        ny = int((loc_y_scope + 1e-3) / loc_y_bin_size) * 2
        y_shift = jnp.clip(reg_label[:, 1] + loc_y_scope, 0.0,
                           loc_y_scope * 2 - 1e-3)
        y_bin = jnp.floor(y_shift / loc_y_bin_size).astype(jnp.int32)
        ce = softmax_cross_entropy_int(pred_reg[:, start:start + ny], y_bin)
        y_res = y_shift - (y_bin.astype(y_shift.dtype) * loc_y_bin_size
                           + loc_y_bin_size / 2)
        pred_res = jnp.take_along_axis(pred_reg[:, start + ny:start + 2 * ny],
                                       y_bin[:, None], axis=1)[:, 0]
        loc_loss = loc_loss + masked_mean(ce, fg_mask) + masked_mean(
            smooth_l1(pred_res, y_res / loc_y_bin_size), fg_mask)
        start = start + 2 * ny
    else:
        y_err = pred_reg[:, start] - reg_label[:, 1]
        loc_loss = loc_loss + masked_mean(jnp.square(y_err), fg_mask)
        start = start + 1

    ry_label = reg_label[:, 6]
    if get_ry_fine:
        per = math.pi / num_head_bin
        ang = jnp.clip(ry_label % math.pi, 1e-3, math.pi - 1e-3)
        ry_bin = jnp.floor(ang / per).astype(jnp.int32)
        ry_res = ang - (ry_bin.astype(ang.dtype) * per + per / 2)
    else:
        per = 2 * math.pi / num_head_bin
        heading = ry_label % (2 * math.pi)
        shift = (heading + per / 2) % (2 * math.pi)
        ry_bin = jnp.floor(shift / per).astype(jnp.int32)
        ry_res = shift - (ry_bin.astype(shift.dtype) * per + per / 2)
    ce = softmax_cross_entropy_int(pred_reg[:, start:start + num_head_bin], ry_bin)
    pred_res = jnp.take_along_axis(
        pred_reg[:, start + num_head_bin:start + 2 * num_head_bin],
        ry_bin[:, None], axis=1)[:, 0]
    angle_loss = masked_mean(ce, fg_mask) + masked_mean(
        smooth_l1(pred_res, ry_res / (per / 2)), fg_mask)
    start = start + 2 * num_head_bin

    size_label = (reg_label[:, 3:6] - anchor_size) / anchor_size
    size_loss = masked_mean(smooth_l1(pred_reg[:, start:start + 3], size_label),
                            fg_mask)
    return loc_loss, angle_loss, size_loss


def corner_loss(pred_boxes: jnp.ndarray, gt_boxes: jnp.ndarray,
                mask: jnp.ndarray) -> jnp.ndarray:
    """Min-over-flip corner distance smooth-L1 (train_functions.py:264-273).

    pred_boxes, gt_boxes (P, 7) bottom-y; mask (P,) — fg & IoU>0.5 rows.
    """
    from ws3d_tpu.ops.boxes import boxes3d_to_corners3d
    pred_c = boxes3d_to_corners3d(pred_boxes)            # (P, 8, 3)
    gt_c = boxes3d_to_corners3d(gt_boxes)
    gt_flip = gt_boxes.at[:, 6].add(math.pi)
    gt_fc = boxes3d_to_corners3d(gt_flip)
    dist = jnp.minimum(jnp.linalg.norm(pred_c - gt_c, axis=-1),
                       jnp.linalg.norm(pred_c - gt_fc, axis=-1))  # (P, 8)
    return masked_mean(smooth_l1(dist, jnp.zeros_like(dist)), mask)


def pairwise_diag_iou3d(pred_boxes: jnp.ndarray, gt_boxes: jnp.ndarray) -> jnp.ndarray:
    """Row-wise 3D IoU between aligned (P, 7) box arrays (the reference
    computes a full (P, P) matrix and gathers the diagonal —
    train_functions.py:258-260; we only compute the diagonal)."""
    from ws3d_tpu.ops.boxes import boxes3d_to_bev
    from ws3d_tpu.ops.iou3d import _overlap_pairs
    bev_a = boxes3d_to_bev(pred_boxes)
    bev_b = boxes3d_to_bev(gt_boxes)
    overlap = _overlap_pairs(bev_a, bev_b)               # (P,)
    a_min, a_max = pred_boxes[:, 1] - pred_boxes[:, 3], pred_boxes[:, 1]
    b_min, b_max = gt_boxes[:, 1] - gt_boxes[:, 3], gt_boxes[:, 1]
    h = jnp.clip(jnp.minimum(a_max, b_max) - jnp.maximum(a_min, b_min), min=0.0)
    inter = overlap * h
    vol_a = pred_boxes[:, 3] * pred_boxes[:, 4] * pred_boxes[:, 5]
    vol_b = gt_boxes[:, 3] * gt_boxes[:, 4] * gt_boxes[:, 5]
    return inter / jnp.clip(vol_a + vol_b - inter, min=1e-7)


def rcnn_loss(rcnn_cls: jnp.ndarray, rcnn_reg: jnp.ndarray,
              pred_boxes3d: jnp.ndarray, gt_boxes: jnp.ndarray,
              cls_label: jnp.ndarray, anchor_size: jnp.ndarray,
              loc_scope: float = 1.5, loc_bin_size: float = 0.5,
              num_head_bin: int = 12, get_xz_fine: bool = False):
    """Stage-2 composite loss (train_functions.get_rcnn_loss:230-392):
    BCE cls + 20*loc + angle + 300*size + 10*corner.

    rcnn_cls (B,), rcnn_reg (B, 52), pred_boxes3d (B, 7) decoded (detached),
    gt_boxes (B, 7) crop-frame, cls_label (B,) float 0/1.
    """
    B = rcnn_reg.shape[0]
    fg_mask = cls_label > 0

    loss_loc, loss_angle, loss_size = rcnn_reg_loss(
        rcnn_reg.reshape(B, -1), gt_boxes.reshape(B, 7), fg_mask, anchor_size,
        loc_scope, loc_bin_size, num_head_bin, get_xz_fine=get_xz_fine)

    iou3d = jax.lax.stop_gradient(pairwise_diag_iou3d(pred_boxes3d, gt_boxes))
    iou_mask = fg_mask & (iou3d > 0.5)
    loss_corner = corner_loss(pred_boxes3d, gt_boxes, iou_mask)

    bce = sigmoid_cross_entropy(rcnn_cls.reshape(-1), cls_label)
    valid = (cls_label >= 0).astype(bce.dtype)
    loss_cls = jnp.sum(bce * valid) / jnp.clip(jnp.sum(valid), min=1.0)

    has_fg = jnp.any(fg_mask)
    loss_loc = jnp.where(has_fg, loss_loc, 0.0) * 20.0
    loss_angle = jnp.where(has_fg, loss_angle, 0.0)
    loss_size = jnp.where(has_fg, loss_size, 0.0) * 300.0
    loss_corner = jnp.where(has_fg, loss_corner, 0.0) * 10.0

    total = loss_cls + loss_loc + loss_angle + loss_size + loss_corner
    aux = {"rcnn_loss_cls": loss_cls, "rcnn_loss_loc": loss_loc,
           "rcnn_loss_angle": loss_angle, "rcnn_loss_size": loss_size,
           "rcnn_loss_corner": loss_corner, "rcnn_loss": total,
           "rcnn_iou_mean": masked_mean(iou3d, fg_mask),
           # logged-only IoU loss value, as in the reference where
           # ious_3d_loss is computed but not added to the total
           # (train_functions.py:279,302,370)
           "rcnn_loss_giou": masked_mean(1.0 - iou3d, iou_mask)}
    return total, aux


def ioun_loss(rcnn_iou: jnp.ndarray, rcnn_ref: jnp.ndarray,
              pred_boxes3d: jnp.ndarray, refined_boxes3d: jnp.ndarray,
              gt_boxes: jnp.ndarray, cls_label: jnp.ndarray):
    """IOUN cascade loss (train_functions.get_ioun_loss:394-516):
    100 * range-masked MSE(iou_pred, iou(refined, gt)^2)
    + 300*smooth-L1 loc/siz (normalized by pred dims) + 20*angle residual.

    rcnn_iou (B, 1) or (B,), rcnn_ref (B, 7); boxes (B, 7); cls_label (B,).
    """
    fg_mask = cls_label > 0
    loc_pred, siz_pred, ang_pred = (pred_boxes3d[:, :3], pred_boxes3d[:, 3:6],
                                    pred_boxes3d[:, 6])
    loc_l, siz_l, ang_l = gt_boxes[:, :3], gt_boxes[:, 3:6], gt_boxes[:, 6]

    safe_siz = jnp.where(jnp.abs(siz_pred) > 1e-6, siz_pred, 1.0)
    loss_loc = masked_mean(
        smooth_l1(rcnn_ref[:, :3], (loc_l - loc_pred) / safe_siz), fg_mask) * 300.0
    loss_siz = masked_mean(
        smooth_l1(rcnn_ref[:, 3:6], (siz_l - siz_pred) / safe_siz), fg_mask) * 300.0
    ang_res = (ang_l % math.pi) - (ang_pred % math.pi)
    loss_ang = masked_mean(smooth_l1(rcnn_ref[:, 6], ang_res), fg_mask) * 20.0

    iou3d = jax.lax.stop_gradient(
        pairwise_diag_iou3d(refined_boxes3d, gt_boxes))
    iou_label = jnp.square(iou3d)
    range_mask = jnp.sum(gt_boxes, axis=-1) != 0
    loss_iou = masked_mean(jnp.square(rcnn_iou.reshape(-1) - iou_label),
                           range_mask) * 100.0

    has_fg = jnp.any(fg_mask)
    loss_loc = jnp.where(has_fg, loss_loc, 0.0)
    loss_siz = jnp.where(has_fg, loss_siz, 0.0)
    loss_ang = jnp.where(has_fg, loss_ang, 0.0)

    total = loss_iou + loss_loc + loss_siz + loss_ang
    aux = {"loss_iou": loss_iou, "ioun_loss_loc": loss_loc,
           "ioun_loss_siz": loss_siz, "ioun_loss_ang": loss_ang,
           "rcnn_loss_iou": total}
    return total, aux
