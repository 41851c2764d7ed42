"""In-training validation loops + best-checkpoint tracking.

Equivalent of the reference's eval-during-training machinery
(tools/train_utils/train_utils.py:150-515): eval_epoch_rpn (vote precision /
gt recall @1.4 m), eval_epoch_rcnn (IoU-0.5/0.7 recall incl. per-instance
"single" recall), eval_epoch_ioun (adds refined-box recall + predicted-IoU
error). The reference runs these on a small_val split every ~E/20 epochs and
uses them to drive the saved-checkpoint list; here a Validator produces the
metric dict and the Trainer logs it, tracks the best score, and saves
per-eval checkpoints for eval_all_ckpt to sweep.
"""
from __future__ import annotations

from typing import Callable, Dict, Iterable, Optional

import numpy as np

from ws3d_tpu.training.eval_metrics import rpn_vote_metrics


class Validator:
    """Stage-aware validation: call `run(state, batches)` with a fresh
    iterator of EVAL-mode batches; returns the aggregated metric dict plus
    a scalar `score` used for best-checkpoint selection."""

    def __init__(self, model, cfg, stage: str = "rpn"):
        import jax

        self.model = model
        self.cfg = cfg
        self.stage = stage

        if stage == "rpn":
            loc_scope, loc_bin = cfg.RPN.LOC_SCOPE, cfg.RPN.LOC_BIN_SIZE

            def fwd(params, batch_stats, pts):
                from ws3d_tpu.box_codec import decode_center
                out = model.apply({"params": params,
                                   "batch_stats": batch_stats},
                                  {"pts_input": pts}, train=False,
                                  method=model.rpn_forward)
                votes = jax.vmap(
                    lambda x, r: decode_center(x, r, loc_scope, loc_bin))(
                        out["backbone_xyz"], out["rpn_reg"])
                scores = jax.nn.sigmoid(out["rpn_cls"][..., 0])
                return votes, scores
        else:
            def fwd(params, batch_stats, model_in):
                out = model.apply({"params": params,
                                   "batch_stats": batch_stats},
                                  model_in, train=False,
                                  method=model.rcnn_forward)
                boxes = out["pred_boxes3d"].reshape(-1, 7)
                refined = out.get("refined_box", out["pred_boxes3d"])
                return (boxes, refined.reshape(-1, 7),
                        out["rcnn_cls"].reshape(-1),
                        out.get("rcnn_iou", out["rcnn_cls"]).reshape(-1))

        self._fwd = jax.jit(fwd)

    # -- stage 1 -----------------------------------------------------------
    def _run_rpn(self, state, batches) -> Dict[str, float]:
        score_thresh = self.cfg.RPN.SCORE_THRESH
        agg = {"vote_precision": [], "gt_recall": []}
        for batch in batches:
            votes, scores = self._fwd(state.params, state.batch_stats,
                                      batch["pts_input"])
            votes, scores = np.asarray(votes), np.asarray(scores)
            for b in range(votes.shape[0]):
                m = rpn_vote_metrics(votes[b], scores[b],
                                     batch["gt_centers"][b],
                                     int(batch["gt_count"][b]),
                                     score_thresh=score_thresh)
                if m["num_gt"] > 0:
                    agg["vote_precision"].append(m["vote_precision"])
                    agg["gt_recall"].append(m["gt_recall"])
        out = {k: float(np.mean(v)) if v else 0.0 for k, v in agg.items()}
        out["score"] = out["vote_precision"] + out["gt_recall"]
        return out

    # -- stage 2 -----------------------------------------------------------
    def _run_rcnn(self, state, batches) -> Dict[str, float]:
        """Aligned per-crop IoU recall at 0.5/0.7 over fg crops, plus the
        deduplicated per-instance 'single' recall (train_utils.py:248-343;
        one hit per (sample_id, box_id) instance), and for IOUN the refined
        recall + |pred_iou - iou^2| error."""
        import jax.numpy as jnp
        from ws3d_tpu.losses import pairwise_diag_iou3d

        is_ioun = self.stage == "ioun"
        ious, ious_ref, iou_err = [], [], []
        inst_best: Dict[tuple, float] = {}
        for batch in batches:
            model_in = {"cur_box_point": batch["cur_box_point"],
                        "cur_box_reflect": batch["cur_box_reflect"],
                        "train_mask": batch["train_mask"]}
            for k in ("iou_trans", "iou_scale", "iou_ry"):
                if k in batch:
                    model_in[k] = batch[k]
            boxes, refined, _, pred_iou = self._fwd(
                state.params, state.batch_stats, model_in)
            gt = batch["gt_boxes"].reshape(-1, 7)
            fg = np.asarray(batch["cls"]).reshape(-1) > 0
            if not fg.any():
                continue
            iou = np.asarray(pairwise_diag_iou3d(
                jnp.asarray(np.asarray(boxes)[fg]), jnp.asarray(gt[fg])))
            ious.extend(iou.tolist())
            iou_r = iou
            if is_ioun:
                iou_r = np.asarray(pairwise_diag_iou3d(
                    jnp.asarray(np.asarray(refined)[fg]), jnp.asarray(gt[fg])))
                ious_ref.extend(iou_r.tolist())
                iou_err.extend(np.abs(np.asarray(pred_iou)[fg]
                                      - iou_r ** 2).tolist())
            sids = np.asarray(batch.get(
                "sample_id", np.zeros(fg.shape[0]))).reshape(-1)
            bids = np.asarray(batch.get(
                "box_id", np.arange(fg.shape[0]))).reshape(-1)
            for j, k in enumerate(np.where(fg)[0]):
                key = (int(sids[k]), int(bids[k]))
                inst_best[key] = max(inst_best.get(key, 0.0), float(iou_r[j]))

        ious = np.asarray(ious) if ious else np.zeros(1)
        out = {"iou_mean": float(ious.mean()),
               "recall_0.5": float((ious > 0.5).mean()),
               "recall_0.7": float((ious > 0.7).mean())}
        if inst_best:
            best = np.asarray(list(inst_best.values()))
            out["single_recall_0.5"] = float((best > 0.5).mean())
            out["single_recall_0.7"] = float((best > 0.7).mean())
        if is_ioun:
            ref = np.asarray(ious_ref)
            out["refined_recall_0.5"] = float((ref > 0.5).mean())
            out["refined_recall_0.7"] = float((ref > 0.7).mean())
            out["iou_pred_mae"] = float(np.mean(iou_err))
            out["score"] = out["refined_recall_0.5"] + out["refined_recall_0.7"]
        else:
            out["score"] = out["recall_0.5"] + out["recall_0.7"]
        return out

    def run(self, state, batches: Iterable) -> Dict[str, float]:
        if self.stage == "rpn":
            return self._run_rpn(state, batches)
        return self._run_rcnn(state, batches)


def make_val_fn(model, cfg, stage: str,
                batches_fn: Callable[[], Iterable]) -> Callable:
    """Bind a Validator to a batch-iterator factory: the Trainer calls
    val_fn(state) at its eval cadence."""
    validator = Validator(model, cfg, stage)

    def val_fn(state) -> Dict[str, float]:
        return validator.run(state, batches_fn())

    return val_fn
