"""Tests for training-time eval metrics (eval_epoch_* equivalents)."""
import numpy as np

from ws3d_tpu.training.eval_metrics import (rpn_vote_metrics,
                                            box_recall_metrics,
                                            iou_prediction_error)


def test_rpn_vote_metrics_perfect_and_empty():
    gts = np.array([[5.0, 1.65, 20.0], [-3.0, 1.65, 40.0], [0, 0, 0]],
                   np.float32)
    votes = np.array([[5.1, 0, 20.1], [-3.1, 0, 39.9], [30.0, 0, 30.0]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    m = rpn_vote_metrics(votes, scores, gts, gt_count=2)
    assert m["gt_recall"] == 1.0
    assert abs(m["vote_precision"] - 2 / 3) < 1e-6
    # below-threshold votes are excluded
    m2 = rpn_vote_metrics(votes, np.array([0.1, 0.1, 0.9], np.float32),
                          gts, gt_count=2)
    assert m2["gt_recall"] == 0.0
    # no gt
    m3 = rpn_vote_metrics(votes, scores, gts, gt_count=0)
    assert m3["gt_recall"] == 0.0 and m3["num_gt"] == 0


def test_box_recall_metrics_dedup():
    gt = np.array([[0.0, 1.65, 20.0, 1.5, 1.6, 3.9, 0.0]], np.float32)
    # two near-identical predictions on one gt: plain recall 1, single 1
    preds = np.stack([gt[0], gt[0] + np.array([0.05, 0, 0, 0, 0, 0, 0],
                                              np.float32)])
    m = box_recall_metrics(preds, gt, thresholds=(0.5,))
    assert m["recall_0.5"] == 1.0
    assert m["single_recall_0.5"] == 1.0
    # empty predictions
    m2 = box_recall_metrics(np.zeros((0, 7), np.float32), gt)
    assert m2["recall_0.5"] == 0.0


def test_iou_prediction_error():
    boxes = np.array([[0.0, 1.65, 20.0, 1.5, 1.6, 3.9, 0.0]], np.float32)
    # perfect box, predicted iou 1.0 -> label 1^2 -> error 0
    m = iou_prediction_error(np.array([1.0], np.float32), boxes, boxes)
    assert m["iou_pred_mae"] < 1e-5
    m2 = iou_prediction_error(np.array([0.5], np.float32), boxes, boxes)
    assert abs(m2["iou_pred_mae"] - 0.5) < 1e-5


def test_recall_tally_numpy_host_path():
    """RecallTally must stay pure-NumPy (eager jnp here cost ~30 s/scene
    over the device tunnel) and match the jnp IoU within tolerance."""
    from ws3d_tpu.eval.recall import RecallTally

    rng = np.random.RandomState(3)
    gt = rng.randn(5, 7).astype(np.float32)
    gt[:, 3:6] = np.abs(gt[:, 3:6]) + 1.0
    pred = gt.copy()
    pred[:, 0] += np.array([0.05, 0.1, 0.2, 3.0, 5.0], np.float32)

    tally = RecallTally(thresholds=(0.1, 0.5))
    tally.update(pred, gt)
    assert tally.total_gt == 5
    assert tally.recalled[0] >= 3        # three near-identical boxes
    assert tally.recalled[1] >= 2
    assert tally.recalled[0] >= tally.recalled[1]

    tally.update(np.zeros((0, 7), np.float32), gt)   # no dets: gt still count
    assert tally.total_gt == 10
