"""Tests for the stage-2 proposal-crop dataset."""
import numpy as np

from ws3d_tpu.config import load_config
from ws3d_tpu.datasets.boxplace_dataset import (BoxPlaceDataset,
                                                synthetic_proposal_database)


def _cfg(ioun=False, cascade=1):
    cfg = load_config()
    cfg.RPN.ENABLED = False
    cfg.RCNN.ENABLED = True
    cfg.IOUN.ENABLED = ioun
    cfg.CASCADE = cascade
    return cfg


def test_synthetic_database_layout():
    db = synthetic_proposal_database(num=16, seed=3)
    assert len(db) == 16
    fg = [d for d in db if d["foreground_flag"]]
    assert fg, "expected some foreground entries"
    d = fg[0]
    assert d["cur_box_point"].shape == (512, 3)
    assert d["gt_boxes"].shape == (7,)
    assert d["gt_boxes"][3] > 0
    # mask marks car points positive
    assert (d["gt_mask"] > 0).sum() > 10


def test_boxplace_train_sample_shapes():
    cfg = _cfg()
    db = synthetic_proposal_database(num=8, seed=1)
    ds = BoxPlaceDataset(db, cfg, mode="TRAIN", seed=0)
    assert len(ds) == 8 * 4      # 4 augmented copies
    s = ds.get_sample(0)
    assert s["cur_box_point"].shape == (512, 3)
    assert s["cur_box_reflect"].shape == (512, 1)
    assert s["gt_boxes"].shape == (7,)
    # ground shift applied: crop y should be near 0 now
    assert abs(np.median(s["cur_box_point"][:, 1])) < 1.5


def test_boxplace_eval_is_deterministic_geometry():
    cfg = _cfg()
    db = synthetic_proposal_database(num=4, seed=2, fg_ratio=1.0)
    ds = BoxPlaceDataset(db, cfg, mode="EVAL", seed=0)
    s = ds.get_sample(0)
    # EVAL: no jitter — gt box y shifted by exactly -1.65
    np.testing.assert_allclose(s["gt_boxes"][1],
                               db[0]["gt_boxes"][1] - 1.65, atol=1e-5)
    np.testing.assert_allclose(s["gt_boxes"][3:6], db[0]["gt_boxes"][3:6],
                               atol=1e-5)


def test_boxplace_background_gt_zeroed():
    cfg = _cfg()
    db = synthetic_proposal_database(num=20, seed=5, fg_ratio=0.0)
    ds = BoxPlaceDataset(db, cfg, mode="TRAIN", seed=0)
    s = ds.get_sample(0)
    assert s["cls"] == 0.0
    np.testing.assert_array_equal(s["gt_boxes"], np.zeros(7, np.float32))


def test_boxplace_batches_with_ioun_noise():
    cfg = _cfg(ioun=True, cascade=2)
    db = synthetic_proposal_database(num=8, seed=4)
    ds = BoxPlaceDataset(db, cfg, mode="TRAIN", seed=0)
    batch = next(ds.batches(batch_size=4, steps=1))
    assert batch["cur_box_point"].shape == (4, 512, 3)
    assert batch["train_mask"].shape == (4, 512, 1)
    assert batch["iou_trans"].shape == (4, 3, 2)
    assert batch["iou_scale"].shape == (4, 3, 2)
    assert batch["iou_ry"].shape == (4, 1, 2)
    # jitter is damped by 0.5^(cascade-1)
    assert np.abs(batch["iou_trans"]).max() < 1.0


def test_copy0_clean_vs_aug_copies_recentered():
    """Reference aug semantics (kitti_boxplace_dataset.py:352,431-435): copy
    0 keeps the proposal-centered crop with no rotation/flip/y-shift, while
    aug copies are recentered onto the gt box so location targets are ~N(0,
    0.1) gaussian jitter rather than the full proposal error."""
    cfg = _cfg()
    db = synthetic_proposal_database(num=1, seed=7, fg_ratio=1.0)
    # give the proposal a large, known gt offset
    db[0]["gt_boxes"][0] = 1.4
    db[0]["gt_boxes"][2] = -1.1
    db[0]["cur_box_point"][:, 0] += 1.4 - db[0]["gt_boxes"][0]
    orig_ry = float(db[0]["gt_boxes"][6])
    n_draws = 16
    for trial in range(n_draws):
        ds = BoxPlaceDataset(db, cfg, mode="TRAIN", seed=100 + trial)
        s0 = ds.get_sample(0)            # (entry 0, copy 0)
        # copy 0: heading untouched (no rotation, no flip), center tracks
        # the proposal-frame gt up to scale (±2%) + gaussian trans (σ 0.1)
        assert abs(s0["gt_boxes"][6] - orig_ry) < 1e-5, trial
        assert abs(s0["gt_boxes"][0] - 1.4) < 0.6, (trial, s0["gt_boxes"][0])
        assert abs(s0["gt_boxes"][2] + 1.1) < 0.6, (trial, s0["gt_boxes"][2])
        for c in (1, 2, 3):
            sc = ds.get_sample(c)        # (entry 0, copy c)
            # aug copies: recentered — gt x/z reduce to the N(0, 0.1)
            # translation noise regardless of the 1.4/-1.1 proposal error
            assert abs(sc["gt_boxes"][0]) < 0.55, (trial, c, sc["gt_boxes"][0])
            assert abs(sc["gt_boxes"][2]) < 0.55, (trial, c, sc["gt_boxes"][2])


def test_noise_pack_keeps_label_geometry_consistent():
    """After the full train-time noise pack, the car-surface points (marked
    by gt_mask) must still lie inside the (slightly enlarged) labeled box —
    catches heading/rotation label-vs-points mismatches."""
    from ws3d_tpu.datasets.rpn_dataset import points_in_rotated_boxes_np
    cfg = _cfg()
    db = synthetic_proposal_database(num=12, seed=11, fg_ratio=1.0)
    ds = BoxPlaceDataset(db, cfg, mode="TRAIN", seed=3)
    checked = 0
    for i in range(len(ds)):
        s = ds.get_sample(i)
        if s["cls"] != 1.0:
            continue
        box = s["gt_boxes"].copy()
        if not np.any(box):
            continue
        pts = s["cur_box_point"]
        car = s["gt_mask"].reshape(-1) > 0
        if car.sum() < 20:
            continue
        big = box.copy()
        big[1] += 0.3
        big[3:6] += 0.6
        inside = points_in_rotated_boxes_np(pts[car], big[None])[:, 0]
        frac = inside.mean()
        assert frac > 0.8, (i, frac, box)
        checked += 1
    assert checked >= 10
