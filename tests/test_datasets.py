"""Tests for the data pipeline: synthetic scenes, weak labels, RPN batches."""
import numpy as np

from ws3d_tpu.config import load_config
from ws3d_tpu.datasets import SyntheticKitti, RPNDataset
from ws3d_tpu.datasets.rpn_dataset import (gaussian_weak_labels,
                                           box_rpn_labels, sample_npoints,
                                           augment_scene)


def test_synthetic_scene_layout():
    src = SyntheticKitti(num_scenes=4, seed=1)
    scene = src.get_scene(0)
    assert scene.pts_lidar.shape[1] == 4
    assert len(scene.labels) >= 1
    # weak clicks exist for every VEHICLE (and only vehicles — the
    # annotator clicks car centers; pedestrians/cyclists/DontCare get none)
    vehicles = [o for o in scene.labels if o.cls_type in ("Car", "Van")]
    assert len(scene.noise_labels) == len(vehicles)
    # deterministic
    scene2 = src.get_scene(0)
    np.testing.assert_array_equal(scene.pts_lidar, scene2.pts_lidar)
    # weak clicks near true centers
    for o, n in zip(vehicles, scene.noise_labels):
        d = np.hypot(o.pos[0] - n.pos[0], o.pos[2] - n.pos[2])
        assert d < 1.5


def test_gaussian_weak_labels_peak_and_reg():
    pts = np.array([[0.0, 0.8, 0.0], [0.5, 0.8, 0.0], [10.0, 0.8, 0.0]],
                   np.float32)
    centers = np.array([[0.0, 1.65, 0.0]], np.float32)
    cls, reg = gaussian_weak_labels(pts, centers)
    # point at the center (within the 0.7 m flat top) gets label 1
    assert cls[0] > 0.99
    assert cls[1] > 0.9          # still inside flat top (dist<0.7)
    assert cls[2] < 1e-4         # 10 m away
    # reg targets point toward the center for pts within 4 m
    np.testing.assert_allclose(reg[1], [-0.5, 0.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(reg[2], [0.0, 0.0, 0.0], atol=1e-5)


def test_box_rpn_labels_ignore_ring():
    box = np.array([[0.0, 1.65, 10.0, 1.5, 1.6, 3.9, 0.0]], np.float32)
    pts = np.array([
        [0.0, 1.0, 10.0],       # inside
        [0.0, 1.0, 10.85],      # inside ignore ring (w/2=0.8 < 0.85 < 1.0)
        [0.0, 1.0, 14.0],       # outside
    ], np.float32)
    cls, reg = box_rpn_labels(pts, box)
    assert cls[0] == 1
    assert cls[1] == -1
    assert cls[2] == 0
    np.testing.assert_allclose(reg[0], [0.0, 0.0, 0.0], atol=1e-5)


def test_sample_npoints_wraparound():
    rng = np.random.RandomState(0)
    depth = np.linspace(1, 70, 100).astype(np.float32)
    # fewer points than requested -> repetition
    c = sample_npoints(100, 256, depth, rng)
    assert len(c) == 256
    assert c.max() < 100
    # more points than requested -> near priority
    depth2 = np.concatenate([np.full(5000, 10.0), np.full(100, 50.0)])
    c2 = sample_npoints(5100, 1024, depth2, rng)
    assert len(c2) == 1024
    assert (depth2[c2] >= 40).sum() == 100   # all far points kept


def test_augment_scene_shapes():
    rng = np.random.RandomState(3)
    pts = rng.randn(100, 3).astype(np.float32)
    boxes = rng.randn(4, 7).astype(np.float32)
    p2, b2, methods = augment_scene(pts, boxes, rng)
    assert p2.shape == pts.shape and b2.shape == boxes.shape
    assert len(methods) >= 2     # rotation + scaling always on


def test_rpn_dataset_batches():
    cfg = load_config()
    cfg.RPN.NUM_POINTS = 512
    src = SyntheticKitti(num_scenes=6, points_per_scene=3000, seed=2)
    ds = RPNDataset(src, cfg, mode="TRAIN", npoints=512)
    batch = next(ds.batches(batch_size=2, steps=1))
    assert batch["pts_input"].shape == (2, 512, 4)
    assert batch["rpn_cls_label"].shape == (2, 512)
    assert batch["rpn_reg_label"].shape == (2, 512, 3)
    assert batch["gt_centers"].shape == (2, 32, 3)
    assert batch["rpn_cls_label"].max() <= 1.0
    assert batch["rpn_cls_label"].max() > 0.5   # cars present => fg labels
    # EVAL mode labels are hard {-1, 0, 1}
    ds_eval = RPNDataset(src, cfg, mode="EVAL", npoints=512)
    s = ds_eval.get_sample(0)
    assert set(np.unique(s["rpn_cls_label"])).issubset({-1.0, 0.0, 1.0})


def test_gt_database_augmentation():
    from ws3d_tpu.datasets.gt_database import build_gt_database, apply_gt_aug
    src = SyntheticKitti(num_scenes=6, points_per_scene=4000, seed=4)
    easy, hard = build_gt_database(src, src.sample_ids[:4])
    assert len(easy) + len(hard) > 0
    scene = src.get_scene(5)
    pts = scene.pts_rect
    inten = scene.pts_intensity
    import numpy as _np
    from ws3d_tpu.datasets.kitti_io import objs_to_boxes3d
    gts = objs_to_boxes3d(scene.labels)
    rng = _np.random.RandomState(0)
    p2, i2, extra = apply_gt_aug(pts, inten, gts, easy, hard, rng)
    assert extra.shape[0] > 0
    assert p2.shape[0] == i2.shape[0]
    # inserted centers respect the sparse-distance gate vs the originals
    for e in extra:
        d = _np.hypot(gts[:, 0] - e[0], gts[:, 2] - e[2]).min()
        assert d > 8.0 - 1e-6


def test_rpn_dataset_with_gt_aug():
    from ws3d_tpu.datasets.gt_database import build_gt_database
    cfg = load_config()
    cfg.RPN.NUM_POINTS = 512
    src = SyntheticKitti(num_scenes=6, points_per_scene=3000, seed=2)
    db = build_gt_database(src, src.sample_ids[:3])
    ds = RPNDataset(src, cfg, mode="TRAIN", npoints=512, gt_database=db)
    s = ds.get_sample(4)
    assert s["pts_input"].shape == (512, 4)
    # augmented scenes can exceed the original gt count
    assert s["gt_count"] >= 1


def test_rpn_sample_z_sorted_and_labels_aligned():
    """cfg.TPU.SORT_POINTS_Z: get_sample clouds arrive sorted ascending by
    rect z (after aug), with labels computed post-sort (alignment check via
    an EVAL-mode recompute)."""
    from ws3d_tpu.config import load_config
    from ws3d_tpu.datasets import SyntheticKitti, RPNDataset
    from ws3d_tpu.datasets.rpn_dataset import box_rpn_labels

    cfg = load_config()
    src = SyntheticKitti(num_scenes=2, points_per_scene=3000, seed=0)
    for mode in ("TRAIN", "EVAL"):
        ds = RPNDataset(src, cfg, mode=mode, npoints=1024, seed=0)
        s = ds.get_sample(0)
        z = s["pts_input"][:, 2]
        assert np.all(np.diff(z) >= 0), mode
    # EVAL labels recomputed from the emitted cloud must match exactly
    ds = RPNDataset(src, cfg, mode="EVAL", npoints=1024, seed=0)
    s = ds.get_sample(0)
    n_gt = int(s["gt_count"])
    cls, _ = box_rpn_labels(s["pts_input"][:, :3], s["gt_boxes3d"][:n_gt])
    np.testing.assert_array_equal(cls.astype(np.float32), s["rpn_cls_label"])
    # off switch restores the legacy (unsorted) order
    cfg2 = load_config()
    cfg2.TPU.SORT_POINTS_Z = False
    ds2 = RPNDataset(src, cfg2, mode="EVAL", npoints=1024, seed=0)
    z2 = ds2.get_sample(0)["pts_input"][:, 2]
    assert not np.all(np.diff(z2) >= 0)


def test_eval_sampling_is_call_history_invariant():
    """EVAL-mode get_sample must be a pure function of (seed, sample_id):
    the old shared-RNG stream made the 16,384-pt subsample depend on how
    many samples were drawn before it, so the SAME scene produced different
    detections depending on eval batch grouping (a marginal car flipped
    detected<->missed between --batch 1 and --batch 8 runs)."""
    src = SyntheticKitti(num_scenes=12, points_per_scene=4096, seed=0)
    cfg = load_config()

    ds1 = RPNDataset(src, cfg, mode="EVAL", npoints=1024, seed=0)
    fresh = ds1.get_sample(9)["pts_input"]

    ds2 = RPNDataset(src, cfg, mode="EVAL", npoints=1024, seed=0)
    for i in range(9):
        ds2.get_sample(i)
    after_history = ds2.get_sample(9)["pts_input"]
    np.testing.assert_array_equal(fresh, after_history)

    # TRAIN keeps the stochastic stream (reference parity)
    ds3 = RPNDataset(src, cfg, mode="TRAIN", npoints=1024, seed=0)
    a = ds3.get_sample(9)["pts_input"]
    b = ds3.get_sample(9)["pts_input"]
    assert not np.array_equal(a, b)


def test_synthetic_difficulty_ordering_and_placement():
    """VERDICT r3 weak #2 + r4 next-1: the fixture must produce KITTI-shaped
    difficulty buckets. On KITTI the buckets are cumulative by construction
    (easy-valid GT is also moderate/hard-valid), labels derive from the
    image (truncation = fraction projected outside the frame), occlusion is
    the dominant difficulty driver and corresponds to actually-missing
    returns, and vehicles never interpenetrate."""
    from ws3d_tpu.datasets.rpn_dataset import points_in_rotated_boxes_np

    src = SyntheticKitti(num_scenes=64, points_per_scene=4096, seed=0)
    per_level = {1: 0, 2: 0, 3: 0, 4: 0}
    occ_seen = set()
    pts_by_occ = {0: [], 1: [], 2: []}
    cls_seen = set()
    for sid in range(64):
        scene = src.get_scene(sid)
        rect = scene.pts_rect
        cars = [o for o in scene.labels if o.cls_type == "Car"]
        cls_seen |= {o.cls_type for o in scene.labels}
        for o in cars:
            per_level[o.level] += 1
            occ_seen.add(int(o.occlusion))
            # truncation consistent with the projected 2D box vs the frame
            x1, y1, x2, y2 = o.box2d
            area = max((x2 - x1) * (y2 - y1), 1e-6)
            cw = max(min(x2, 1242.0) - max(x1, 0.0), 0.0)
            ch = max(min(y2, 375.0) - max(y1, 0.0), 0.0)
            assert o.trucation >= round(1.0 - cw * ch / area, 2) - 1e-6
            # occlusion labels must track actually-missing returns: count
            # the car's surviving points (normalized by 1/z density)
            box = o.to_box3d()[None] + np.array([0, 0, 0, .1, .1, .1, 0],
                                                np.float32)
            n_in = int(points_in_rotated_boxes_np(rect, box).sum())
            pts_by_occ[int(o.occlusion)].append(n_in * float(o.pos[2]))
        # no interpenetration: vehicle BEV centers >= 6 m apart
        # (> max car diagonal; smaller objects keep >= 2 m)
        centers = np.array([[o.pos[0], o.pos[2]] for o in scene.labels
                            if o.cls_type in ("Car", "Van")])
        if len(centers) > 1:
            d = np.linalg.norm(centers[:, None] - centers[None], axis=-1)
            d[np.arange(len(d)), np.arange(len(d))] = np.inf
            assert d.min() >= 6.0 - 1e-6
    # every difficulty level and occlusion state occurs; clutter classes
    # (FP bait) and DontCare are present
    assert all(per_level[lv] > 0 for lv in (1, 2, 3))
    assert occ_seen == {0, 1, 2}
    assert {"Pedestrian", "DontCare"} <= cls_seen
    # cumulative bucket ordering (how the AP harness consumes levels)
    easy = per_level[1]
    moderate = easy + per_level[2]
    hard = moderate + per_level[3]
    assert easy > 0 and hard >= moderate >= easy
    # point-level occlusion is REAL: occluded cars keep fewer
    # (depth-normalized) returns than visible ones, monotone in the label
    med = {k: np.median(v) for k, v in pts_by_occ.items() if v}
    assert med[0] > med[1] > med[2]


def test_synthetic_car_shell_is_fore_aft_asymmetric():
    """VERDICT r4 next-1(b): the ry SIGN must be observable from geometry —
    sample a canonical car's shell and check the forward half (hood, lower)
    differs from the rear half (cabin/trunk, taller) in height profile."""
    from ws3d_tpu.datasets.synthetic import _car_surface_points, GROUND_Y

    rng = np.random.RandomState(0)
    box = np.array([0.0, GROUND_Y, 20.0, 1.53, 1.63, 3.88, 0.0], np.float32)
    pts = _car_surface_points(rng, box, 4000)
    lx = pts[:, 0]    # ry=0: local length axis == x
    top = GROUND_Y - pts[:, 1]   # height above ground
    front = top[lx > 0.35 * 3.88]
    rear = top[lx < -0.35 * 3.88]
    # hood clearly lower than trunk/cabin; both non-empty
    assert len(front) > 50 and len(rear) > 50
    assert np.percentile(front, 95) < np.percentile(rear, 95) - 0.25


def test_synthetic_self_occlusion_one_sided():
    """Back-face removal: a car seen from the sensor keeps its near side
    and loses the far side, like a real single-viewpoint LiDAR scan."""
    from ws3d_tpu.datasets.synthetic import (_car_surface_points,
                                             _ray_blocked, GROUND_Y)

    rng = np.random.RandomState(1)
    # car dead ahead, broadside (ry=pi/2 -> width axis along z)
    box = np.array([0.0, GROUND_Y, 15.0, 1.53, 1.63, 3.88, np.pi / 2],
                   np.float32)
    pts = _car_surface_points(rng, box, 3000)
    own = np.full(pts.shape[0], -1)
    keep = ~_ray_blocked(pts, box[None], own, np.array([0]), shrink=0.86)
    kept, removed = pts[keep], pts[~keep]
    assert 0.25 < keep.mean() < 0.85
    # the kept side faces the sensor (smaller z), the removed side is far
    assert np.median(kept[:, 2]) < np.median(removed[:, 2])
