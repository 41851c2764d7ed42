"""Tests for the KITTI AP harness: rotated IoU golden values, perfect/partial
detector AP, difficulty gating."""
import numpy as np

from ws3d_tpu.eval.rotate_iou_np import rotate_iou_eval, rotated_inter_area
from ws3d_tpu.eval.kitti_ap import (anno_from_lines, annos_from_objects,
                                    image_box_overlap, d3_box_overlap,
                                    get_official_eval_result, get_thresholds)
from ws3d_tpu.datasets.kitti_io import Object3d


def test_rotated_iou_identity_and_disjoint():
    a = np.array([[0.0, 0.0, 2.0, 4.0, 0.0]])
    b = np.array([[0.0, 0.0, 2.0, 4.0, 0.0],
                  [10.0, 10.0, 2.0, 4.0, 0.3]])
    iou = rotate_iou_eval(a, b)
    np.testing.assert_allclose(iou[0, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(iou[0, 1], 0.0, atol=1e-9)


def test_rotated_iou_45deg_square():
    # unit square vs itself rotated 45 deg: inter = 2*(sqrt(2)-1)
    a = np.array([[0.0, 0.0, 1.0, 1.0, 0.0]])
    b = np.array([[0.0, 0.0, 1.0, 1.0, np.pi / 4]])
    inter = rotated_inter_area(a, b)[0, 0]
    expect = 2 * (np.sqrt(2) - 1)
    np.testing.assert_allclose(inter, expect, atol=1e-5)


def test_rotated_iou_half_overlap():
    a = np.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
    b = np.array([[1.0, 0.0, 2.0, 2.0, 0.0]])
    iou = rotate_iou_eval(a, b)[0, 0]
    np.testing.assert_allclose(iou, 2.0 / 6.0, atol=1e-6)


def test_image_box_overlap():
    boxes = np.array([[0.0, 0, 10, 10]])
    q = np.array([[5.0, 0, 15, 10], [20.0, 20, 30, 30]])
    ov = image_box_overlap(boxes, q)
    np.testing.assert_allclose(ov[0, 0], 50 / 150, atol=1e-6)
    assert ov[0, 1] == 0.0


def test_d3_box_overlap_identity():
    # camera boxes [x, y, z, l, h, w, ry]
    box = np.array([[1.0, 1.65, 10.0, 3.9, 1.5, 1.6, 0.3]])
    ov = d3_box_overlap(box, box)
    np.testing.assert_allclose(ov[0, 0], 1.0, atol=1e-5)


def test_get_thresholds_spacing():
    scores = np.linspace(1, 0, 100)
    th = get_thresholds(scores.copy(), 100)
    assert len(th) == 41


def _make_objects(n, offset=0.0, score=None, rng=None):
    objs = []
    rng = rng or np.random.RandomState(0)
    for i in range(n):
        x = rng.uniform(-15, 15) + offset
        z = rng.uniform(10, 50)
        ry = rng.uniform(-np.pi, np.pi)
        o = Object3d(cls_type="Car", trucation=0.0, occlusion=0.0,
                     alpha=-np.arctan2(x, z) + ry,
                     box2d=np.array([300.0, 150, 400, 250]),
                     h=1.5, w=1.6, l=3.9,
                     pos=np.array([x, 1.65, z], np.float32), ry=ry,
                     score=(score if score is not None else -1.0))
        objs.append(o)
    return objs


def test_perfect_detector_ap_100():
    # needs enough gt (>= ~41*4) for all 41 recall sample points to fill;
    # with fewer gt the 11-point AP is capped below 100 by construction
    # (reference eval.py:551-561 has the same behavior)
    rng = np.random.RandomState(7)
    gt_frames, dt_frames = [], []
    for f in range(45):
        objs = _make_objects(4, rng=rng)
        gt_frames.append(objs)
        dts = []
        for o in objs:
            d = Object3d(**{**o.__dict__})
            d.score = float(rng.uniform(0.5, 1.0))
            dts.append(d)
        dt_frames.append(dts)
    gt = annos_from_objects(gt_frames)
    dt = annos_from_objects(dt_frames)
    _, res = get_official_eval_result(gt, dt, "Car")
    # perfect detections at every difficulty
    assert res["Car_3d_easy"] > 99.0
    assert res["Car_bev_moderate"] > 99.0
    assert res["Car_image_hard"] > 99.0
    assert res["Car_aos_easy"] > 99.0


def test_half_detector_ap_degrades():
    rng = np.random.RandomState(8)
    gt_frames, dt_frames = [], []
    for f in range(8):
        objs = _make_objects(4, rng=rng)
        gt_frames.append(objs)
        dts = []
        for i, o in enumerate(objs[:2]):     # only half detected
            d = Object3d(**{**o.__dict__})
            d.score = float(rng.uniform(0.5, 1.0))
            dts.append(d)
        dt_frames.append(dts)
    gt = annos_from_objects(gt_frames)
    dt = annos_from_objects(dt_frames)
    _, res = get_official_eval_result(gt, dt, "Car")
    assert 30.0 < res["Car_3d_easy"] < 70.0


def test_anno_parsing_roundtrip():
    line = ("Car 0.00 0 -1.58 587.01 173.33 614.12 200.12 1.65 1.67 3.64 "
            "-0.65 1.71 46.70 -1.59")
    anno = anno_from_lines([line])
    assert anno["name"][0] == "Car"
    np.testing.assert_allclose(anno["dimensions"][0], [3.64, 1.65, 1.67])
    np.testing.assert_allclose(anno["location"][0], [-0.65, 1.71, 46.70])
    # van gating: Van counts as ignored (not FP) for Car
    objs = [Object3d.from_line(line)]
    annos = annos_from_objects([objs])
    assert annos[0]["score"][0] == -1.0


def test_difficulty_ordering_dontcare_van_aos_realistic():
    """Realistic fixture through the FULL file path: write a KITTI tree
    (non-identity calib, occ/trunc spanning all difficulties, Vans,
    DontCare), read labels back, dump near-perfect Car detections via
    save_kitti_format, and assert on the official harness output:
    easy >= moderate >= hard AP, AOS > 0 (and <= bbox AP), detections on
    Vans ignored (no FP), DontCare regions ignored."""
    import tempfile, os
    from ws3d_tpu.datasets import SyntheticKitti
    from ws3d_tpu.datasets.kitti_io import (KittiRaw, save_kitti_format,
                                            write_kitti_tree)
    from ws3d_tpu.eval import annos_from_objects, get_official_eval_result
    from ws3d_tpu.eval.kitti_ap import get_label_anno

    src = SyntheticKitti(num_scenes=64, points_per_scene=600, seed=11,
                         realistic=True)
    scenes = [src.get_scene(i) for i in range(64)]
    with tempfile.TemporaryDirectory() as tmp:
        root = os.path.join(tmp, "kitti")
        write_kitti_tree(root, scenes, split="val", write_noise=False)
        raw = KittiRaw(root, split="val")
        gt_frames, dt_annos = [], []
        det_dir = os.path.join(tmp, "det")
        rng = np.random.RandomState(0)
        for i, sid in enumerate(raw.sample_ids):
            scene = raw.get_scene(sid)
            gt_frames.append(scene.labels)
            # detect every Car AND Van (similar-type dets must not be FPs)
            boxes = np.array(
                [[o.pos[0], o.pos[1], o.pos[2], o.h, o.w, o.l, o.ry]
                 for o in scene.labels if o.cls_type in ("Car", "Van")],
                np.float32).reshape(-1, 7)
            boxes[:, 0:3] += rng.randn(*boxes[:, 0:3].shape) * 0.02
            save_kitti_format(sid, scene.calib, boxes, det_dir,
                              scores=np.linspace(0.9, 0.5, len(boxes)),
                              img_shape=scene.image_shape)
            dt_annos.append(get_label_anno(
                os.path.join(det_dir, "%06d.txt" % sid)))
        gt_annos = annos_from_objects(gt_frames)
        # gt trees carry all three difficulties + DontCare + Van
        names = np.concatenate([a["name"] for a in gt_annos])
        assert {"Car", "Van", "DontCare"} <= set(names.tolist())
        levels = [o.level for f in gt_frames for o in f
                  if o.cls_type == "Car"]
        assert {1, 2, 3} <= set(levels)

        result, ret = get_official_eval_result(gt_annos, dt_annos, "Car")
        d3 = [ret["Car_3d_easy"], ret["Car_3d_moderate"], ret["Car_3d_hard"]]
        bbox = [ret["Car_image_easy"], ret["Car_image_moderate"],
                ret["Car_image_hard"]]
        aos = [ret["Car_aos_easy"], ret["Car_aos_moderate"],
               ret["Car_aos_hard"]]
        # near-perfect dets on correctly-bucketed gt: high AP everywhere,
        # difficulty-ordered
        assert d3[0] >= d3[1] >= d3[2] - 1e-6, d3
        assert bbox[0] >= bbox[1] >= bbox[2] - 1e-6, bbox
        assert d3[0] > 80 and bbox[2] > 80, (d3, bbox)
        # save_kitti_format's alpha is AOS-consistent with the gt alpha
        assert "aos" in result and aos[0] > 80
        assert all(a <= b + 1e-6 for a, b in zip(aos, bbox)), (aos, bbox)
