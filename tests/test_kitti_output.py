"""KITTI txt output writer roundtrips through the AP annotation parser."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_save_kitti_format_roundtrip(tmp_path):
    from eval_auto import save_kitti_format
    from ws3d_tpu.datasets.kitti_io import Calibration
    from ws3d_tpu.eval.kitti_ap import get_label_anno

    calib = Calibration.identity()
    boxes = np.array([
        [2.0, 1.65, 20.0, 1.5, 1.6, 3.9, 0.4],
        [-5.0, 1.65, 35.0, 1.4, 1.7, 4.1, -1.2],
    ], np.float32)
    scores = np.array([0.9, 0.4], np.float32)
    save_kitti_format(7, calib, boxes, str(tmp_path), scores, (375, 1242))
    anno = get_label_anno(os.path.join(str(tmp_path), "%06d.txt" % 7))
    assert len(anno["name"]) == 2
    assert (anno["name"] == "Car").all()
    np.testing.assert_allclose(anno["location"], boxes[:, 0:3], atol=1e-3)
    # dims are stored (l, h, w) in annos
    np.testing.assert_allclose(anno["dimensions"],
                               boxes[:, [5, 3, 4]], atol=1e-3)
    np.testing.assert_allclose(anno["score"], scores, atol=1e-4)
    np.testing.assert_allclose(anno["rotation_y"], boxes[:, 6], atol=1e-3)


def test_save_kitti_format_empty(tmp_path):
    from eval_auto import save_kitti_format
    from ws3d_tpu.datasets.kitti_io import Calibration
    save_kitti_format(3, Calibration.identity(), np.zeros((0, 7)),
                      str(tmp_path), np.zeros(0), (375, 1242))
    path = os.path.join(str(tmp_path), "000003.txt")
    assert os.path.exists(path)
    assert open(path).read() == ""


def test_clicks_to_noise_labels_roundtrip(tmp_path):
    """label_w 5-tuple lines -> KITTI-format label_noise dir the datasets
    train from (only x/z meaningful)."""
    from ws3d_tpu.datasets.kitti_io import (clicks_to_noise_labels,
                                            get_objects_from_label)
    lw = tmp_path / "label.txt"
    lw.write_text("000003 1.5 20.25 1.4 20.0\n"
                  "000003 -4.0 33.0 -3.9 33.2\n"
                  "000007 0.5 10.0 0.4 10.1\n")
    out = tmp_path / "label_noise"
    counts = clicks_to_noise_labels(str(lw), str(out), sample_ids=[3, 7, 9])
    assert counts == {3: 2, 7: 1, 9: 0}
    objs = get_objects_from_label(str(out / "000003.txt"))
    assert len(objs) == 2 and objs[0].cls_type == "Car"
    np.testing.assert_allclose(objs[0].pos[[0, 2]], [1.5, 20.25], atol=0.01)
    assert objs[0].h > 1.0                    # mean car dims filled in
    assert (out / "000009.txt").read_text() == ""


def test_image_click_seeding_math():
    """Image click -> nearest projected point (L1, annotation.py:101-106)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from annotate import nearest_projected_point

    pts_image = np.array([[100.0, 50.0], [200.0, 80.0], [105.0, 52.0]])
    assert nearest_projected_point(pts_image, 101, 51) == 0
    assert nearest_projected_point(pts_image, 104, 53) == 2
    assert nearest_projected_point(pts_image, 300, 90) == 1
