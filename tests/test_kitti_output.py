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
