"""KittiRaw filesystem loader: write a mini KITTI tree from synthetic
scenes, read it back, and feed the RPN pipeline — validates the real-data
path end-to-end without shipping KITTI."""
import os

import numpy as np

from ws3d_tpu.config import load_config
from ws3d_tpu.datasets import KittiRaw, RPNDataset, SyntheticKitti


from ws3d_tpu.datasets.kitti_io import write_kitti_tree as _write_kitti_tree


def test_kitti_raw_roundtrip(tmp_path):
    src = SyntheticKitti(num_scenes=3, points_per_scene=2000, seed=9)
    scenes = [src.get_scene(i, with_noise=True) for i in range(3)]
    _write_kitti_tree(str(tmp_path), scenes)

    raw = KittiRaw(str(tmp_path), split="train")
    assert raw.sample_ids == [0, 1, 2]
    loaded = raw.get_scene(1, with_noise=True)
    np.testing.assert_allclose(loaded.pts_lidar, scenes[1].pts_lidar,
                               atol=1e-5)
    assert len(loaded.labels) == len(scenes[1].labels)
    assert len(loaded.noise_labels) == len(scenes[1].noise_labels)
    # boxes survive the txt roundtrip to cm precision (%.2f format)
    np.testing.assert_allclose(loaded.labels[0].pos, scenes[1].labels[0].pos,
                               atol=0.01)

    # the stage-1 pipeline consumes it like any source
    cfg = load_config()
    cfg.RPN.NUM_POINTS = 512
    ds = RPNDataset(raw, cfg, mode="TRAIN", npoints=512, seed=0)
    batch = next(ds.batches(batch_size=2, steps=1))
    assert batch["pts_input"].shape == (2, 512, 4)
    assert batch["rpn_cls_label"].max() > 0.5


def test_kitti_raw_weakly_num(tmp_path):
    src = SyntheticKitti(num_scenes=4, points_per_scene=1500, seed=10)
    scenes = [src.get_scene(i, with_noise=True) for i in range(4)]
    _write_kitti_tree(str(tmp_path), scenes)
    raw = KittiRaw(str(tmp_path), split="train")
    cfg = load_config()
    ds = RPNDataset(raw, cfg, mode="TRAIN", npoints=256, weakly_num=2, seed=0)
    assert len(ds) == 2      # first-N non-empty weak-scene budget
