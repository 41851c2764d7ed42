"""Real-KITTI-format fixture drill: the COMPLETE public flow on on-disk
KITTI files.

Generates a 10-frame KITTI object tree (velodyne bins, calib, label_2,
ImageSets — no label_noise yet), then drives every public CLI in sequence
exactly as a user of the reference would (README flow):

  annotate (headless, writes label_w) -> clicks_to_noise_labels (the
  label_w -> label_noise bridge) -> train_rpn -> generate_box_dataset ->
  train_cascade -> eval_auto (KITTI txt + AP harness)

All steps run as subprocesses on CPU at tiny shapes; this validates the
file formats and CLI plumbing, not model quality.
"""
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


def _run(cmd, cwd):
    proc = subprocess.run([sys.executable] + cmd, cwd=cwd,
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (cmd, proc.stdout[-3000:],
                                  proc.stderr[-3000:])
    return proc.stdout + proc.stderr


@pytest.mark.slow
def test_full_public_flow_on_kitti_files(tmp_path):
    from ws3d_tpu.datasets import SyntheticKitti
    from ws3d_tpu.datasets.kitti_io import write_kitti_tree, KittiRaw

    root = str(tmp_path / "kitti")
    out = str(tmp_path / "out")
    # realistic mode: non-identity calibration (velodyne bins in the true
    # lidar frame, offset principal point), occ/trunc difficulty spread,
    # Van + DontCare labels — every CLI below must survive real-KITTI-shaped
    # inputs, not just the identity fixture
    src = SyntheticKitti(num_scenes=10, points_per_scene=2500, seed=21,
                         realistic=True)
    scenes = [src.get_scene(i, with_noise=True) for i in range(10)]
    write_kitti_tree(root, scenes, split="train", write_noise=False,
                     extra_splits=[("val", [8, 9]),
                                   ("small_val", [8, 9])])
    levels = {o.level for s in scenes for o in s.labels
              if o.cls_type == "Car"}
    assert {1, 2, 3} <= levels     # all difficulties present in the tree

    # 1. annotate: BEV clicks -> label_w + the label_noise bridge
    _run([os.path.join(TOOLS, "annotate.py"), "--data_root", root,
          "--scenes", "10", "--headless", "--to_noise",
          "--output_dir", os.path.join(out, "ann")], cwd=TOOLS)
    label_w = os.path.join(out, "ann", "label_w", "label.txt")
    assert os.path.getsize(label_w) > 0
    # install the converted weak labels into the tree the datasets read
    shutil.copytree(os.path.join(out, "ann", "label_noise"),
                    os.path.join(root, "object", "training", "label_noise"))

    # 2. stage-1 weak training from label_noise
    log1 = _run([os.path.join(TOOLS, "train_rpn.py"), "--data_root", root,
                 "--cpu", "--steps", "4", "--batch", "2", "--points", "512",
                 "--weakly_num", "8", "--val_scenes", "2",
                 "--output_dir", os.path.join(out, "rpn")], cwd=TOOLS)
    assert "val @ step" in log1          # in-training eval ran on small_val
    rpn_ckpt = os.path.join(out, "rpn", "rpn_ckpt")
    assert os.path.isdir(rpn_ckpt)

    # 3. whole-scene proposal database
    log2 = _run([os.path.join(TOOLS, "generate_box_dataset.py"),
                 "--data_root", root, "--cpu", "--scenes", "6",
                 "--points", "1024", "--ckpt", rpn_ckpt,
                 "--score_thresh", "0.005",
                 "--out", os.path.join(out, "boxes.pkl"),
                 "--output_dir", os.path.join(out, "gen")], cwd=TOOLS)
    assert "wrote" in log2
    import pickle
    with open(os.path.join(out, "boxes.pkl"), "rb") as f:
        db = pickle.load(f)
    assert len(db) > 0
    assert {"cur_box_point", "cur_prob_mask", "gt_mask",
            "foreground_flag"} <= set(db[0])

    # 4. stage-2 training from the database: RCNN, then the IOUN cascade
    #    stage warm-started from it (train_cascade x2, reference README flow)
    _run([os.path.join(TOOLS, "train_cascade.py"), "--stage", "rcnn",
          "--db", os.path.join(out, "boxes.pkl"), "--cpu", "--steps", "4",
          "--batch", "4", "--npoints", "128", "--val_ratio", "0",
          "--output_dir", os.path.join(out, "rcnn")], cwd=TOOLS)
    rcnn_ckpt = os.path.join(out, "rcnn", "rcnn_ckpt")
    assert os.path.isdir(rcnn_ckpt)
    _run([os.path.join(TOOLS, "train_cascade.py"), "--stage", "ioun",
          "--db", os.path.join(out, "boxes.pkl"), "--cpu", "--steps", "4",
          "--batch", "4", "--npoints", "128", "--val_ratio", "0",
          "--ckpt", rcnn_ckpt,
          "--output_dir", os.path.join(out, "ioun")], cwd=TOOLS)
    ioun_ckpt = os.path.join(out, "ioun", "ioun_ckpt")
    assert os.path.isdir(ioun_ckpt)

    # 5. two-stage eval: KITTI txt dump + official AP harness + recall tally
    log3 = _run([os.path.join(TOOLS, "eval_auto.py"), "--data_root", root,
                 "--cpu", "--scenes", "3", "--points", "512",
                 "--ckpt", ioun_ckpt, "--rpn_ckpt", rpn_ckpt,
                 "--output_dir", os.path.join(out, "eval")], cwd=TOOLS)
    assert "Car 3D AP e/m/h" in log3
    assert "total bbox recall" in log3
    dump_dir = os.path.join(out, "eval", "final_result", "data")
    txts = sorted(os.listdir(dump_dir))
    assert len(txts) == 3 and txts[0].endswith(".txt")

    # the weak labels the flow trained from really were KITTI-format files
    raw = KittiRaw(root, split="train")
    noise = raw.get_scene(0, with_noise=True).noise_labels
    assert all(o.cls_type == "Car" for o in noise)
