"""Stage-1 -> stage-2 handoff: build the proposal-crop database.

Equivalent of /root/reference/generate_box_dataset.py: run the trained RPN
over the WHOLE valid point cloud of each scene (no 16,384-point subsample —
kitti_boxgen_dataset.py:144-211), decode per-point center votes, threshold
(score>0.1, |vote|>0.2), greedy radius-0.3 NMS, then per kept center record
ALL points within 4 m BEV (variable-size crop, recentered in x/z only) and
label the proposal against ground truth (:164-251):
- fg if a real-GT (or, on train, a noise-GT click) center lies within 0.7 m
- within 1.5 m ("G-fg"): attach the nearest REAL gt box (x/z recentered)
  and a 0/1 gt point mask from the 1.2x-dim-scaled box in_hull test
- train crops with <=5 points are dropped
Record layout matches generate_box_dataset.py:293-322: cur_prob_mask stores
the raw sigmoid RPN score (the stage-2 dataset thresholds it) and gt_mask
is 0/1.

Synthetic smoke run:
    python tools/generate_box_dataset.py --synthetic --scenes 4 --out db.pkl
"""
from __future__ import annotations

import os
import pickle

import numpy as np

from common import base_parser, setup, make_scene_source


def main():
    p = base_parser("generate stage-2 proposal database from a stage-1 ckpt")
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--scenes", type=int, default=16)
    p.add_argument("--points", type=int, default=None,
                   help="fixed jit point budget for the whole-scene cloud "
                        "(default cfg.RPN.NUM_POINTS; scenes are duplicate-"
                        "padded / subsampled to this)")
    p.add_argument("--score_thresh", type=float, default=0.1,
                   help="rpn score gate (generate_box_dataset.py:111)")
    p.add_argument("--max_proposals", type=int, default=64)
    p.add_argument("--max_crop", type=int, default=2048,
                   help="per-crop point cap (reference stores all in-4m "
                        "points; crops past the cap are truncated + logged)")
    args = p.parse_args()
    cfg, log = setup(args)
    if args.points:
        cfg.RPN.NUM_POINTS = args.points
        if args.points <= 2048:
            cfg.RPN.SA_CONFIG.NPOINTS = [args.points // 4, args.points // 16,
                                         args.points // 64, args.points // 256]

    import jax
    import jax.numpy as jnp
    from ws3d_tpu.datasets import RPNDataset
    from ws3d_tpu.datasets.rpn_dataset import points_in_rotated_boxes_np
    from ws3d_tpu.models import build_model, init_model
    from ws3d_tpu.pipeline.inference import rpn_propose, crop_membership
    from ws3d_tpu.training.checkpoint import load_part_checkpoint

    src = make_scene_source(args, num_scenes=args.scenes)
    ds = RPNDataset(src, cfg, mode="EVAL", seed=args.seed)
    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(args.seed))
    if args.ckpt:
        variables = load_part_checkpoint(variables, args.ckpt,
                                         subtrees=("rpn",))
        log.info("loaded rpn ckpt %s", args.ckpt)

    variables = jax.device_put(variables)   # pin once: restored ckpts are host numpy
    num_points = int(cfg.RPN.NUM_POINTS)

    @jax.jit
    def infer(pts, valid):
        out = model.apply(variables, {"pts_input": pts[None]}, train=False,
                          method=model.rpn_forward)
        centers, scores, pvalid = rpn_propose(
            out["rpn_cls"][0], out["rpn_reg"][0], out["backbone_xyz"][0],
            cfg.RPN.LOC_SCOPE, cfg.RPN.LOC_BIN_SIZE,
            score_thresh=args.score_thresh,
            max_proposals=args.max_proposals, point_valid=valid)
        scores_norm = jax.nn.sigmoid(out["rpn_cls"][0, :, 0])
        idx, count = crop_membership(pts[:, 0:3], centers, args.max_crop,
                                     point_valid=valid)
        return centers, scores_norm, pvalid, idx, count

    database = []
    instance_id = 0
    fg_sum = gfg_sum = bg_sum = 0
    recall_count = gt_count = 0
    truncated = 0
    for i in range(min(len(ds), args.scenes)):
        sample = ds.get_whole_scene(i, max_points=num_points)
        if int(sample["n_valid"]) < num_points:
            pass                      # duplicate-padded (valid mask covers it)
        pts = sample["pts_input"]
        centers, scores_norm, pvalid, idx, count = jax.tree.map(
            np.asarray, infer(jnp.asarray(pts),
                              jnp.asarray(sample["valid"])))
        gt_boxes = sample["gt_boxes"]           # real labels (534 instances)
        noise_boxes = sample["noise_boxes"]     # BEV click labels

        # per-scene proposal recall tally (generate_box_dataset.py:186-187)
        if len(noise_boxes) and pvalid.any():
            d_pn = np.hypot(
                noise_boxes[:, None, 0] - centers[None, pvalid, 0],
                noise_boxes[:, None, 2] - centers[None, pvalid, 1])
            recall_count += int((d_pn.min(axis=1) < 0.7).sum())
        gt_count += len(noise_boxes)

        for k in range(centers.shape[0]):
            if not pvalid[k]:
                continue
            n_in = int(count[k])
            if n_in > args.max_crop:
                truncated += 1
                n_in = args.max_crop
            if n_in <= 5:               # train: skip tiny crops (:293)
                continue
            sel = idx[k, :n_in]
            center = np.array([centers[k, 0], 0.0, centers[k, 1]],
                              np.float32)
            crop_pts = pts[sel, 0:3] - center[None, :]
            reflect = (pts[sel, 3] if pts.shape[1] > 3
                       else np.zeros(n_in, np.float32))
            prob_mask = scores_norm[sel]

            fg_flag = False
            box_id = -1
            gt_box = np.zeros(7, np.float32)
            gt_mask = np.zeros(n_in, np.float32)
            d_real = (np.hypot(gt_boxes[:, 0] - center[0],
                               gt_boxes[:, 2] - center[2])
                      if len(gt_boxes) else np.full(1, np.inf))
            d_noise = (np.hypot(noise_boxes[:, 0] - center[0],
                                noise_boxes[:, 2] - center[2])
                       if len(noise_boxes) else np.full(1, np.inf))
            if d_real.min() < 0.7 or d_noise.min() < 0.7:
                fg_flag = True
            if d_real.min() < 1.5 and len(gt_boxes):
                box_id = int(d_real.argmin())
                gt_box = gt_boxes[box_id].copy()
                gt_box[0] -= center[0]
                gt_box[2] -= center[2]
                big = gt_box.copy()
                big[3:6] *= 1.2          # dim-scaled in_hull (:236-240)
                # host NumPy twin — the jnp version here was an EAGER
                # per-proposal dispatch over the TPU tunnel (~1 s each,
                # ~80 s/scene; CLAUDE.md eager-dispatch pathology)
                inb = points_in_rotated_boxes_np(crop_pts, big[None])[:, 0]
                gt_mask = inb.astype(np.float32)

            database.append({
                "instance_id": instance_id,
                "sample_id": int(sample["sample_id"]),
                "box_id": box_id,
                "center": center,
                "foreground_flag": fg_flag,
                "gt_boxes": gt_box,
                "cur_box_point": crop_pts.astype(np.float32),
                "cur_box_reflect": reflect.astype(np.float32),
                "cur_prob_mask": prob_mask.astype(np.float32),
                "gt_mask": gt_mask,
            })
            instance_id += 1
            fg_sum += int(fg_flag)
            gfg_sum += int(box_id >= 0)
            bg_sum += int(not fg_flag)
        log.info("scene %d (id %d): %d proposals so far — fg %d, bg %d, "
                 "Gfg %d, recall %.4f", i, int(sample["sample_id"]),
                 instance_id, fg_sum, bg_sum, gfg_sum,
                 recall_count / max(gt_count, 1))
    if truncated:
        log.warning("%d crops exceeded --max_crop=%d and were truncated",
                    truncated, args.max_crop)

    out_path = args.out or os.path.join(args.output_dir, "boxes.pkl")
    with open(out_path, "wb") as f:
        pickle.dump(database, f)
    log.info("wrote %d records -> %s", len(database), out_path)


if __name__ == "__main__":
    main()
