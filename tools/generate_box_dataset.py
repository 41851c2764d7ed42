"""Stage-1 -> stage-2 handoff: build the proposal-crop database.

Equivalent of /root/reference/generate_box_dataset.py: run the trained RPN
over scenes, decode per-point center votes, threshold (score>0.1,
|vote|>0.2), greedy radius-0.3 NMS, crop 4 m around each kept center and
label it against the (noise) ground truth:
- fg if a gt center lies within 0.7 m of the proposal center (:236-240)
- within 1.5 m ("G-fg"): attach the gt box and a gt point mask from the
  1.2x-enlarged box (:241-251)
Pickles a list of record dicts (:293-322 layout — see
ws3d_tpu.datasets.boxplace_dataset.BoxPlaceDataset).

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
    p.add_argument("--points", type=int, default=None)
    p.add_argument("--score_thresh", type=float, default=0.1,
                   help="rpn score gate (generate_box_dataset.py:111)")
    p.add_argument("--max_proposals", type=int, default=32)
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
    from ws3d_tpu.datasets.kitti_io import objs_to_boxes3d
    from ws3d_tpu.models import build_model, init_model
    from ws3d_tpu.ops.boxes import points_in_rotated_boxes, enlarge_box3d
    from ws3d_tpu.pipeline.inference import rpn_propose, crop_for_rcnn, GROUND_Y
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
    @jax.jit
    def infer(pts):
        out = model.apply(variables, {"pts_input": pts[None]}, train=False,
                          method=model.rpn_forward)
        centers, scores, valid = rpn_propose(
            out["rpn_cls"][0], out["rpn_reg"][0], out["backbone_xyz"][0],
            cfg.RPN.LOC_SCOPE, cfg.RPN.LOC_BIN_SIZE,
            score_thresh=args.score_thresh,
            max_proposals=args.max_proposals)
        scores_norm = jax.nn.sigmoid(out["rpn_cls"][0, :, 0])
        crops, empty = crop_for_rcnn(pts, scores_norm, centers)
        return centers, scores, valid, crops, empty

    database = []
    for i in range(min(len(ds), args.scenes)):
        sample = ds.get_sample(i)
        scene = src.get_scene(ds.sample_ids[i], with_noise=True)
        noise_boxes = objs_to_boxes3d(
            [o for o in scene.noise_labels if o.cls_type in ("Car", "Van")])
        centers, scores, valid, crops, empty = jax.tree.map(
            np.asarray, infer(jnp.asarray(sample["pts_input"])))
        for k in range(centers.shape[0]):
            if not valid[k] or empty[k]:
                continue
            center = np.array([centers[k, 0], 0.0, centers[k, 1]], np.float32)
            crop_pts = crops["cur_box_point"][k]          # proposal frame
            record = {
                "sample_id": int(sample["sample_id"]),
                "box_id": k,
                "center": center,
                "foreground_flag": False,
                "gt_boxes": np.zeros(7, np.float32),
                "cur_box_point": crop_pts + np.array(
                    [0, GROUND_Y, 0], np.float32),        # undo ground shift
                "cur_box_reflect": crops["cur_box_reflect"][k].reshape(-1),
                "cur_prob_mask": crops["train_mask"][k].reshape(-1),
                "gt_mask": crops["train_mask"][k].reshape(-1),
            }
            if len(noise_boxes):
                d = np.hypot(noise_boxes[:, 0] - center[0],
                             noise_boxes[:, 2] - center[2])
                j = int(d.argmin())
                if d[j] < 0.7:
                    record["foreground_flag"] = True
                if d[j] < 1.5:
                    gt = noise_boxes[j].copy()
                    gt[0] -= center[0]
                    gt[2] -= center[2]
                    record["gt_boxes"] = gt
                    big = np.asarray(enlarge_box3d(
                        jnp.asarray(gt[None]), 0.2))[0]
                    inb = np.asarray(points_in_rotated_boxes(
                        jnp.asarray(record["cur_box_point"]),
                        jnp.asarray(big[None])))[:, 0]
                    record["gt_mask"] = np.where(inb, 0.5, -0.5).astype(
                        np.float32)
            database.append(record)
        log.info("scene %d: %d proposals (%d fg)", i,
                 int(valid.sum()),
                 sum(r["foreground_flag"] for r in database
                     if r["sample_id"] == int(sample["sample_id"])))

    out_path = args.out or os.path.join(args.output_dir, "boxes.pkl")
    with open(out_path, "wb") as f:
        pickle.dump(database, f)
    log.info("wrote %d records -> %s", len(database), out_path)


if __name__ == "__main__":
    main()
