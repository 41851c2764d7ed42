"""Active (click-seeded) annotator eval.

Equivalent of /root/reference/tools/eval_active.py:137-757: proposal centers
come from the weak BEV click labels instead of the RPN; each click expands
into a 5x5 grid of 0.1 m offsets (25 hypotheses, eval_active.py:203-209),
all hypotheses run through the batched stage-2 net at once, then score
threshold + greedy self-NMS + KITTI dump/AP as in eval_auto.

Synthetic smoke run:
    python tools/eval_active.py --synthetic --scenes 2
"""
from __future__ import annotations

import os

import numpy as np

from common import base_parser, setup, make_scene_source
from eval_auto import save_kitti_format

GRID = 5
GRID_STEP = 0.1


SLOT_BUCKETS = (128, 256, 512, 1024)


def click_gaussian_mask(pts_rect: np.ndarray, centers: np.ndarray,
                        gauss_height: float, gauss_status: float,
                        gauss_cov: float) -> np.ndarray:
    """Gaussian point mask around the click centers
    (/root/reference/tools/eval_active.py:656-675): per point,
    exp(-clip(min_k dist_k - status, 0, 100)^2 / (2*cov)) with
    dist = sqrt((x-cx)^2 + (y*height)^2 + (z-cz)^2) — the same formula as
    the RPN's Gaussian weak training labels, so this delegates to
    gaussian_weak_labels and keeps one golden-tested implementation."""
    from ws3d_tpu.datasets.rpn_dataset import gaussian_weak_labels
    cls_label, _ = gaussian_weak_labels(
        pts_rect, centers, gauss_height=gauss_height,
        gauss_status=gauss_status, gauss_cov=gauss_cov)
    return cls_label


def expand_clicks(centers_xz: np.ndarray):
    """(M, 2) clicks -> (slots, 2) 5x5-grid hypotheses + valid mask, padded
    to the smallest fitting jit bucket so NO hypothesis is dropped (the
    reference loops all of them, eval_active.py:203-209,251-309; a fixed cap
    silently truncated scenes with >5 clicks)."""
    offs = (np.arange(GRID) - GRID // 2) * GRID_STEP
    grid = np.stack(np.meshgrid(offs, offs), -1).reshape(-1, 2)   # (25, 2)
    hyp = (centers_xz[:, None, :] + grid[None]).reshape(-1, 2)
    n = hyp.shape[0]
    slots = next((b for b in SLOT_BUCKETS if b >= n), None)
    if slots is None:
        raise ValueError(
            f"{n} hypotheses ({centers_xz.shape[0]} clicks) exceed the "
            f"largest jit bucket {SLOT_BUCKETS[-1]}; split the scene")
    valid = np.zeros(slots, bool)
    valid[:n] = True
    pad = np.zeros((slots - n, 2), np.float32)
    return (np.concatenate([hyp, pad]).astype(np.float32), valid)


def main():
    p = base_parser("click-seeded annotator eval (stage-2 only)")
    p.add_argument("--scenes", type=int, default=16)
    p.add_argument("--no_ap", action="store_true")
    args = p.parse_args()
    cfg, log = setup(args)
    cfg.RCNN.ENABLED = True
    cfg.IOUN.ENABLED = True

    import jax
    import jax.numpy as jnp
    from ws3d_tpu.datasets.kitti_io import objs_to_boxes3d
    from ws3d_tpu.eval import annos_from_objects, get_official_eval_result
    from ws3d_tpu.eval.kitti_ap import anno_from_lines
    from ws3d_tpu.models import build_model, init_model
    from ws3d_tpu.pipeline.inference import (crop_for_rcnn,
                                             finalize_detections)
    from ws3d_tpu.training.checkpoint import load_part_checkpoint

    src = make_scene_source(args, num_scenes=args.scenes)
    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(args.seed))
    if args.ckpt:
        variables = load_part_checkpoint(variables, args.ckpt,
                                         subtrees=("rcnn",))
        log.info("loaded ckpt %s", args.ckpt)

    variables = jax.device_put(variables)   # pin once: restored ckpts are host numpy

    @jax.jit
    def infer(pts, scores_norm, centers, valid):
        K = centers.shape[0]          # bucketed slot count (128/256/512/1024)
        crops, empty = crop_for_rcnn(pts, scores_norm, centers)
        out = model.apply(variables, crops, train=False,
                          method=model.rcnn_forward)
        boxes = out.get("refined_box", out["pred_boxes3d"]).reshape(K, 7)
        iou = out.get("rcnn_iou", jax.nn.sigmoid(out["rcnn_cls"]))
        boxes, scores, keep = finalize_detections(
            boxes, out["rcnn_cls"], iou, centers, valid & ~empty,
            rcnn_thresh=cfg.RCNN.SCORE_THRESH,
            iou_thresh=cfg.IOUN.SCORE_THRESH)
        # one packed (K, 9) record -> one host transfer (one tunnel RTT)
        return jnp.concatenate(
            [boxes, scores[:, None], keep[:, None].astype(boxes.dtype)],
            axis=-1)

    from ws3d_tpu.eval.recall import RecallTally
    tally = RecallTally()
    out_dir = os.path.join(args.output_dir, "final_result", "data")
    gt_frames, dt_paths = [], []
    for i in range(args.scenes):
        scene = src.get_scene(src.sample_ids[i], with_noise=True)
        clicks = objs_to_boxes3d(
            [o for o in scene.noise_labels if o.cls_type in ("Car", "Van")])
        pts_rect = scene.pts_rect
        pts = np.hstack([pts_rect, scene.pts_intensity[:, None] - 0.5])
        # bucket-pad the point count so jit compiles O(log N) variants, not
        # one per scene; sentinel points sit far outside any crop radius
        n_pad = 1 << max(int(np.ceil(np.log2(max(pts.shape[0], 1024)))), 10)
        if pts.shape[0] < n_pad:
            pad = np.full((n_pad - pts.shape[0], pts.shape[1]), 1e4,
                          np.float32)
            pts = np.concatenate([pts, pad])
        if clicks.shape[0] == 0:
            save_kitti_format(scene.sample_id, scene.calib,
                              np.zeros((0, 7)), out_dir, np.zeros(0),
                              scene.image_shape, classes=cfg.CLASSES)
        else:
            hyp, valid = expand_clicks(clicks[:, [0, 2]])
            # no RPN here: the stage-2 mask channel comes from a Gaussian
            # of distance to the clicks (reference eval_active.py:187,
            # click_gaussian_mask) — crop_for_rcnn turns it into
            # train_mask = (score > 0.5) - 0.5 like eval_active.py:262-267.
            # Sentinel pad points get score 0 (they sit outside any crop).
            scores = np.zeros(pts.shape[0], np.float32)
            scores[:pts_rect.shape[0]] = click_gaussian_mask(
                pts_rect, clicks[:, 0:3], cfg.RPN.GAUSS_HEIGHT,
                cfg.RPN.GAUSS_STATUS, cfg.RPN.GAUSS_COV)
            packed = np.asarray(infer(
                jnp.asarray(pts, jnp.float32), jnp.asarray(scores),
                jnp.asarray(hyp), jnp.asarray(valid)))
            boxes, scores_out = packed[:, 0:7], packed[:, 7]
            keep = packed[:, 8] > 0.5
            save_kitti_format(scene.sample_id, scene.calib, boxes[keep],
                              out_dir, scores_out[keep], scene.image_shape,
                              classes=cfg.CLASSES)
            gt_boxes = objs_to_boxes3d(
                [o for o in scene.labels if o.cls_type in ("Car", "Van")])
            tally.update(boxes[keep], gt_boxes)
            log.info("scene %d: %d clicks -> %d hypothesis slots -> %d "
                     "boxes", i, clicks.shape[0], hyp.shape[0],
                     int(keep.sum()))
        gt_frames.append(scene.labels)
        dt_paths.append(os.path.join(out_dir, "%06d.txt" % scene.sample_id))

    for line in tally.summary_lines():
        log.info(line)
    if not args.no_ap:
        gt_annos = annos_from_objects(gt_frames)
        dt_annos = []
        for path in dt_paths:
            with open(path) as f:
                dt_annos.append(anno_from_lines(f.readlines()))
        result, ret = get_official_eval_result(gt_annos, dt_annos,
                                               cfg.CLASSES)
        log.info("\n%s", result)


if __name__ == "__main__":
    main()
