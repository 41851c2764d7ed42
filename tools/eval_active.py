"""Active (click-seeded) annotator eval — batched.

Equivalent of /root/reference/tools/eval_active.py:137-757: proposal centers
come from the weak BEV click labels instead of the RPN; each click expands
into a 5x5 grid of 0.1 m offsets (25 hypotheses, eval_active.py:203-209),
all hypotheses run through the batched stage-2 net, then score threshold +
greedy self-NMS + KITTI dump/AP. NOTE the reference applies NO car-size gate
here (eval_active.py:460-461 gates on scores only — the size gate belongs to
eval_auto.py:433-436), so finalize runs with size_gate=False.

TPU restructuring (the reference loops scenes serially, one forward per
scene): scenes are grouped by (point-pad, hypothesis-slot) jit bucket and run
in fixed-size batches of --batch scenes — ONE crop + stage-2 + finalize graph
per bucket, one packed (B, K, 9) host transfer per batch, all batches of a
group dispatched back-to-back before draining (the device executes in
order). Within each batch the live hypothesis slots are compacted to a
host-chosen top-V bucket before the stage-2 net (the same pooling trick as
pipeline/inference.py) so half-empty click grids don't pay full-slot compute.

Synthetic smoke run:
    python tools/eval_active.py --synthetic --scenes 2
"""
from __future__ import annotations

import os
import time

import numpy as np

from common import base_parser, setup, make_scene_source
from eval_auto import save_kitti_format

GRID = 5
GRID_STEP = 0.1


SLOT_BUCKETS = (128, 256, 512, 1024)
V_BUCKETS = (128, 256, 512, 1024, 2048, 4096, 8192)


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


def plan_batches(bucket_keys, batch_size):
    """Group scene indices by jit-bucket key into fixed-size batches.

    :param bucket_keys: per-scene hashable key (n_pad, slots)
    :param batch_size: scenes per device batch
    :return: list of (key, [scene indices], n_pad_scenes) — each batch has
        exactly `batch_size` entries after padding; padded entries repeat the
        first index with an all-False valid mask (discarded on the host).
    """
    groups: dict = {}
    for i, key in enumerate(bucket_keys):
        groups.setdefault(key, []).append(i)
    plan = []
    for key, idxs in groups.items():
        for off in range(0, len(idxs), batch_size):
            chunk = idxs[off:off + batch_size]
            n_pad = batch_size - len(chunk)
            plan.append((key, chunk + [chunk[0]] * n_pad, n_pad))
    return plan


def pick_v_bucket(n_live: int, max_v: int) -> int:
    """Smallest V bucket holding all live hypothesis slots (compaction can
    never drop a live hypothesis — the reference runs every one)."""
    for b in V_BUCKETS:
        if b >= n_live and b <= max_v:
            return b
    return max_v


def main():
    p = base_parser("click-seeded annotator eval (stage-2 only)")
    p.add_argument("--scenes", type=int, default=16)
    p.add_argument("--batch", type=int, default=8,
                   help="scenes per device batch")
    p.add_argument("--max_points", type=int, default=16384,
                   help="deterministic per-scene point cap (same pure "
                        "(seed, sample_id) subsample policy as the eval "
                        "loader, rpn_dataset.py:_eval_rng); 0 = no cap. "
                        "Dense scenes otherwise promote to the 32768-point "
                        "jit bucket, which doubles compiles and at "
                        "(32768 pts x 256 slots) triggers a TPU-worker "
                        "fault in the fused crop+net+finalize program "
                        "(BENCH.md round 5 — finalize is split into its "
                        "own jit below for the same reason)")
    p.add_argument("--no_ap", action="store_true")
    p.add_argument("--bench_weights", action="store_true",
                   help="overlay ws3d_tpu/data/bench_weights.npz (the "
                        "fitted weights bench.py measures with)")
    args = p.parse_args()
    cfg, log = setup(args)
    cfg.RCNN.ENABLED = True
    cfg.IOUN.ENABLED = True

    import jax
    import jax.numpy as jnp
    from functools import partial
    from ws3d_tpu.datasets.kitti_io import objs_to_boxes3d
    from ws3d_tpu.eval import annos_from_objects, get_official_eval_result
    from ws3d_tpu.eval.kitti_ap import anno_from_lines
    from ws3d_tpu.models import build_model, init_model
    from ws3d_tpu.pipeline.inference import (crop_for_rcnn_batched,
                                             finalize_detections)
    from ws3d_tpu.training.checkpoint import load_part_checkpoint

    src = make_scene_source(args, num_scenes=args.scenes)
    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(args.seed))
    if args.ckpt:
        variables = load_part_checkpoint(variables, args.ckpt,
                                         subtrees=("rcnn",))
        log.info("loaded ckpt %s", args.ckpt)
    if args.bench_weights:
        from ws3d_tpu.utils.npz_overlay import overlay_flat_npz
        wpath = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "ws3d_tpu", "data",
            "bench_weights.npz")
        variables, o, t = overlay_flat_npz(variables, wpath)
        log.info("overlaid fitted bench weights (%d/%d leaves)", o, t)

    variables = jax.device_put(variables)   # pin once: restored ckpts are host numpy

    @partial(jax.jit, static_argnums=(4,))
    def infer_batch(pts, scores_norm, centers, valid, V):
        """pts (B, N, 4), scores_norm (B, N), centers (B, K, 2),
        valid (B, K) -> (boxes_f (B, K, 7), cls_f (B, K), iou_f (B, K),
        live (B, K)). V: static live-slot budget — the live crops of the
        whole batch are pooled and only the top-V (V >= live count,
        host-checked) run the stage-2 net.

        NOTE finalize/self-NMS runs in a SEPARATE jit (finalize_batch):
        fusing it into this program crashes the TPU worker at the
        (N=32768, K=256) bucket (reproduced 3x, finalize-alone and
        crop+net-alone both pass — an XLA/Mosaic program-composition
        fault, journaled in BENCH.md round 5). Two dispatches per batch
        add only host-side queueing; the drain still transfers one packed
        array per batch."""
        B, K = centers.shape[0], centers.shape[1]
        crops, empty = crop_for_rcnn_batched(pts, scores_norm, centers)
        live = valid & ~empty
        live_f = live.reshape(B * K)
        flat = jax.tree_util.tree_map(
            lambda a: a.reshape((B * K,) + a.shape[2:]), crops)
        if V < B * K:
            # lax.top_k is stable: live slots come out in slot order
            _, sel = jax.lax.top_k(live_f.astype(jnp.float32), V)
            crops_c = jax.tree_util.tree_map(lambda a: a[sel], flat)
        else:
            sel, crops_c = None, flat
        out = model.apply(variables, crops_c, train=False,
                          method=model.rcnn_forward)
        boxes_c = out.get("refined_box", out["pred_boxes3d"]).reshape(-1, 7)
        cls_c = out["rcnn_cls"].reshape(-1)
        iou_c = out.get("rcnn_iou", jax.nn.sigmoid(out["rcnn_cls"])).reshape(-1)
        if sel is not None:
            # scatter back via one-hot matmul (exact; `.at[sel].set` lowers
            # to a dynamic-update-slice chain — see pipeline/inference.py)
            onehot = (jnp.arange(B * K)[None, :]
                      == sel[:, None]).astype(boxes_c.dtype)     # (V, B*K)
            hit = jnp.sum(onehot, axis=0)                        # (B*K,)
            boxes_f = jax.lax.dot_general(
                onehot, boxes_c, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST)             # (B*K, 7)
            neg_inf = jnp.asarray(-jnp.inf, cls_c.dtype)
            cls_f = jnp.where(hit > 0.5,
                              jnp.sum(onehot * cls_c[:, None], axis=0),
                              neg_inf)
            iou_f = jnp.where(hit > 0.5,
                              jnp.sum(onehot * iou_c[:, None], axis=0),
                              neg_inf)
        else:
            boxes_f, cls_f, iou_f = boxes_c, cls_c, iou_c
        return (boxes_f.reshape(B, K, 7), cls_f.reshape(B, K),
                iou_f.reshape(B, K), live)

    @jax.jit
    def finalize_batch(boxes_f, cls_f, iou_f, centers, live):
        # reference eval_active gates on scores ONLY (eval_active.py:460-461)
        # — no car-size gate (that belongs to eval_auto.py:433-436)
        finalize = partial(finalize_detections,
                           rcnn_thresh=cfg.RCNN.SCORE_THRESH,
                           iou_thresh=cfg.IOUN.SCORE_THRESH,
                           size_gate=False)
        boxes, scores, keep = jax.vmap(finalize)(
            boxes_f, cls_f, iou_f, centers, live)
        return jnp.concatenate(
            [boxes, scores[..., None], keep[..., None].astype(boxes.dtype)],
            axis=-1)

    # ---- host pass 1: load scenes, expand clicks, build bucket entries ----
    scenes, entries, keys = [], [], []
    for i in range(args.scenes):
        scene = src.get_scene(src.sample_ids[i], with_noise=True)
        scenes.append(scene)
        clicks = objs_to_boxes3d(
            [o for o in scene.noise_labels if o.cls_type in ("Car", "Van")])
        pts_rect = scene.pts_rect
        intensity = scene.pts_intensity
        if args.max_points and pts_rect.shape[0] > args.max_points:
            # pure function of (seed, sample_id) — call-history invariant
            # (rpn_dataset.py:_eval_rng); index-sorted to keep the scene
            # z-order the grouped crop kernel requires
            rs = np.random.RandomState(
                (args.seed * 100003 + 7919 * int(scene.sample_id) + 1)
                % (2**31 - 1))
            sel = np.sort(rs.choice(pts_rect.shape[0], args.max_points,
                                    replace=False))
            pts_rect, intensity = pts_rect[sel], intensity[sel]
        pts = np.hstack([pts_rect, intensity[:, None] - 0.5])
        # bucket-pad the point count so jit compiles O(log N) variants, not
        # one per scene; sentinel points sit far outside any crop radius
        n_pad = 1 << max(int(np.ceil(np.log2(max(pts.shape[0], 1024)))), 10)
        if pts.shape[0] < n_pad:
            pad = np.full((n_pad - pts.shape[0], pts.shape[1]), 1e4,
                          np.float32)
            pts = np.concatenate([pts, pad])
        if clicks.shape[0] == 0:
            entries.append(None)
            keys.append(None)
            continue
        hyp, valid = expand_clicks(clicks[:, [0, 2]])
        # no RPN here: the stage-2 mask channel comes from a Gaussian of
        # distance to the clicks (reference eval_active.py:187,
        # click_gaussian_mask) — crop_for_rcnn turns it into
        # train_mask = (score > 0.5) - 0.5 like eval_active.py:262-267.
        # Sentinel pad points get score 0 (outside any crop).
        scores = np.zeros(pts.shape[0], np.float32)
        scores[:pts_rect.shape[0]] = click_gaussian_mask(
            pts_rect, clicks[:, 0:3], cfg.RPN.GAUSS_HEIGHT,
            cfg.RPN.GAUSS_STATUS, cfg.RPN.GAUSS_COV)
        entries.append((pts.astype(np.float32), scores, hyp, valid))
        keys.append((n_pad, valid.shape[0]))

    # ---- device pass: batched per bucket, dispatch-all then drain ----
    out_dir = os.path.join(args.output_dir, "final_result", "data")
    live_idx = [i for i in range(args.scenes) if entries[i] is not None]
    plan = plan_batches([keys[i] for i in live_idx], args.batch)
    t0 = time.perf_counter()
    pending = []
    for key, rel_idxs, n_pad_scenes in plan:
        idxs = [live_idx[r] for r in rel_idxs]
        pts_b = jnp.asarray(np.stack([entries[i][0] for i in idxs]))
        sc_b = jnp.asarray(np.stack([entries[i][1] for i in idxs]))
        hyp_b = jnp.asarray(np.stack([entries[i][2] for i in idxs]))
        valid_np = np.stack([entries[i][3] for i in idxs])
        if n_pad_scenes:
            valid_np[len(idxs) - n_pad_scenes:] = False
        V = pick_v_bucket(int(valid_np.sum()), valid_np.size)
        boxes_f, cls_f, iou_f, live = infer_batch(
            pts_b, sc_b, hyp_b, jnp.asarray(valid_np), V)
        packed = finalize_batch(boxes_f, cls_f, iou_f, hyp_b, live)
        pending.append((idxs[:args.batch - n_pad_scenes], packed))
    # drain device work first (dispatch-all above overlaps compute with
    # these transfers), THEN do the per-scene host dump/tally — the split
    # separates device+transfer throughput from host postprocessing
    drained = [(idxs, np.asarray(packed_fut)) for idxs, packed_fut in pending]
    t_dev = time.perf_counter() - t0
    from ws3d_tpu.eval.recall import RecallTally
    tally = RecallTally()
    n_boxes = 0
    for idxs, packed in drained:
        for j, i in enumerate(idxs):
            boxes, scores_out = packed[j, :, 0:7], packed[j, :, 7]
            keep = packed[j, :, 8] > 0.5
            n_boxes += int(keep.sum())
            save_kitti_format(scenes[i].sample_id, scenes[i].calib,
                              boxes[keep], out_dir, scores_out[keep],
                              scenes[i].image_shape, classes=cfg.CLASSES)
            gt_boxes = objs_to_boxes3d(
                [o for o in scenes[i].labels
                 if o.cls_type in ("Car", "Van")])
            tally.update(boxes[keep], gt_boxes)
    dt = time.perf_counter() - t0
    log.info("%d scenes (%d with clicks) in %.2fs = %.1f scenes/sec "
             "(device+transfer %.2fs = %.1f scenes/sec; host dump/tally "
             "%.2fs), %d batches, %d boxes", args.scenes, len(live_idx), dt,
             args.scenes / dt, t_dev, args.scenes / t_dev, dt - t_dev,
             len(plan), n_boxes)

    # clickless scenes still get an (empty) dump for the AP harness
    gt_frames, dt_paths = [], []
    for i in range(args.scenes):
        scene = scenes[i]
        if entries[i] is None:
            save_kitti_format(scene.sample_id, scene.calib,
                              np.zeros((0, 7)), out_dir, np.zeros(0),
                              scene.image_shape, classes=cfg.CLASSES)
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
