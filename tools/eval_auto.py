"""Full two-stage detector eval / auto-annotator.

Equivalent of /root/reference/tools/eval_auto.py:137-757, restructured
TPU-first: the per-proposal serial RCNN loop becomes one batched (K, 512, _)
forward inside a single jitted per-scene function
(ws3d_tpu.pipeline.make_two_stage_fn); NMS sweeps run on device over fixed
candidate sets; only the KITTI txt dump happens on host.

Synthetic smoke run:
    python tools/eval_auto.py --synthetic --scenes 2
"""
from __future__ import annotations

import os

import numpy as np

from common import base_parser, setup, make_scene_source


from ws3d_tpu.datasets.kitti_io import save_kitti_format  # noqa: E402


def main():
    p = base_parser("two-stage eval / auto-annotator with KITTI AP")
    p.add_argument("--scenes", type=int, default=16)
    p.add_argument("--points", type=int, default=None)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--no_ap", action="store_true")
    p.add_argument("--rpn_ckpt", type=str, default=None,
                   help="separate stage-1 ckpt to stack with --ckpt (the\n"
                        "reference stacks RPN + RCNN ckpts the same way,\n"
                        "eval_active.py:677-703)")
    p.add_argument("--bench_weights", action="store_true",
                   help="overlay ws3d_tpu/data/bench_weights.npz (the\n"
                        "fitted weights bench.py measures with) — for AP\n"
                        "checks of the exact benched configuration")
    p.add_argument("--mesh", type=int, default=0,
                   help="data-parallel inference over the first N devices:\n"
                        "batches sharded on the scene axis, params\n"
                        "replicated (requires --batch %% N == 0)")
    args = p.parse_args()
    cfg, log = setup(args)
    cfg.RCNN.ENABLED = True
    cfg.IOUN.ENABLED = True
    if args.points:
        cfg.RPN.NUM_POINTS = args.points
        if args.points <= 2048:
            cfg.RPN.SA_CONFIG.NPOINTS = [args.points // 4, args.points // 16,
                                         args.points // 64, args.points // 256]

    import jax
    import jax.numpy as jnp
    from ws3d_tpu.datasets import RPNDataset
    from ws3d_tpu.eval import annos_from_objects, get_official_eval_result
    from ws3d_tpu.eval.kitti_ap import anno_from_lines
    from ws3d_tpu.models import build_model, init_model
    from ws3d_tpu.pipeline import make_two_stage_fn
    from ws3d_tpu.training.checkpoint import load_part_checkpoint

    src = make_scene_source(args, num_scenes=args.scenes)
    ds = RPNDataset(src, cfg, mode="EVAL", seed=args.seed)
    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(args.seed))
    if args.ckpt:
        variables = load_part_checkpoint(variables, args.ckpt,
                                         subtrees=("rpn", "rcnn"))
        log.info("loaded ckpt %s", args.ckpt)
    if args.rpn_ckpt:
        variables = load_part_checkpoint(variables, args.rpn_ckpt,
                                         subtrees=("rpn",))
        log.info("loaded rpn ckpt %s", args.rpn_ckpt)
    if args.bench_weights:
        from ws3d_tpu.utils.npz_overlay import overlay_flat_npz
        wpath = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "ws3d_tpu", "data",
            "bench_weights.npz")
        variables, o, t = overlay_flat_npz(variables, wpath)
        log.info("overlaid fitted bench weights (%d/%d leaves)", o, t)

    run_eval(model, cfg, variables, src, ds, log,
             scenes=args.scenes, batch=args.batch,
             output_dir=args.output_dir, no_ap=args.no_ap,
             mesh_devices=args.mesh)


def run_eval(model, cfg, variables, src, ds, log, *, scenes, batch=1,
             output_dir, no_ap=False, mesh_devices=0, fn=None):
    """Batched two-stage eval loop: detections -> KITTI txts -> recall
    tally -> official AP. Returns the AP result dict (or None with no_ap).

    `fn` may be a pre-jitted two-stage function — the checkpoint sweep
    (eval_all_ckpt.py) passes the same fn across checkpoints so the 3-8 min
    tunnel compile is paid ONCE, not per checkpoint."""
    import jax
    import jax.numpy as jnp
    from ws3d_tpu.eval import annos_from_objects, get_official_eval_result
    from ws3d_tpu.eval.kitti_ap import anno_from_lines
    from ws3d_tpu.pipeline import make_two_stage_fn

    mesh = None
    if mesh_devices:
        # data-parallel inference (SURVEY.md §2.6): scenes sharded over the
        # mesh's data axis, params replicated; XLA partitions the whole
        # two-stage graph (every stage is batch-leading) with zero
        # collectives in the forward path
        from ws3d_tpu.parallel import (batch_sharding, make_mesh,
                                       replicated_sharding)
        mesh = make_mesh(mesh_devices)
        if max(batch, 1) % mesh.devices.size:
            raise SystemExit("--batch must be divisible by --mesh")
        log.info("data-parallel inference mesh over %d devices",
                 mesh.devices.size)
        variables = jax.device_put(variables, replicated_sharding(mesh))
        batch_shd = batch_sharding(mesh)
    else:
        variables = jax.device_put(variables)  # restored ckpts are host numpy
    if fn is None:
        fn = jax.jit(make_two_stage_fn(model, cfg))
    out_dir = os.path.join(output_dir, "final_result", "data")

    from ws3d_tpu.datasets.kitti_io import objs_to_boxes3d
    from ws3d_tpu.eval.recall import RecallTally
    tally = RecallTally()
    gt_frames, det_count = [], 0
    n = min(len(ds), scenes)
    bsz = max(batch, 1)

    def dispatch(lo):
        """Stage the next batch on device WITHOUT syncing (dispatch is async
        on TPU): host-side loading/dump of batch i overlaps device compute
        of batch i+1 — the reference's loop is fully serial
        (eval_auto.py:328-410)."""
        idxs = list(range(lo, min(lo + bsz, n)))
        samples = [ds.get_sample(i) for i in idxs]
        stack = np.stack([s["pts_input"] for s in samples])
        if stack.shape[0] < bsz:     # pad the tail batch to the jit shape
            stack = np.concatenate(
                [stack, np.repeat(stack[-1:], bsz - stack.shape[0], 0)])
        dev_stack = (jax.device_put(stack, batch_shd) if mesh is not None
                     else jnp.asarray(stack))
        return idxs, samples, fn(variables, dev_stack)["packed"]

    pending = None
    for lo in list(range(0, n, bsz)) + [None]:
        nxt = dispatch(lo) if lo is not None else None
        if pending is None:
            pending = nxt
            continue
        idxs, samples, out_fut = pending
        pending = nxt
        packed = np.asarray(out_fut)          # ONE transfer per batch
        for j, i in enumerate(idxs):
            scene = src.get_scene(ds.sample_ids[i])
            keep = packed[j, :, 8] > 0.5
            boxes = packed[j, :, 0:7][keep]
            scores = packed[j, :, 7][keep]
            det_count += boxes.shape[0]
            save_kitti_format(int(samples[j]["sample_id"]), scene.calib,
                              boxes, out_dir, scores, scene.image_shape,
                              classes=cfg.CLASSES)
            gt_frames.append(scene.labels)
            gt_boxes = objs_to_boxes3d(
                [o for o in scene.labels if o.cls_type in ("Car", "Van")])
            tally.update(boxes, gt_boxes)
            log.info("scene %d: %d detections (recall %d/%d)", i,
                     boxes.shape[0], tally.recalled[3], tally.total_gt)

    log.info("total detections: %d over %d scenes", det_count, n)
    for line in tally.summary_lines():
        log.info(line)
    if no_ap:
        return None
    gt_annos = annos_from_objects(gt_frames)
    dt_annos = []
    for i in range(n):
        path = os.path.join(out_dir, "%06d.txt"
                            % int(ds.get_sample(i)["sample_id"]))
        with open(path) as f:
            dt_annos.append(anno_from_lines(f.readlines()))
    result, ret = get_official_eval_result(gt_annos, dt_annos,
                                           cfg.CLASSES)
    log.info("\n%s", result)
    log.info("Car 3D AP e/m/h: %.2f / %.2f / %.2f",
             ret["Car_3d_easy"], ret["Car_3d_moderate"],
             ret["Car_3d_hard"])
    return ret


if __name__ == "__main__":
    main()
