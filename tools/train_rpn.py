"""Stage-1 (weak RPN) training driver.

Equivalent flow to /root/reference/tools/train_rpn.py:133-228 (which, as
shipped, contains a syntax error at :47 and cannot run unmodified): weakly
supervised training of the center-vote RPN on BEV-click labels with OneCycle
Adam, grad-clip 1.0, BN-momentum decay and periodic checkpoints.

Synthetic smoke run:
    python tools/train_rpn.py --synthetic --steps 2 --batch 2 --points 2048
"""
from __future__ import annotations

import os

from common import base_parser, setup, make_scene_source


def main():
    p = base_parser("train stage-1 RPN from weak BEV-click labels")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--steps", type=int, default=8000)
    p.add_argument("--points", type=int, default=None)
    p.add_argument("--weakly_num", type=int, default=500,
                   help="weak-scene budget (first N non-empty scenes)")
    p.add_argument("--ckpt_every", type=int, default=1000)
    p.add_argument("--scenes", type=int, default=64,
                   help="synthetic scene count")
    p.add_argument("--val_scenes", type=int, default=8,
                   help="small_val scene count (0 disables in-training eval)")
    p.add_argument("--val_every", type=int, default=None,
                   help="eval cadence in steps (default total/20)")
    p.add_argument("--mesh", type=int, default=0,
                   help="data-parallel over N devices (0 = single)")
    args = p.parse_args()
    cfg, log = setup(args)
    if args.points:
        cfg.RPN.NUM_POINTS = args.points
        if args.points <= 2048:
            cfg.RPN.SA_CONFIG.NPOINTS = [args.points // 4, args.points // 16,
                                         args.points // 64, args.points // 256]

    import jax
    from ws3d_tpu.datasets import RPNDataset
    from ws3d_tpu.models import build_model, init_model
    from ws3d_tpu.training import create_train_state, Trainer, save_checkpoint

    src = make_scene_source(args, num_scenes=args.scenes)
    ds = RPNDataset(src, cfg, mode="TRAIN",
                    weakly_num=args.weakly_num if not args.synthetic else None,
                    seed=args.seed)
    log.info("dataset: %d scenes, %d points/scene", len(ds),
             cfg.RPN.NUM_POINTS)

    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(args.seed))
    state = create_train_state(model, cfg, variables,
                               total_steps=args.steps, stage="rpn")
    mesh = None
    if args.mesh:
        from ws3d_tpu.parallel import make_mesh
        mesh = make_mesh(args.mesh)
        log.info("data-parallel mesh over %d devices", mesh.devices.size)

    trainer = Trainer(model, cfg, state, stage="rpn", seed=args.seed,
                      mesh=mesh, log_fn=log.info,
                      tb_dir=os.path.join(args.output_dir, "tb"))
    epoch_size = max(len(ds) // args.batch, 1)
    if args.ckpt:
        from ws3d_tpu.training import restore_train_state
        trainer.state = restore_train_state(trainer.state, args.ckpt)
        log.info("resumed from %s at step %d", args.ckpt,
                 int(trainer.state.step))
    # small_val in-training eval (reference: eval_epoch_rpn on small_val
    # every ~E/20 epochs, train_utils.py:150-245,523)
    val_fn = None
    if args.val_scenes:
        from ws3d_tpu.training.validation import make_val_fn
        if args.synthetic or not args.data_root:
            from ws3d_tpu.datasets import SyntheticKitti
            val_src = SyntheticKitti(num_scenes=args.val_scenes,
                                     points_per_scene=18000,
                                     seed=args.seed + 1000)
        else:
            from ws3d_tpu.datasets import KittiRaw
            try:
                val_src = KittiRaw(args.data_root, split="small_val")
            except Exception:
                val_src = KittiRaw(args.data_root, split="val")
        val_ds = RPNDataset(val_src, cfg, mode="EVAL", seed=args.seed)
        val_bs = min(args.batch, max(len(val_ds), 1))
        val_steps = max(len(val_ds) // val_bs, 1)
        val_fn = make_val_fn(model, cfg, "rpn",
                             lambda: val_ds.batches(val_bs, steps=val_steps,
                                                    shuffle=False))
        log.info("in-training val: %d scenes", len(val_ds))

    trainer.train_steps(ds.batches(args.batch), total_steps=args.steps,
                        log_every=max(args.steps // 100, 1),
                        epoch_size=epoch_size,
                        ckpt_every=args.ckpt_every,
                        ckpt_dir=args.output_dir,
                        val_fn=val_fn, val_every=args.val_every)
    if trainer.best_val is not None:
        log.info("best val: %s", trainer.best_val)
    trainer.recalibrate_bn(ds.batches(args.batch))

    ckpt = os.path.join(args.output_dir, "rpn_ckpt")
    save_checkpoint(ckpt, trainer.state)
    log.info("saved checkpoint: %s", ckpt)


if __name__ == "__main__":
    main()
