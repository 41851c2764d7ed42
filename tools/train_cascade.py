"""Stage-2 training driver: RCNN (cascade1) and IOUN (cascade_later).

Equivalents of /root/reference/tools/train_cascade1.py (RCNN head, batch 800,
40k iters) and train_cascade_later.py (IOUN cascade on a frozen RCNN trunk,
10k iters): one driver, `--stage rcnn|ioun`.

Synthetic smoke runs:
    python tools/train_cascade.py --stage rcnn --synthetic --steps 2 --batch 8
    python tools/train_cascade.py --stage ioun --synthetic --steps 2 --batch 8
"""
from __future__ import annotations

import os
import pickle

from common import base_parser, setup


def main():
    p = base_parser("train stage-2 RCNN / IOUN cascade")
    p.add_argument("--stage", choices=["rcnn", "ioun"], default="rcnn")
    p.add_argument("--db", type=str, default=None,
                   help="proposal database pickle from generate_box_dataset")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--steps", type=int, default=40000)
    p.add_argument("--npoints", type=int, default=512)
    p.add_argument("--cascade", type=int, default=None)
    p.add_argument("--weakly_ratio", type=float, default=None)
    p.add_argument("--db_size", type=int, default=64,
                   help="synthetic database size")
    p.add_argument("--val_ratio", type=float, default=0.1,
                   help="held-out fraction of the database for in-training "
                        "eval (0 disables)")
    p.add_argument("--val_every", type=int, default=None,
                   help="eval cadence in steps (default total/20)")
    args = p.parse_args()
    cfg, log = setup(args)
    cfg.RPN.ENABLED = False
    cfg.RCNN.ENABLED = True
    cfg.IOUN.ENABLED = args.stage == "ioun"
    if args.cascade:
        cfg.CASCADE = args.cascade
    cfg.RCNN.NUM_POINTS = args.npoints
    if args.npoints < 512:
        scale = 512 // args.npoints
        cfg.RCNN.SA_CONFIG.NPOINTS = [max(256 // scale, 4),
                                      max(128 // scale, 2),
                                      max(32 // scale, 1), -1]
        cfg.IOUN.SA_CONFIG.NPOINTS = cfg.RCNN.SA_CONFIG.NPOINTS

    import jax
    from ws3d_tpu.datasets.boxplace_dataset import (
        BoxPlaceDataset, synthetic_proposal_database)
    from ws3d_tpu.models import build_model, init_model
    from ws3d_tpu.training import (create_train_state, Trainer,
                                   save_checkpoint, load_part_checkpoint)

    if args.db:
        with open(args.db, "rb") as f:
            database = pickle.load(f)
    else:
        database = synthetic_proposal_database(num=args.db_size,
                                               seed=args.seed,
                                               crop_points=args.npoints)
    val_db = []
    if args.val_ratio and len(database) >= 8:
        import numpy as np
        r = np.random.RandomState(666)
        order = r.permutation(len(database))
        n_val = max(int(len(database) * args.val_ratio), 2)
        val_db = [database[i] for i in order[:n_val]]
        database = [database[i] for i in order[n_val:]]
    ds = BoxPlaceDataset(database, cfg, mode="TRAIN", npoints=args.npoints,
                         seed=args.seed, weakly_ratio=args.weakly_ratio)
    log.info("stage-2 dataset: %d samples (stage=%s cascade=%d)",
             len(ds), args.stage, cfg.CASCADE)

    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(args.seed))
    if args.ckpt:
        variables = load_part_checkpoint(variables, args.ckpt,
                                         subtrees=("rcnn",))
        log.info("loaded rcnn pretrain %s", args.ckpt)

    state = create_train_state(model, cfg, variables,
                               total_steps=args.steps, stage=args.stage)
    trainer = Trainer(model, cfg, state, stage=args.stage, seed=args.seed,
                      log_fn=log.info,
                      tb_dir=os.path.join(args.output_dir, "tb"))
    epoch_size = max(len(ds) // args.batch, 1)
    total_epochs = max(args.steps // epoch_size, 1)

    def batches():
        count = 0
        while count < args.steps:
            epoch = count // epoch_size
            ratio = trainer.prob_mask_ratio(epoch, total_epochs)
            for b in ds.batches(args.batch, steps=epoch_size,
                                prob_mask_ratio=ratio):
                yield b
                count += 1
                if count >= args.steps:
                    return

    # held-out eval during training (reference: eval_epoch_rcnn/ioun on
    # small_val, train_utils.py:248-515)
    val_fn = None
    if val_db:
        from ws3d_tpu.training.validation import make_val_fn
        val_ds = BoxPlaceDataset(val_db, cfg, mode="EVAL",
                                 npoints=args.npoints, seed=args.seed)
        val_bs = min(args.batch, len(val_ds))
        val_steps = max(len(val_ds) // val_bs, 1)
        val_fn = make_val_fn(model, cfg, args.stage,
                             lambda: val_ds.batches(val_bs, steps=val_steps,
                                                    shuffle=False))
        log.info("in-training val: %d held-out crops", len(val_ds))

    trainer.train_steps(batches(), total_steps=args.steps,
                        log_every=max(args.steps // 100, 1),
                        epoch_size=epoch_size,
                        ckpt_dir=args.output_dir,
                        val_fn=val_fn, val_every=args.val_every)
    if trainer.best_val is not None:
        log.info("best val: %s", trainer.best_val)
    trainer.recalibrate_bn(ds.batches(args.batch, steps=20))
    ckpt = os.path.join(args.output_dir, f"{args.stage}_ckpt")
    save_checkpoint(ckpt, trainer.state)
    log.info("saved checkpoint: %s", ckpt)


if __name__ == "__main__":
    main()
