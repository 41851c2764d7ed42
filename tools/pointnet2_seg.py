"""Standalone foreground-segmentation smoke trainer for the pointnet2 ops.

Equivalent of /root/reference/pointnet2_lib/tools/train_and_eval.py: a small
Pointnet2MSG + per-point classifier trained with DiceLoss on whole scenes,
used as the end-to-end exercise of the kernel layer (FPS, ball query,
grouping, FP interpolation). Reports foreground IoU.

Smoke run:
    python tools/pointnet2_seg.py --synthetic --steps 5 --points 1024 --cpu
"""
from __future__ import annotations

from common import base_parser, setup, make_scene_source


def main():
    p = base_parser("pointnet2 foreground-segmentation smoke trainer")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--points", type=int, default=4096)
    p.add_argument("--scenes", type=int, default=16)
    p.add_argument("--lr", type=float, default=0.002)
    args = p.parse_args()
    cfg, log = setup(args)
    cfg.RPN.NUM_POINTS = args.points
    cfg.RPN.SA_CONFIG.NPOINTS = [max(args.points // 4, 8),
                                 max(args.points // 16, 4),
                                 max(args.points // 64, 2),
                                 max(args.points // 256, 1)]

    import jax
    import jax.numpy as jnp
    import optax
    from flax import linen as nn
    from ws3d_tpu import losses
    from ws3d_tpu.datasets import RPNDataset
    from ws3d_tpu.models.backbone import Pointnet2MSG
    from ws3d_tpu.models.layers import HeadMLP

    class SegNet(nn.Module):
        @nn.compact
        def __call__(self, pts, train=False):
            _, feats = Pointnet2MSG(
                sa_npoints=cfg.RPN.SA_CONFIG.NPOINTS,
                sa_radius=cfg.RPN.SA_CONFIG.RADIUS,
                sa_nsample=cfg.RPN.SA_CONFIG.NSAMPLE,
                sa_mlps=cfg.RPN.SA_CONFIG.MLPS,
                fp_mlps=cfg.RPN.FP_MLPS, name="backbone")(pts, train=train)
            return HeadMLP(hidden=[128], out_channels=1,
                           name="seg_head")(feats, train=train)

    src = make_scene_source(args, num_scenes=args.scenes)
    ds = RPNDataset(src, cfg, mode="EVAL", npoints=args.points,
                    seed=args.seed)

    model = SegNet()
    rng = jax.random.PRNGKey(args.seed)
    variables = jax.jit(lambda r, x: model.init(
        {"params": r, "dropout": r}, x, train=False))(
        rng, jnp.zeros((1, args.points, 4)))
    tx = optax.adam(args.lr)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, batch_stats, opt_state, batch, rng):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                batch["pts_input"], train=True, rngs={"dropout": rng},
                mutable=["batch_stats"])
            lbl = jnp.clip(batch["rpn_cls_label"], 0, 1)
            loss = losses.dice_loss(out, lbl)
            iou = 1.0 - loss
            return loss, (iou, mut["batch_stats"])
        (loss, (iou, bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), bs, opt_state2, loss, iou

    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    it = ds.batches(args.batch)
    for i, batch in enumerate(it):
        if i >= args.steps:
            break
        rng, sub = jax.random.split(rng)
        params, batch_stats, opt_state, loss, iou = step(
            params, batch_stats, opt_state, batch, sub)
        if i % max(args.steps // 20, 1) == 0:
            log.info("step %d: dice_loss=%.4f fg_soft_iou=%.4f",
                     i, float(loss), float(iou))
    log.info("done: final dice_loss=%.4f", float(loss))


if __name__ == "__main__":
    main()
