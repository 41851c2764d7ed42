"""PointRCNN facade — config-driven two-stage detector.

Equivalent of /root/reference/lib/net/point_rcnn.py:9-60, functional style:
instead of a stateful module that mutates eval/grad flags per cfg.RPN.FIXED,
the facade exposes separate jittable apply functions for each stage and the
caller composes them (freezing = optax mask / stop_gradient at the trainer
level, not module state).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ws3d_tpu.models.rpn import RPN, rpn_from_config
from ws3d_tpu.models.rcnn import RCNNNet, rcnn_from_config


class PointRCNN(nn.Module):
    """Holds the enabled stages; forward dispatches like the reference
    (point_rcnn.py:24-42): RPN when enabled, else RCNN/IOUN."""
    rpn: Optional[RPN] = None
    rcnn: Optional[RCNNNet] = None

    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False,
                 bn_momentum=0.1) -> Dict[str, jnp.ndarray]:
        if self.rpn is not None:
            return self.rpn_forward(batch, train=train, bn_momentum=bn_momentum)
        return self.rcnn_forward(batch, train=train, bn_momentum=bn_momentum)

    def rpn_forward(self, batch, train: bool = False, bn_momentum=0.1):
        assert self.rpn is not None, "RPN stage not enabled"
        return self.rpn(batch["pts_input"], train=train,
                        bn_momentum=bn_momentum)

    def init_all(self, batch, train: bool = False, bn_momentum=0.1):
        """Forward through every enabled stage — used only at init time so
        all parameters exist regardless of which stage a caller jits."""
        out = {}
        if self.rpn is not None:
            out.update(self.rpn_forward(batch, train=train,
                                        bn_momentum=bn_momentum))
        if self.rcnn is not None:
            out.update(self.rcnn_forward(batch, train=train,
                                         bn_momentum=bn_momentum))
        return out

    def rcnn_forward(self, batch, train: bool = False, bn_momentum=0.1):
        assert self.rcnn is not None, "RCNN stage not enabled"
        iou_noise = None
        if "iou_trans" in batch:
            iou_noise = {"trans": batch["iou_trans"],
                         "scale": batch["iou_scale"],
                         "ry": batch["iou_ry"]}
        return self.rcnn(batch["cur_box_point"], batch["cur_box_reflect"],
                         batch["train_mask"], iou_noise=iou_noise,
                         train=train, bn_momentum=bn_momentum)

    def rcnn_trunk_forward(self, batch, train: bool = False, bn_momentum=0.1):
        """RCNN trunk only (no IOUN cascade) — inference-time compaction
        runs the cascade separately on rcnn-score-gate survivors."""
        assert self.rcnn is not None, "RCNN stage not enabled"
        return self.rcnn.trunk(batch["cur_box_point"],
                               batch["cur_box_reflect"],
                               batch["train_mask"], train=train,
                               bn_momentum=bn_momentum)

    def ioun_forward(self, batch, train: bool = False, bn_momentum=0.1):
        """IOUN cascade from a trunk-predicted box (batch['pred_boxes3d'],
        (B, 7) bottom-y crop frame)."""
        assert self.rcnn is not None, "RCNN stage not enabled"
        iou_noise = None
        if "iou_trans" in batch:
            iou_noise = {"trans": batch["iou_trans"],
                         "scale": batch["iou_scale"],
                         "ry": batch["iou_ry"]}
        return self.rcnn.cascade_fwd(
            batch["cur_box_point"], batch["cur_box_reflect"],
            batch["train_mask"], batch["pred_boxes3d"], iou_noise=iou_noise,
            train=train, bn_momentum=bn_momentum)


def build_model(cfg) -> PointRCNN:
    """Create the facade per cfg.{RPN,RCNN,IOUN}.ENABLED flags
    (point_rcnn.py:13-22)."""
    assert cfg.RPN.ENABLED or cfg.RCNN.ENABLED or cfg.IOUN.ENABLED
    rpn = rpn_from_config(cfg) if cfg.RPN.ENABLED else None
    rcnn = rcnn_from_config(cfg) if (cfg.RCNN.ENABLED or cfg.IOUN.ENABLED) else None
    return PointRCNN(rpn=rpn, rcnn=rcnn)


def init_model(model: PointRCNN, cfg, rng: jax.Array,
               batch: Optional[Dict[str, Any]] = None):
    """Initialize variables with a minimal dummy batch matching the enabled
    stages' input contract."""
    if batch is None:
        batch = {}
        if model.rpn is not None:
            c = 4 if cfg.RPN.USE_INTENSITY else 3
            batch["pts_input"] = jnp.zeros((1, cfg.RPN.NUM_POINTS, c))
        if model.rcnn is not None:
            p = cfg.RCNN.NUM_POINTS
            batch.update({"cur_box_point": jnp.zeros((1, p, 3)),
                          "cur_box_reflect": jnp.zeros((1, p, 1)),
                          "train_mask": jnp.zeros((1, p, 1))})
    # jit the init: eager init dispatches each primitive separately, which is
    # pathological on the tunneled TPU backend (~100 ms/op)
    init_fn = jax.jit(lambda r, b: model.init(
        {"params": r, "dropout": r}, b, train=False,
        method=model.init_all))
    return init_fn(rng, batch)
