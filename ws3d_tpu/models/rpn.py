"""Stage-1 RPN: Pointnet2MSG backbone + per-point cls / center-vote heads.

TPU-native equivalent of /root/reference/lib/net/rpn.py:10-81. Heads are
Dense stacks over the trailing channel axis (1x1 Conv1d in the reference);
the cls head's final bias is initialized to -log((1-pi)/pi), pi=0.01
(rpn.py:60-63) and the reg head's final kernel to N(0, 0.001) (rpn.py:65).
"""
from __future__ import annotations

import math
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ws3d_tpu.models.backbone import Pointnet2MSG
from ws3d_tpu.models.layers import HeadMLP

FOCAL_PRIOR_BIAS = -math.log((1 - 0.01) / 0.01)


def _compute_dtype(cfg):
    import jax.numpy as jnp
    name = str(cfg.TPU.COMPUTE_DTYPE)
    return jnp.bfloat16 if name == "bfloat16" else None


class RPN(nn.Module):
    sa_npoints: Any
    sa_radius: Any
    sa_nsample: Any
    sa_mlps: Any
    fp_mlps: Any
    cls_fc: Sequence[int] = (128,)
    reg_fc: Sequence[int] = (128,)
    reg_channels: int = 40          # per_loc_bin_num * 4 (LOC_SCOPE 4.0 / 0.8)
    use_bn: bool = True
    dp_ratio: float = 0.5
    bq_chunk: int = 512
    nn_chunk: int = 2048
    sorted_points: bool = False    # cfg.TPU.SORT_POINTS_Z: input z-sorted
    dtype: Any = None

    @nn.compact
    def __call__(self, pts: jnp.ndarray, train: bool = False, bn_momentum=0.1):
        """pts (B, N, 3[+intensity]) -> dict with
        rpn_cls (B, N, 1), rpn_reg (B, N, reg_channels),
        backbone_xyz (B, N, 3), backbone_features (B, N, 128)."""
        backbone_xyz, backbone_features = Pointnet2MSG(
            sa_npoints=self.sa_npoints, sa_radius=self.sa_radius,
            sa_nsample=self.sa_nsample, sa_mlps=self.sa_mlps,
            fp_mlps=self.fp_mlps, use_bn=self.use_bn,
            bq_chunk=self.bq_chunk, nn_chunk=self.nn_chunk,
            sorted_points=self.sorted_points,
            dtype=self.dtype, name="backbone")(pts, train=train, bn_momentum=bn_momentum)

        rpn_cls = HeadMLP(
            hidden=list(self.cls_fc), out_channels=1, use_bn=self.use_bn,
            dp_ratio=self.dp_ratio, dtype=self.dtype,
            final_bias_init=nn.initializers.constant(FOCAL_PRIOR_BIAS),
            name="cls_head")(backbone_features, train=train,
                             bn_momentum=bn_momentum)
        rpn_reg = HeadMLP(
            hidden=list(self.reg_fc), out_channels=self.reg_channels,
            use_bn=self.use_bn, dp_ratio=self.dp_ratio, dtype=self.dtype,
            final_kernel_init=nn.initializers.normal(stddev=0.001),
            name="reg_head")(backbone_features, train=train,
                             bn_momentum=bn_momentum)

        return {"rpn_cls": rpn_cls, "rpn_reg": rpn_reg,
                "backbone_xyz": backbone_xyz,
                "backbone_features": backbone_features}


def rpn_from_config(cfg) -> RPN:
    """Build an RPN from a ws3d_tpu ConfigNode (RPN subtree of
    config.default_config / weaklyRPN.yaml)."""
    per_loc_bin_num = int(cfg.RPN.LOC_SCOPE / cfg.RPN.LOC_BIN_SIZE) * 2
    return RPN(
        sa_npoints=cfg.RPN.SA_CONFIG.NPOINTS,
        sa_radius=cfg.RPN.SA_CONFIG.RADIUS,
        sa_nsample=cfg.RPN.SA_CONFIG.NSAMPLE,
        sa_mlps=cfg.RPN.SA_CONFIG.MLPS,
        fp_mlps=cfg.RPN.FP_MLPS,
        cls_fc=tuple(cfg.RPN.CLS_FC),
        reg_fc=tuple(cfg.RPN.REG_FC),
        reg_channels=per_loc_bin_num * 4,
        use_bn=cfg.RPN.USE_BN,
        dp_ratio=cfg.RPN.DP_RATIO,
        bq_chunk=cfg.TPU.BALL_QUERY_CHUNK,
        nn_chunk=cfg.TPU.THREE_NN_CHUNK,
        sorted_points=bool(cfg.TPU.get("SORT_POINTS_Z", True)),
        dtype=_compute_dtype(cfg),
    )
