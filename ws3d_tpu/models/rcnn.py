"""Stage-2 RCNN + IOUN cascade over fixed (B, 512) point crops.

TPU-native equivalent of /root/reference/lib/net/rcnn_net.py:16-399. The
whole stage runs batch-first over proposals: where the reference's eval loop
runs serial B=1 RCNN forwards per proposal (tools/eval_auto.py:328-410), this
module is designed to take all K proposals of a scene as one batch.

Structure per reference:
- xyz up-MLP [128,128] on crop xyz; feature up-MLP [128,128] on
  (reflect, train_mask); merge MLP 256->128 (rcnn_net.py:30-38,253-264)
- 4 single-scale SA stages NPOINTS [256,128,32,global] (rcnn_net.py:40-58)
- cls head (1) + reg head (52 = 6*4 bins + 12*2 heading + 3 size + 1 y)
  (rcnn_net.py:75-112); box decoded in-graph with zero RoI and detached
  (rcnn_net.py:292-308)
- IOUN cascade (rcnn_net.py:314-396): canonicalize the raw crop into the
  predicted-box frame, fresh up/merge + SA stack per stage, IOU/ICL/ref heads,
  refine_box; optional per-stage train-time box jitter.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ws3d_tpu.box_codec import (bottom_to_center, center_to_bottom,
                                decode_box_stage2, refine_box)
from ws3d_tpu.models.layers import SharedMLP, HeadMLP, XAVIER
from ws3d_tpu.models.rpn import _compute_dtype
from ws3d_tpu.models.pointnet2 import PointnetSAModuleMSG
from ws3d_tpu.ops.boxes import rotate_points_along_y

EXTEND_FACTOR = 1.2  # canonical-crop gating (rcnn_net.py:346)


def context_attention(features: jnp.ndarray) -> jnp.ndarray:
    """Parameter-free context-attention residual (cfg.ATTENTION blocks,
    rcnn_net.py:276-283 and 369-376).

    The reference's ATT modules are ``pt_utils.SharedMLP([channel_in])`` —
    a single-element channel list builds ZERO conv layers
    (pytorch_utils.py:20-32), so ``context`` is the features themselves and
    the whole block reduces to
    ``feat += feat @ softmax(featᵀ·feat / sqrt(C), over the source axis)``.

    features (B, N, C) channel-last -> same shape.
    """
    C = features.shape[-1]
    # torch layout is (B, C, N): attention[b,i,j] = Σ_c f[c,i]·f[c,j],
    # softmax over i (dim=1); out[b,c,j] = Σ_i f[b,c,i]·A[b,i,j]
    logits = jnp.einsum("bic,bjc->bij", features, features)
    logits = logits / jnp.sqrt(jnp.asarray(float(C), features.dtype))
    attn = jax.nn.softmax(logits, axis=1)
    return features + jnp.einsum("bij,bic->bjc", attn, features)


class _SAStack(nn.Module):
    """Shared single-scale SA pyramid used by both the RCNN trunk and each
    IOUN cascade stage (rcnn_net.py:40-58 / 140-159)."""
    npoints: Any            # e.g. [256, 128, 32, -1]
    radius: Any
    nsample: Any
    mlps: Any
    use_bn: bool = False
    bq_chunk: int = 512
    attention: bool = False  # cfg.ATTENTION (rcnn_net.py:276-283)
    sorted_points: bool = False  # crops z-sorted (cfg.TPU.SORT_POINTS_Z)
    dtype: Any = None

    @nn.compact
    def __call__(self, xyz, features, train: bool = False, bn_momentum=0.1):
        for k in range(len(self.npoints)):
            npoint = None if int(self.npoints[k]) == -1 else int(self.npoints[k])
            if self.attention and features is not None:
                features = context_attention(features)
            xyz, features = PointnetSAModuleMSG(
                npoint=npoint, radii=[float(self.radius[k])],
                nsamples=[int(self.nsample[k])], mlps=[list(self.mlps[k])],
                use_bn=self.use_bn, bq_chunk=self.bq_chunk, dtype=self.dtype,
                sorted_points=self.sorted_points,
                name=f"sa_{k}")(xyz, features, train=train,
                                bn_momentum=bn_momentum)
        return features        # (B, 1, C_last)


class RCNNNet(nn.Module):
    mean_size: Tuple[float, float, float] = (1.5, 1.6, 3.9)
    xyz_up_layer: Sequence[int] = (128, 128)
    sa_npoints: Any = (256, 128, 32, -1)
    sa_radius: Any = (0.2, 0.4, 1.0, 100.0)
    sa_nsample: Any = (16, 32, 64, 64)
    sa_mlps: Any = ((128, 128, 128), (128, 128, 128),
                    (128, 128, 256), (256, 256, 512))
    cls_fc: Sequence[int] = (256, 256)
    reg_fc: Sequence[int] = (256, 256)
    use_bn: bool = False
    dp_ratio: float = 0.0
    loc_scope: float = 1.5
    loc_bin_size: float = 0.5
    num_head_bin: int = 12
    loc_y_scope: float = 0.5
    loc_y_bin_size: float = 0.25
    # IOUN cascade
    ioun_enabled: bool = False
    cascade: int = 1
    ioun_sa_npoints: Any = (256, 128, 32, -1)
    ioun_sa_radius: Any = (0.2, 0.4, 1.0, 100.0)
    ioun_sa_nsample: Any = (16, 32, 64, 64)
    ioun_sa_mlps: Any = ((128, 128, 128), (128, 128, 128),
                         (128, 128, 256), (256, 256, 512))
    ioun_cls_fc: Sequence[int] = (256, 256)
    ioun_reg_fc: Sequence[int] = (256, 256)
    ioun_use_bn: bool = False
    ioun_dp_ratio: float = 0.0
    bq_chunk: int = 512
    attention: bool = False   # cfg.ATTENTION: context-attn before each SA
    # crops arrive z-sorted (cfg.TPU.SORT_POINTS_Z, sorted by the crop
    # producers: crop_for_rcnn_batched / BoxPlaceDataset) — lets the SA
    # stacks dispatch the windowed fused kernel; the cascade re-sorts its
    # canonicalized frame in-graph
    sorted_points: bool = False
    dtype: Any = None

    @property
    def reg_channels(self) -> int:
        per_loc_bin_num = int(self.loc_scope / self.loc_bin_size) * 2
        return per_loc_bin_num * 4 + self.num_head_bin * 2 + 3 + 1

    def setup(self):
        # setup-style (not nn.compact) so inference can call trunk() and
        # cascade() separately: the two-stage pipeline runs the RCNN trunk
        # on a compacted valid-proposal budget and the (expensive) IOUN
        # cascade on only the rcnn-score-gate survivors, instead of B*K
        # fixed slots. Attribute names reproduce the previous explicit
        # name= strings (flax auto-names list entries with _<index>), so
        # the param tree is unchanged across the refactor.
        # out_f32=False on the BN-less up/merge chain: the fused-SA comb0
        # precompute rounds the features to bf16 anyway, and the f32
        # intermediates were pure HBM round-trip doubling (~1 ms at V=1024)
        self.xyz_up = SharedMLP(list(self.xyz_up_layer), use_bn=self.use_bn,
                                dtype=self.dtype,
                                out_f32=self.use_bn or self.dtype is None)
        self.feature_up = SharedMLP(list(self.xyz_up_layer),
                                    use_bn=self.use_bn, dtype=self.dtype,
                                    out_f32=self.use_bn or self.dtype is None)
        self.merge_down = SharedMLP([self.xyz_up_layer[-1]],
                                    use_bn=self.use_bn, dtype=self.dtype,
                                    out_f32=self.use_bn or self.dtype is None)
        self.sa_stack = _SAStack(
            npoints=self.sa_npoints, radius=self.sa_radius,
            nsample=self.sa_nsample, mlps=self.sa_mlps, use_bn=self.use_bn,
            bq_chunk=self.bq_chunk, attention=self.attention,
            sorted_points=self.sorted_points, dtype=self.dtype)
        self.cls_head = HeadMLP(
            hidden=list(self.cls_fc), out_channels=1, use_bn=self.use_bn,
            dp_ratio=self.dp_ratio, dtype=self.dtype, kernel_init=XAVIER,
            final_kernel_init=XAVIER)
        self.reg_head = HeadMLP(
            hidden=list(self.reg_fc), out_channels=self.reg_channels,
            use_bn=self.use_bn, dp_ratio=self.dp_ratio, dtype=self.dtype,
            kernel_init=XAVIER,
            final_kernel_init=nn.initializers.normal(0.001))
        if not self.ioun_enabled:
            return
        ncas = int(self.cascade)
        can_f32 = self.ioun_use_bn or self.dtype is None
        self.can_xyz_up = [
            SharedMLP(list(self.xyz_up_layer), use_bn=self.ioun_use_bn,
                      dtype=self.dtype, out_f32=can_f32)
            for _ in range(ncas)]
        self.can_feature_up = [
            SharedMLP(list(self.xyz_up_layer), use_bn=self.ioun_use_bn,
                      dtype=self.dtype, out_f32=can_f32)
            for _ in range(ncas)]
        self.can_merge_down = [
            SharedMLP([self.xyz_up_layer[-1]], use_bn=self.ioun_use_bn,
                      dtype=self.dtype, out_f32=can_f32)
            for _ in range(ncas)]
        self.sa_score = [
            _SAStack(npoints=self.ioun_sa_npoints,
                     radius=self.ioun_sa_radius,
                     nsample=self.ioun_sa_nsample, mlps=self.ioun_sa_mlps,
                     use_bn=self.ioun_use_bn, bq_chunk=self.bq_chunk,
                     attention=self.attention,
                     sorted_points=self.sorted_points, dtype=self.dtype)
            for _ in range(ncas)]
        self.iou_head = [
            HeadMLP(hidden=list(self.ioun_cls_fc), out_channels=1,
                    use_bn=self.ioun_use_bn, dp_ratio=self.ioun_dp_ratio,
                    kernel_init=XAVIER, final_kernel_init=XAVIER)
            for _ in range(ncas)]
        self.icl_head = [
            HeadMLP(hidden=list(self.ioun_cls_fc), out_channels=1,
                    use_bn=self.ioun_use_bn, dp_ratio=self.ioun_dp_ratio,
                    kernel_init=XAVIER, final_kernel_init=XAVIER)
            for _ in range(ncas)]
        self.ref_head = [
            HeadMLP(hidden=list(self.ioun_reg_fc), out_channels=7,
                    use_bn=self.ioun_use_bn, dp_ratio=self.ioun_dp_ratio,
                    kernel_init=XAVIER, final_kernel_init=XAVIER)
            for _ in range(ncas)]

    def trunk(self, cur_box_point: jnp.ndarray,
              cur_box_reflect: jnp.ndarray, train_mask: jnp.ndarray,
              train: bool = False, bn_momentum=0.1) -> Dict[str, jnp.ndarray]:
        """RCNN trunk only (rcnn_net.py:253-308): up/merge MLPs, SA pyramid,
        cls/reg heads, in-graph box decode. Boxes bottom-y, crop frame."""
        B = cur_box_point.shape[0]
        xyz = cur_box_point
        raw_features = jnp.concatenate([cur_box_reflect, train_mask], axis=-1)

        up_xyz = self.xyz_up(xyz, train=train, bn_momentum=bn_momentum)
        up_feat = self.feature_up(raw_features, train=train,
                                  bn_momentum=bn_momentum)
        merged = self.merge_down(
            jnp.concatenate([up_xyz, up_feat], axis=-1), train=train,
            bn_momentum=bn_momentum)

        trunk = self.sa_stack(xyz, merged, train=train,
                              bn_momentum=bn_momentum)      # (B, 1, 512)

        rcnn_cls = self.cls_head(trunk, train=train,
                                 bn_momentum=bn_momentum).reshape(B)
        rcnn_reg = self.reg_head(trunk, train=train,
                                 bn_momentum=bn_momentum).reshape(B, -1)

        zero_roi = jnp.zeros((B, 3), dtype=rcnn_reg.dtype)
        pred_boxes3d = jax.lax.stop_gradient(decode_box_stage2(
            zero_roi, rcnn_reg, jnp.asarray(self.mean_size, rcnn_reg.dtype),
            loc_scope=self.loc_scope, loc_bin_size=self.loc_bin_size,
            num_head_bin=self.num_head_bin, get_xz_fine=False,
            get_ry_fine=False, loc_y_scope=self.loc_y_scope,
            loc_y_bin_size=self.loc_y_bin_size))          # (B, 7) bottom-y

        return {"rcnn_cls": rcnn_cls, "rcnn_reg": rcnn_reg,
                "pred_boxes3d": pred_boxes3d}

    def cascade_fwd(self, cur_box_point: jnp.ndarray,
                    cur_box_reflect: jnp.ndarray, train_mask: jnp.ndarray,
                    pred_boxes3d: jnp.ndarray,
                    iou_noise: Optional[Dict[str, jnp.ndarray]] = None,
                    train: bool = False,
                    bn_momentum=0.1) -> Dict[str, jnp.ndarray]:
        """IOUN cascade (rcnn_net.py:314-396) from a trunk-predicted box:
        canonicalize crop into the box frame, fresh up/merge + SA stack per
        stage, IOU/ICL/ref heads, refine_box. pred_boxes3d (B, 7) bottom-y
        in the crop frame."""
        B = cur_box_point.shape[0]
        raw_features = jnp.concatenate([cur_box_reflect, train_mask], axis=-1)
        out: Dict[str, jnp.ndarray] = {}

        boxes_ce = bottom_to_center(pred_boxes3d)         # (B, 7) center-y
        rcnn_ref = None
        for c in range(self.cascade):
            if c != 0:
                boxes_ce = refine_box(boxes_ce, rcnn_ref)
            if iou_noise is not None:
                boxes_ce = jnp.concatenate([
                    boxes_ce[:, 0:3] + iou_noise["trans"][..., c],
                    boxes_ce[:, 3:6] * iou_noise["scale"][..., c],
                    boxes_ce[:, 6:7] + iou_noise["ry"][..., c],
                ], axis=-1)

            shifted = cur_box_point - boxes_ce[:, None, 0:3]
            canon = rotate_points_along_y(shifted, boxes_ce[:, 6])
            # normalize into half-extent units: x/l, y/h, z/w (rcnn_net.py:347-349)
            half = jnp.stack([boxes_ce[:, 5], boxes_ce[:, 3],
                              boxes_ce[:, 4]], axis=-1) / 2.0
            canon = canon / jnp.clip(half[:, None, :], min=1e-6)
            gate = jnp.max(jnp.abs(canon), axis=-1, keepdims=True) > EXTEND_FACTOR
            canon = jnp.where(gate, 0.0, canon)

            stage_features = raw_features
            if self.sorted_points:
                # the y-rotation above mixes x/z, so the crop's z-order does
                # not survive canonicalization — re-sort the 5 raw channels
                # (per-point up/merge MLPs are permutation-equivariant, so
                # sorting before them is equivalent) to restore the windowed
                # kernel's invariant. Multi-operand lax.sort: argsort+take
                # on the point axis lowers to dynamic row gathers.
                z, x, y, rf, mk = jax.lax.sort(
                    (canon[..., 2], canon[..., 0], canon[..., 1],
                     raw_features[..., 0], raw_features[..., 1]),
                    dimension=1, num_keys=1)
                canon = jnp.stack([x, y, z], axis=-1)
                stage_features = jnp.stack([rf, mk], axis=-1)

            c_xyz = self.can_xyz_up[c](canon, train=train,
                                       bn_momentum=bn_momentum)
            c_feat = self.can_feature_up[c](stage_features, train=train,
                                            bn_momentum=bn_momentum)
            c_merged = self.can_merge_down[c](
                jnp.concatenate([c_xyz, c_feat], axis=-1), train=train,
                bn_momentum=bn_momentum)

            feat = self.sa_score[c](canon, c_merged, train=train,
                                    bn_momentum=bn_momentum)

            rcnn_iou = self.iou_head[c](feat, train=train,
                                        bn_momentum=bn_momentum)
            ioun_cls = self.icl_head[c](feat, train=train,
                                        bn_momentum=bn_momentum)
            rcnn_ref = self.ref_head[c](feat, train=train,
                                        bn_momentum=bn_momentum).reshape(B, 7)

            pred_boxes3d = center_to_bottom(boxes_ce)
            refined_box = refine_box(pred_boxes3d, rcnn_ref)
            out.update({"rcnn_iou": rcnn_iou.reshape(B),
                        "ioun_cls": ioun_cls.reshape(B),
                        "rcnn_ref": rcnn_ref,
                        "pred_boxes3d": pred_boxes3d,
                        "refined_box": refined_box})
        return out

    def __call__(self, cur_box_point: jnp.ndarray,
                 cur_box_reflect: jnp.ndarray, train_mask: jnp.ndarray,
                 iou_noise: Optional[Dict[str, jnp.ndarray]] = None,
                 train: bool = False, bn_momentum=0.1) -> Dict[str, jnp.ndarray]:
        """cur_box_point (B, P, 3) crop xyz (proposal-centered),
        cur_box_reflect (B, P, 1), train_mask (B, P, 1).

        iou_noise (train-time cascade jitter, kitti_boxplace_dataset.py:504-534):
        dict with 'trans' (B, 3, CASCADE), 'scale' (B, 3, CASCADE),
        'ry' (B, 1, CASCADE).

        Returns rcnn_cls (B,), rcnn_reg (B, 52), pred_boxes3d (B, 7) and — if
        ioun_enabled — rcnn_iou (B,), ioun_cls (B,), rcnn_ref (B, 7),
        refined_box (B, 7). Boxes are bottom-y in the crop frame.
        """
        out = self.trunk(cur_box_point, cur_box_reflect, train_mask,
                         train=train, bn_momentum=bn_momentum)
        if not self.ioun_enabled:
            return out
        out.update(self.cascade_fwd(
            cur_box_point, cur_box_reflect, train_mask, out["pred_boxes3d"],
            iou_noise=iou_noise, train=train, bn_momentum=bn_momentum))
        return out


def rcnn_from_config(cfg) -> RCNNNet:
    """Build the stage-2 net from a ws3d_tpu ConfigNode."""
    if not cfg.RCNN.ROI_SAMPLE_JIT:
        # the reference's ROI_SAMPLE_JIT=False branch parses a pre-pooled
        # pts_input layout (rcnn_net.py:246-251 else-path, dead in every
        # shipped yaml); this framework implements the live =True layout
        # (cur_box_point/cur_box_reflect/train_mask) only
        raise NotImplementedError(
            "RCNN.ROI_SAMPLE_JIT=False (legacy pre-pooled input layout) is "
            "not supported; use the cur_box_point crop layout")
    return RCNNNet(
        mean_size=tuple(cfg.CLS_MEAN_SIZE[0]),
        xyz_up_layer=tuple(cfg.RCNN.XYZ_UP_LAYER),
        sa_npoints=cfg.RCNN.SA_CONFIG.NPOINTS,
        sa_radius=cfg.RCNN.SA_CONFIG.RADIUS,
        sa_nsample=cfg.RCNN.SA_CONFIG.NSAMPLE,
        sa_mlps=cfg.RCNN.SA_CONFIG.MLPS,
        cls_fc=tuple(cfg.RCNN.CLS_FC),
        reg_fc=tuple(cfg.RCNN.REG_FC),
        use_bn=cfg.RCNN.USE_BN,
        dp_ratio=cfg.RCNN.DP_RATIO,
        loc_scope=cfg.RCNN.LOC_SCOPE,
        loc_bin_size=cfg.RCNN.LOC_BIN_SIZE,
        num_head_bin=cfg.RCNN.NUM_HEAD_BIN,
        loc_y_scope=cfg.RCNN.LOC_Y_SCOPE,
        loc_y_bin_size=cfg.RCNN.LOC_Y_BIN_SIZE,
        ioun_enabled=cfg.IOUN.ENABLED,
        cascade=cfg.CASCADE,
        ioun_sa_npoints=cfg.IOUN.SA_CONFIG.NPOINTS,
        ioun_sa_radius=cfg.IOUN.SA_CONFIG.RADIUS,
        ioun_sa_nsample=cfg.IOUN.SA_CONFIG.NSAMPLE,
        ioun_sa_mlps=cfg.IOUN.SA_CONFIG.MLPS,
        ioun_cls_fc=tuple(cfg.IOUN.CLS_FC),
        ioun_reg_fc=tuple(cfg.IOUN.REG_FC),
        ioun_use_bn=cfg.IOUN.USE_BN,
        ioun_dp_ratio=cfg.IOUN.DP_RATIO,
        bq_chunk=cfg.TPU.BALL_QUERY_CHUNK,
        attention=bool(cfg.ATTENTION),
        sorted_points=bool(cfg.TPU.get("SORT_POINTS_Z", True)),
        dtype=_compute_dtype(cfg),
    )
