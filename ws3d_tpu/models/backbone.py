"""Pointnet2MSG backbone: 4 MSG SA stages + 4 FP stages back to all points.

Channel wiring mirrors /root/reference/lib/net/pointnet2_msg.py:11-70 with
the weaklyRPN.yaml SA/FP configs; returns per-point xyz and features in
channel-last layout (B, N, 128).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ws3d_tpu.models.pointnet2 import PointnetFPModule, PointnetSAModuleMSG


class Pointnet2MSG(nn.Module):
    sa_npoints: Any       # e.g. [4096, 1024, 256, 64]
    sa_radius: Any        # e.g. [[0.1, 0.5], ...]
    sa_nsample: Any       # e.g. [[16, 32], ...]
    sa_mlps: Any          # per-stage per-scale hidden channels
    fp_mlps: Any          # e.g. [[128,128], [256,256], [512,512], [512,512]]
    use_bn: bool = True
    use_xyz: bool = True
    bq_chunk: int = 512
    nn_chunk: int = 2048
    sorted_points: bool = False    # inputs z-sorted (cfg.TPU.SORT_POINTS_Z)
    dtype: Any = None

    @nn.compact
    def __call__(self, pts: jnp.ndarray, train: bool = False, bn_momentum=0.1):
        """pts (B, N, 3+C) -> (xyz (B, N, 3), features (B, N, fp_mlps[0][-1]))."""
        xyz = pts[..., 0:3]
        features = pts[..., 3:] if pts.shape[-1] > 3 else None

        l_xyz, l_feats = [xyz], [features]
        for k in range(len(self.sa_npoints)):
            new_xyz, new_feats = PointnetSAModuleMSG(
                npoint=int(self.sa_npoints[k]),
                radii=list(self.sa_radius[k]),
                nsamples=list(self.sa_nsample[k]),
                mlps=[list(m) for m in self.sa_mlps[k]],
                use_xyz=self.use_xyz, use_bn=self.use_bn,
                bq_chunk=self.bq_chunk, sorted_points=self.sorted_points,
                dtype=self.dtype, name=f"sa_{k}",
            )(l_xyz[k], l_feats[k], train=train, bn_momentum=bn_momentum)
            l_xyz.append(new_xyz)
            l_feats.append(new_feats)

        n_fp = len(self.fp_mlps)
        for i in range(n_fp - 1, -1, -1):
            # NOTE: sorted_points is deliberately NOT forwarded — the
            # ring-search windowed 3-NN (three_interpolate_window_pallas)
            # measured SLOWER than the dense fused kernel at every FP shape
            # (FP1 14.2 vs 10.4 ms, B=16; see BENCH.md round-3 journal):
            # with no radius to bound the window, the per-tile top-3
            # insertion logic costs more VPU ops than the skipped distance
            # tiles save.
            l_feats[i] = PointnetFPModule(
                mlp=list(self.fp_mlps[i]), use_bn=self.use_bn,
                nn_chunk=self.nn_chunk, dtype=self.dtype, name=f"fp_{i}",
            )(l_xyz[i], l_xyz[i + 1], l_feats[i], l_feats[i + 1],
              train=train, bn_momentum=bn_momentum)

        return l_xyz[0], l_feats[0]
