"""PointNet++ set-abstraction / feature-propagation modules (channel-last).

TPU-native re-design of pointnet2_modules.py in the reference pointnet2_lib:
the grouped tensors are (B, npoint, nsample, C) so every MLP layer is a Dense
on the trailing axis (MXU matmul) and the max-pool is a VPU reduction over
the nsample axis. Semantics (FPS seeding, ball-query padding, max-pool,
use_xyz concat) match pointnet2_modules.py:19-156.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ws3d_tpu.models.layers import SharedMLP
from ws3d_tpu.ops.grouping import (group_all, ball_query_multi,
                                   group_with_idx)
from ws3d_tpu.ops.interpolate import interpolate_features
from ws3d_tpu.ops.sampling import furthest_point_sample_with_coords

# test hook: force the fused SA path (run in interpret mode off-TPU)
FORCE_FUSED_INTERPRET = False
# test hook: force the FP layer-0 fold off-TPU (XLA interpolation)
FORCE_FP_FOLD = False


def folded_mlp_params(mlp, n_layers: int, use_bn: bool):
    """Extract the bound SharedMLP's Dense kernels/biases; with use_bn the
    (inference-time) BatchNorm affine is FOLDED into them:
    y = bn(x @ W) = x @ (W * s) + (beta - mean * s), s = scale/sqrt(var+eps)
    — so BN-ful stages can run through the fused SA kernel at eval."""
    p = mlp.variables["params"]
    kernels, biases = [], []
    for k in range(n_layers):
        W = p[f"Dense_{k}"]["kernel"]
        if use_bn:
            bnp = p[f"BatchNorm_{k}"]
            bns = mlp.variables["batch_stats"][f"BatchNorm_{k}"]
            inv = bnp["scale"] * jax.lax.rsqrt(bns["var"] + 1e-5)
            kernels.append(W * inv[None, :])
            biases.append(bnp["bias"] - bns["mean"] * inv)
        else:
            kernels.append(W)
            biases.append(p[f"Dense_{k}"]["bias"])
    return kernels, biases


class PointnetSAModuleMSG(nn.Module):
    """Multi-scale-grouping set abstraction.

    npoint None => GroupAll (global pooling stage).
    """
    npoint: Optional[int]
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]   # per-scale hidden channels (without input)
    use_xyz: bool = True
    use_bn: bool = True
    bq_chunk: int = 512
    # inputs are z-sorted along the point axis (cfg.TPU.SORT_POINTS_Z —
    # guaranteed by the datasets): FPS picks are re-sorted ascending so the
    # sorted invariant propagates to every level, and the first (small-C,
    # large-N) stage runs the WINDOWED fused kernel instead of the
    # pathological XLA row-gather (~11.5 ns/row regardless of width)
    sorted_points: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, features: Optional[jnp.ndarray],
                 train: bool = False, bn_momentum=0.1):
        """xyz (B, N, 3), features (B, N, C) or None ->
        (new_xyz (B, npoint, 3) or None, new_features (B, npoint, sum(C_out)))."""
        if self.npoint is not None:
            # the kernel emits picked coords alongside indices (saves the
            # new_xyz row gather); the sorted invariant is restored by
            # co-sorting the coords with the index key (multi-operand
            # lax.sort — argsort+take lowers to dynamic lane gathers)
            idx, new_xyz = furthest_point_sample_with_coords(xyz, self.npoint)
            if self.sorted_points:
                _, sx, sy, sz = jax.lax.sort(
                    (idx, new_xyz[..., 0], new_xyz[..., 1], new_xyz[..., 2]),
                    dimension=1, num_keys=1)
                new_xyz = jnp.stack([sx, sy, sz], axis=-1)
            new_xyz = new_xyz.astype(xyz.dtype)
        else:
            new_xyz = None

        use_window = self._use_window(xyz, features, train)
        use_fused = not use_window and self._use_fused(xyz, features, train)
        if self.npoint is not None and not use_fused:
            # one shared distance matrix across the radius scales
            idx_per_scale = ball_query_multi(
                [float(r) for r in self.radii],
                [int(s) for s in self.nsamples], xyz, new_xyz,
                chunk=self.bq_chunk)
        outs = []
        for i in range(len(self.radii)):
            mlp = SharedMLP(self.mlps[i], use_bn=self.use_bn,
                            dtype=self.dtype, name=f"mlp_{i}")
            if use_window:
                cin = features.shape[-1] + 3
                _ = mlp(jnp.zeros((1, 1, 1, cin), xyz.dtype), train=train)
                kernels, biases = folded_mlp_params(
                    mlp, len(self.mlps[i]), self.use_bn)
                from ws3d_tpu.ops.fused_sa_window_pallas import fused_sa_window
                outs.append(fused_sa_window(
                    xyz, features, new_xyz, float(self.radii[i]),
                    int(self.nsamples[i]), kernels, biases,
                    interpret=FORCE_FUSED_INTERPRET))
                continue
            if use_fused:
                # fully fused ball-query+gather+MLP+maxpool kernel: identical
                # param tree — the dummy call materializes the params, whose
                # values (with inference-time BN folded in) feed the Pallas
                # kernel
                cin = features.shape[-1] + 3
                _ = mlp(jnp.zeros((1, 1, 1, cin), xyz.dtype), train=train)
                kernels, biases = folded_mlp_params(
                    mlp, len(self.mlps[i]), self.use_bn)
                from ws3d_tpu.ops.fused_sa_bq_pallas import fused_sa_ballquery
                outs.append(fused_sa_ballquery(
                    xyz, features, new_xyz, float(self.radii[i]),
                    int(self.nsamples[i]), kernels, biases,
                    interpret=FORCE_FUSED_INTERPRET))
                continue
            if self.npoint is not None:
                grouped = group_with_idx(idx_per_scale[i], xyz, new_xyz,
                                         features, use_xyz=self.use_xyz)
            else:
                grouped = group_all(xyz, features, use_xyz=self.use_xyz)
            # (B, M, S, Cin) -> MLP -> max over S
            h = mlp(grouped, train=train, bn_momentum=bn_momentum)
            outs.append(jnp.max(h, axis=2))
        return new_xyz, jnp.concatenate(outs, axis=-1)

    def _use_fused(self, xyz, features, train) -> bool:
        # dtype=bfloat16 is compatible: the fused kernel already runs its
        # selector/MLP matmuls as bf16 multiplicands with f32 accumulation
        # (fused_sa_bq_pallas.py); any other dtype falls back to XLA
        if (self.npoint is None or not self.use_xyz
                or features is None
                or self.dtype not in (None, jnp.bfloat16)
                or self.npoint % 8 != 0 or xyz.shape[1] % 128 != 0):
            return False
        # BN stages fold running stats into the kernel — inference only
        if self.use_bn and train:
            return False
        # the selector matmul wastes MXU lanes when the channel width is
        # tiny AND the point count is large (backbone SA-1: Cin=4,
        # P=16384) — keep the XLA gather there
        if features.shape[-1] + 3 < 32 and xyz.shape[1] > 1024:
            return False
        if FORCE_FUSED_INTERPRET:
            return True
        try:
            return jax.default_backend() in ("tpu", "axon")
        except Exception:                                    # pragma: no cover
            return False

    def _use_window(self, xyz, features, train) -> bool:
        # the windowed kernel REQUIRES the z-sorted invariant; it wins in
        # two measured regimes (BENCH.md round 3): (a) tiny channel width x
        # large point count (backbone SA-1 — the case _use_fused declines),
        # and (b) crop-scale stage-2 SA-1 (P=512, T=4: in-program query
        # subtiles cut the VPU mask work ~3x at unchanged program count).
        # T<4 leaves nothing to prune; large-P wide-C stages (backbone
        # SA-2+) measured faster on the full fused kernel.
        if (not self.sorted_points or self.npoint is None
                or not self.use_xyz or features is None
                or self.dtype not in (None, jnp.bfloat16)
                or self.npoint % 8 != 0 or xyz.shape[1] % 128 != 0):
            return False
        if self.use_bn and train:
            return False
        small_c_large_n = (features.shape[-1] + 3 < 32
                           and xyz.shape[1] > 1024)
        crop_scale = 256 <= xyz.shape[1] <= 1024
        if not (small_c_large_n or crop_scale):
            return False
        if FORCE_FUSED_INTERPRET:
            return True
        try:
            return jax.default_backend() in ("tpu", "axon")
        except Exception:                                    # pragma: no cover
            return False


class PointnetSAModule(PointnetSAModuleMSG):
    """Single-scale set abstraction (PointnetSAModule in the reference)."""

    @classmethod
    def single(cls, npoint, radius, nsample, mlp, use_xyz=True, use_bn=True,
               name=None, bq_chunk=512):
        return cls(npoint=npoint, radii=[radius], nsamples=[nsample],
                   mlps=[mlp], use_xyz=use_xyz, use_bn=use_bn, name=name,
                   bq_chunk=bq_chunk)


class PointnetFPModule(nn.Module):
    """Feature propagation: 3-NN inverse-squared-distance interpolation +
    skip concat + SharedMLP (pointnet2_modules.py:116-156)."""
    mlp: Sequence[int]
    use_bn: bool = True
    nn_chunk: int = 2048
    # both levels z-sorted (cfg.TPU.SORT_POINTS_Z scene clouds + the SA
    # modules' sorted FPS picks): dispatch the ring-search windowed 3-NN
    sorted_points: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, unknown: jnp.ndarray, known: Optional[jnp.ndarray],
                 unknown_feats: Optional[jnp.ndarray],
                 known_feats: jnp.ndarray, train: bool = False,
                 bn_momentum=0.1) -> jnp.ndarray:
        bf16 = self.dtype == jnp.bfloat16
        mlp = SharedMLP(self.mlp, use_bn=self.use_bn, dtype=self.dtype)
        from ws3d_tpu.ops.grouping import _use_pallas
        fold = (known is not None and not train
                and (FORCE_FP_FOLD
                     or _use_pallas(known.shape[1], unknown.shape[1])))
        if fold:
            # layer-0 fold: interpolation is LINEAR in the features, so
            # interp(F) @ W0a == interp(F @ W0a). Pushing the first Dense's
            # interp-rows through the knowns BEFORE interpolation halves
            # the fused kernel's weight matmul and its output width
            # (256 -> 128 at FP-0 scale: ~1.4 ms MXU + half the HBM
            # writes), at the cost of one tiny (m, C)@(C, c0) matmul. The
            # skip rows apply to unknown_feats outside; BN (inference
            # running stats) + bias fold into the extracted kernels
            # (folded_mlp_params). Eval-only: training keeps the standard
            # SharedMLP application (BN batch stats + identical numerics).
            cin = known_feats.shape[-1] + (
                unknown_feats.shape[-1] if unknown_feats is not None else 0)
            _ = mlp(jnp.zeros((1, 1, cin), jnp.float32), train=False)
            kernels, biases = folded_mlp_params(mlp, len(self.mlp),
                                                self.use_bn)
            ci = known_feats.shape[-1]
            cast = (lambda a: a.astype(jnp.bfloat16)) if bf16 else (
                lambda a: a)
            feats_f = jax.lax.dot_general(
                cast(known_feats), cast(kernels[0][:ci]),
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (B, m, c0)
            h = interpolate_features(unknown, known, feats_f,
                                     chunk=self.nn_chunk,
                                     sorted_z=self.sorted_points,
                                     bf16_out=bf16).astype(jnp.float32)
            if unknown_feats is not None:
                h = h + jax.lax.dot_general(
                    cast(unknown_feats), cast(kernels[0][ci:]),
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            h = jnp.maximum(h + biases[0], 0.0)
            for W, b in zip(kernels[1:], biases[1:]):
                z = jax.lax.dot_general(
                    cast(h), cast(W), (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                h = jnp.maximum(z + b, 0.0)
            return h
        if known is not None:
            # with a bf16 compute dtype the fused kernel emits bf16 directly
            # — the first Dense would cast its input anyway, and the f32
            # intermediate costs a full-tensor convert pass + 2x HBM writes
            interp = interpolate_features(unknown, known, known_feats,
                                          chunk=self.nn_chunk,
                                          sorted_z=self.sorted_points,
                                          bf16_out=bf16)
        else:
            interp = jnp.broadcast_to(
                known_feats, (known_feats.shape[0], unknown.shape[1],
                              known_feats.shape[2]))
        if unknown_feats is not None:
            if bf16:
                # keep the concat in bf16 (mixed concat promotes to f32,
                # reintroducing the convert); the Dense casts either way
                interp = interp.astype(jnp.bfloat16)
                unknown_feats = unknown_feats.astype(jnp.bfloat16)
            interp = jnp.concatenate([interp, unknown_feats], axis=-1)
        return mlp(interp, train=train, bn_momentum=bn_momentum)
