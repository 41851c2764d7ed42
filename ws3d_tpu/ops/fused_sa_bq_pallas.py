"""Fully fused set-abstraction kernel: ball query + gather + MLP + max-pool.

One Pallas program per (batch row, query tile) computes the squared-distance
block to all points, runs the in-kernel rank search (prefix sums via bf16
MXU matmuls — exact for counts <= 128), and instead of materializing index
lists builds the SELECTOR matrix sel[m, s, j] = in_ball[m, j] &
(rank[m, j] == target[m, s]) directly in registers. The "gather" is then
sel @ comb on the MXU, followed by the shared MLP (center-subtract folded
into the first bias) and the S-axis max-pool.

Compared to the ball_query_pallas + fused_sa_pallas pair this removes the
(B, M, S) index round-trip through HBM and one full kernel launch per SA
stage; semantics stay CUDA-exact (first-nsample in ascending order,
pad-with-first, point-0 on empty — ball_query_gpu.cu:9-67,
pointnet2_modules.py:19-55).

P is processed in 128-lane tiles with a running global rank, so the same
kernel serves stage-2 crops (P=128..512) and backbone-scale clouds.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

LANE = 128


def layer0_preact(xyz: jnp.ndarray, features: jnp.ndarray,
                  W0: jnp.ndarray) -> jnp.ndarray:
    """Layer-0 pre-activations comb0 = [xyz, feats] @ W0, stored bf16.

    The xyz term is exact f32 FMA (it cancels against the -q @ W0[:3] bias
    fold inside the fused kernels) but written as explicit broadcast
    multiply-adds rather than a precision=HIGHEST einsum: the einsum form
    lowered to its OWN fusion and materialized the full f32 (B, P, c0)
    intermediate in HBM (537 MB at trunk-SA0/B=32 scale — 1.1 ms write +
    1.9 ms read in the epilogue, round-4 trace), while elementwise producers
    fuse into the feature-dot's output fusion so only the bf16 result is
    ever written. Same f32 products + f32 accumulation, same bf16 store
    rounding (the selector matmul casts comb rows to bf16 anyway).
    """
    W0 = W0.astype(jnp.float32)
    x32 = xyz.astype(jnp.float32)
    xyz_term = (x32[..., 0:1] * W0[0] + x32[..., 1:2] * W0[1]
                + x32[..., 2:3] * W0[2])                     # (B, P, c0)
    feat = jnp.einsum("bnc,cd->bnd", features.astype(jnp.float32), W0[3:])
    return (feat + xyz_term).astype(jnp.bfloat16)


def _kernel(S, radius, n_layers, n_total, G,
            q_ref, px_ref, py_ref, pz_ref, comb_ref,
            w0xyz_ref, *wb_and_out):
    """comb_ref holds the LAYER-0 PRE-ACTIVATIONS comb0 = [xyz, feats] @ W0,
    precomputed per point with one efficient XLA matmul: because layer 0 is
    linear, sel @ ([xyz-q, feats] @ W0) == (sel @ comb0) + (the -q @ W0[:3]
    center-subtract term folded into the bias). Gathering pre-activations
    makes the selector matmul's output width exactly C0 (no 131 -> 256 lane
    padding, which doubled MXU time) and removes the per-slot layer-0
    matmul. w0xyz_ref = W0[:3] for the bias fold; wb_and_out holds layers
    1..n_layers-1 kernels then ALL n_layers biases then the output ref.

    G > 1 blocks G crops into one program (one-program-per-crop shapes like
    the stage-2 SA tails: the ~2 us grid switch + iota setup + small
    post-loop matmuls dominate at 1 crop/program). The per-crop selector
    section runs statically unrolled per g; the deep MLP runs ONCE on the
    (G*MT*S, .) concatenation."""
    w_refs = wb_and_out[:n_layers - 1]
    b_refs = wb_and_out[n_layers - 1:2 * n_layers - 1]
    out_ref = wb_and_out[2 * n_layers - 1]

    MT = q_ref.shape[1]
    T = px_ref.shape[2]

    # shared iotas
    li = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
    L128 = (lj <= li).astype(jnp.bfloat16).T
    ti = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    tj = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    LT = (tj <= ti).astype(jnp.float32).T
    s_iota = (jax.lax.broadcasted_iota(jnp.int32, (MT, S), 1)
              + 1).astype(jnp.float32)                       # (MT, S)

    h_parts = []
    for g_i in range(G):
        # queries arrive as ONE (MT, 3) block straight off the (B, M, 3)
        # array (three (B, M/MT, MT, 1) planes forced relayout copies)
        q = q_ref[g_i]                                       # (MT, 3)
        qx, qy, qz = q[:, 0:1], q[:, 1:2], q[:, 2:3]         # (MT, 1)
        px, py, pz = (px_ref[g_i, 0], py_ref[g_i, 0],
                      pz_ref[g_i, 0])                        # (T, 128)
        comb = comb_ref[g_i]                                 # (N, C0)

        # squared distances (MT, T, 128) — exact f32 three-pass form
        dx = qx[:, :, None] - px[None, :, :]
        dy = qy[:, :, None] - py[None, :, :]
        dz = qz[:, :, None] - pz[None, :, :]
        d2 = dx * dx + dy * dy + dz * dz

        in_ball = d2 < radius * radius                       # (MT, T, 128)
        maskf = in_ball.astype(jnp.bfloat16)

        # inclusive prefix within each 128-lane tile (counts <= 128:
        # exact bf16)
        prefix = jax.lax.dot_general(
            maskf, L128, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (MT, T, 128)
        tile_sum = prefix[..., LANE - 1]                      # (MT, T)
        tile_end = jax.lax.dot_general(
            tile_sum, LT, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)              # (MT, T)
        tile_base = tile_end - tile_sum
        count = tile_end[:, T - 1:T]                         # (MT, 1)

        # slot targets with pad-with-first semantics: slot s (0-based)
        # selects the (s+1)-th in-ball point, or the 1st once past count
        target = jnp.where(s_iota <= count, s_iota, 1.0)     # (MT, S)

        # selector-matmul gather, tile by tile (running global rank). All
        # matmuls run as (MT*S, .) 2-D shapes — full 128-row MXU occupancy
        # — with bf16 multiplicands and f32 accumulation (the same numerics
        # XLA's default-precision einsum uses on TPU).
        g = None
        for t in range(T):
            # in-ball mask folded INTO the rank (0 matches no target,
            # targets are >= 1): saves a second (MT, S, 128) broadcast +
            # AND on the hot selector tensor per tile
            rank_t = jnp.where(in_ball[:, t, :],
                               prefix[:, t, :] + tile_base[:, t][:, None],
                               0.0)                          # (MT, 128)
            sel_t = (rank_t[:, None, :] == target[:, :, None])
            part = jax.lax.dot_general(
                sel_t.astype(jnp.bfloat16).reshape(MT * S, LANE),
                comb[t * LANE:(t + 1) * LANE, :].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (MT*S, Cin)
            g = part if g is None else g + part

        # empty centers gather point 0 (CUDA zero-on-empty -> index 0)
        empty = (count == 0.0)[:, :, None]                   # (MT, 1, 1)
        g3 = jnp.where(empty, comb[0:1, :][None].astype(jnp.float32),
                       g.reshape(MT, S, -1))

        # layer 0: g3 already holds [xyz, feats] @ W0; fold the
        # center-subtract into the bias: b0 - q @ W0[:3]. Kept f32/HIGHEST:
        # q carries absolute coordinates, and this term cancels against
        # comb0's xyz contribution. NOTE the cancellation is not bit-exact:
        # the selector gather above rounds comb0 (which carries the same
        # |xyz|*|W0| magnitude) to bf16, so ~|xyz|*|W0|*2^-9 rounding
        # survives — comparable to the old in-kernel bf16 path and measured
        # AP-neutral (BENCH.md round-2 AP unchanged); keeping THIS term f32
        # still halves the error and is one cheap (MT,3)x(3,C0) matmul.
        b_eff = b_refs[0][...] - jax.lax.dot_general(
            q, w0xyz_ref[...], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)              # (MT, C0)
        h3 = jnp.maximum(g3 + b_eff[:, None, :], 0.0)        # (MT, S, C0)
        h_parts.append(h3.reshape(MT * S, h3.shape[-1]))

    h = h_parts[0] if G == 1 else jnp.concatenate(h_parts, axis=0)
    GMT = G * MT
    for li_ in range(n_layers - 1):
        W = w_refs[li_][...]
        b = b_refs[li_ + 1][...]
        c_out_l = W.shape[1]
        z = jax.lax.dot_general(h.astype(jnp.bfloat16),
                                W.astype(jnp.bfloat16),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        z3 = jnp.maximum(z.reshape(GMT, S, c_out_l) + b[None, :, :], 0.0)
        h = z3.reshape(GMT * S, c_out_l)

    pooled = jnp.max(h.reshape(G, MT, S, -1), axis=2)        # (G, MT, Cout)
    for g_i in range(G):
        out_ref[g_i, 0] = pooled[g_i]


def _xla_reference(xyz, features, new_xyz, radius, nsample, kernels, biases):
    """Unfused composition (ball query + group + dense stack + max) — the
    golden reference in tests."""
    from ws3d_tpu.ops.grouping import query_and_group
    # force_xla: this composition must be traceable under autodiff — the
    # Pallas ball query has no autodiff rule
    h = query_and_group(float(radius), int(nsample), xyz, new_xyz, features,
                        use_xyz=True, force_xla=True)
    for k, b in zip(kernels, biases):
        h = jnp.maximum(jnp.einsum("bmsc,cd->bmsd", h, k) + b, 0.0)
    return jnp.max(h, axis=2)


def _mlp_from_idx(idx, xyz, features, new_xyz, kernels, biases):
    """Grouping + MLP + max-pool with the ball-query indices held CONSTANT.

    The backward linearizes THIS function: indices are int (zero tangent)
    in the reference's autograd too (group_points_gpu.cu backward scatters
    through fixed indices), so hoisting the index computation out of the
    vjp changes no gradient — but it removes the XLA ball query's
    rank-search (its per-(row,slot) tile gathers measured ~40 ms/stage at
    trunk training shapes) from every backward pass; the hoisted call uses
    the fast Pallas kernel instead."""
    from ws3d_tpu.ops.grouping import group_with_idx
    h = group_with_idx(idx, xyz, new_xyz, features, use_xyz=True)
    for k, b in zip(kernels, biases):
        h = jnp.maximum(jnp.einsum("bmsc,cd->bmsd", h, k) + b, 0.0)
    return jnp.max(h, axis=2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 7))
def _fused(xyz, features, new_xyz, radius, nsample, kernels, biases,
           interpret):
    return _pallas_forward(xyz, features, new_xyz, radius, nsample,
                           kernels, biases, interpret)


def _fused_fwd(xyz, features, new_xyz, radius, nsample, kernels, biases,
               interpret):
    out = _pallas_forward(xyz, features, new_xyz, radius, nsample,
                          kernels, biases, interpret)
    return out, (xyz, features, new_xyz, kernels, biases)


def _fused_bwd(radius, nsample, interpret, res, gout):
    xyz, features, new_xyz, kernels, biases = res
    from ws3d_tpu.ops.grouping import ball_query
    idx = jax.lax.stop_gradient(
        ball_query(float(radius), int(nsample), xyz, new_xyz))
    _, vjp = jax.vjp(
        lambda x, f, q, ks, bs: _mlp_from_idx(idx, x, f, q, ks, bs),
        xyz, features, new_xyz, tuple(kernels), tuple(biases))
    dx, df, dq, dks, dbs = vjp(gout)
    return dx, df, dq, dks, dbs


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_sa_ballquery(xyz: jnp.ndarray, features: jnp.ndarray,
                       new_xyz: jnp.ndarray, radius: float, nsample: int,
                       kernels: Sequence[jnp.ndarray],
                       biases: Sequence[jnp.ndarray],
                       interpret: bool = False) -> jnp.ndarray:
    """Differentiable wrapper: Pallas forward, XLA-composition backward.

    xyz (B, P, 3), features (B, P, C), new_xyz (B, M, 3),
    kernels[0] (3+C, C0), ... -> (B, M, C_last). Requires P % 128 == 0,
    M % 8 == 0.
    """
    return _fused(xyz, features, new_xyz, float(radius), int(nsample),
                  tuple(kernels), tuple(biases), interpret)


def _pallas_forward(xyz, features, new_xyz, radius, nsample, kernels,
                    biases, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, P, _ = xyz.shape
    M = new_xyz.shape[1]
    S = int(nsample)
    assert P % LANE == 0 and M % 8 == 0, (P, M)
    T = P // LANE
    n_layers = len(kernels)
    c_out = kernels[-1].shape[1]
    c0 = kernels[0].shape[1]

    # layer-0 pre-activations per point (XLA matmuls): the selector gather
    # then emits width-c0 rows (no lane-padding waste for ragged 3+C
    # inputs) and the kernel skips the per-slot layer-0 matmul. See
    # layer0_preact for the split-by-input-block rationale and the fusion
    # layout that keeps the f32 intermediate out of HBM.
    comb0 = layer0_preact(xyz, features, kernels[0])

    # query tile: bound the per-query VMEM working set (d2 + prefix + masks
    # at ~P*12 bytes, plus the gathered/activation rows) to ~6 MB of the
    # 16 MB scoped VMEM. Big tiles matter — grid-program switch costs ~2 us
    # and thousands of tiny programs were ~half of each SA stage's time —
    # but P*4 alone under-counted and OOM'd scoped vmem at MT=256, P=4096.
    per_q = (P * 12) + S * max(c0, c_out) * 8
    budget = max((6 * 1024 * 1024) // per_q, 8)
    MT = 8
    for cand in (256, 128, 64, 32, 16, 8):
        if cand <= budget and M % cand == 0:
            MT = cand
            break

    # Crop-batch blocking (same rationale as fused_sa_window_pallas): at
    # one-program-per-crop shapes (stage-2 SA tails, M//MT == 1) the ~2 us
    # grid switch + iota setup + small post-loop matmuls dominate; block G
    # crops per program and run the deep MLP once on the (G*MT*S, .)
    # concatenation. Bounded by a ~32 MB cap on the MLP intermediates.
    G = 1
    if M // MT == 1:
        cmax = max([c0, c_out] + [k.shape[1] for k in kernels])
        while (G * 2 * MT * S * cmax * 12 <= 32 * 1024 * 1024
               and B % (G * 2) == 0 and G < 8):
            G *= 2

    def coord(a, i, shape):
        return a[..., i].astype(jnp.float32).reshape(shape)

    px = coord(xyz, 0, (B, 1, T, LANE))
    py = coord(xyz, 1, (B, 1, T, LANE))
    pz = coord(xyz, 2, (B, 1, T, LANE))
    q = new_xyz[..., :3].astype(jnp.float32)                 # (B, M, 3)

    # (G, MT, 3) query blocks straight off (B, M, 3): relayout-free
    qspec = pl.BlockSpec((G, MT, 3), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((G, 1, T, LANE), lambda b, m: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((G, P, c0), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    w0spec = pl.BlockSpec((3, c0), lambda b, m: (0, 0),
                          memory_space=pltpu.VMEM)
    wspecs = [pl.BlockSpec(k.shape, lambda b, m: (0, 0),
                           memory_space=pltpu.VMEM) for k in kernels[1:]]
    bspecs = [pl.BlockSpec((1, b_.shape[0]), lambda b, m: (0, 0),
                           memory_space=pltpu.VMEM) for b_ in biases]
    ospec = pl.BlockSpec((G, 1, MT, c_out), lambda b, m: (b, m, 0, 0),
                         memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, S, float(radius), n_layers, P, G),
        grid=(B // G, M // MT),
        in_specs=[qspec, pspec, pspec, pspec, cspec, w0spec]
                 + wspecs + bspecs,
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((B, M // MT, MT, c_out), jnp.float32),
        interpret=interpret,
    )(q, px, py, pz, comb0,
      kernels[0][:3].astype(jnp.float32),
      *[k.astype(jnp.float32) for k in kernels[1:]],
      *[b_.reshape(1, -1).astype(jnp.float32) for b_ in biases])
    return out.reshape(B, M, c_out)
