"""Windowed fused set-abstraction for Z-SORTED point clouds.

The backbone's first SA stage (N=16384, M=4096, Cin=4) defeats both prior
strategies: the XLA row-gather costs ~11.5 ns/row regardless of row width
(measured: 3.1M rows -> 36 ms/batch-16), and the full-N selector matmul of
``fused_sa_bq_pallas`` wastes 8-32x of the MXU on <32-wide outputs times all
128 point tiles. This kernel exploits a *sorted* input instead: with points
sorted ascending by z (rect depth) and the query tile's z-range known, every
in-radius candidate lies in a contiguous run of point tiles

    [t_start, t_end) = tiles overlapping [qz_min - r, qz_max + r]

precomputed per query tile with two vectorized compare-counts in XLA. The
kernel then runs the rank-search + selector-matmul + MLP + max-pool of the
fused kernel but only over that run — a ``lax.fori_loop`` with *dynamic*
bounds over dynamically indexed VMEM tiles (``pl.ds`` sublane slices). At
KITTI-like densities that is ~4-8 of 128 tiles per query tile, cutting the
selector FLOPs ~20-30x; the (B, M, S, C) grouped tensor never exists.

Semantics stay CUDA-exact *for the sorted order* (first-nsample in ascending
index order = ascending z, pad-with-first, point-0 row on empty —
ball_query_gpu.cu:9-67, pointnet2_modules.py:19-55): ascending index within
the window is ascending global index, and no in-radius point can live
outside the window. The pad-with-first fix-up runs AFTER the selector loop
(slots past the count matched nothing), which saves the second rank pass the
full-N kernel needs.

REQUIRES xyz (and new_xyz) sorted ascending along axis 1 by z. The datasets
guarantee this under cfg.TPU.SORT_POINTS_Z; feeding unsorted points silently
drops neighbors.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LANE = 128


def _kernel(S, radius, n_layers, n_sub, G, early_exit, q_ref, ts_ref,
            te_ref, px_ref, py_ref, pz_ref, comb_ref,
            w0xyz_ref, *wb_and_out):
    w_refs = wb_and_out[:n_layers - 1]
    b_refs = wb_and_out[n_layers - 1:2 * n_layers - 1]
    out_ref = wb_and_out[2 * n_layers - 1]

    MT = q_ref.shape[1]
    MTsub = MT // n_sub
    c0 = comb_ref.shape[3]

    li = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
    L128 = (lj <= li).astype(jnp.bfloat16).T                  # inclusive

    s_sub = jax.lax.broadcasted_iota(jnp.int32, (MTsub, S), 1)
    target = (s_sub + 1).astype(jnp.float32)                  # (MTsub, S)
    s_col = jax.lax.broadcasted_iota(jnp.int32, (MT, S), 1)

    # The MT queries are processed as n_sub SUBTILES, each with its own
    # dynamic [t_start, t_end) window: window tightness is set by the query
    # subtile's z-extent, but grid-program count (and its ~2 us switch cost
    # + per-program setup) is paid per MT. At trunk shapes (P=512, M=256)
    # one program per crop with n_sub=4 beats both the full-N fused kernel
    # (4x the mask work) and per-subtile grid programs (4x the switches) —
    # measured in BENCH.md round 3.
    #
    # G > 1 blocks MULTIPLE CROPS into one program (stage-2 shapes: the
    # per-crop work is a handful of 128-wide tiles, so the ~2 us switch +
    # iota/mask setup + small post-loop matmuls dominate at 1 crop/program).
    # The per-crop window loops run serially per g; the deep MLP layers run
    # ONCE on the (G*MT*S, c0) concatenation — bigger MXU ops, 1/G of the
    # program overhead.
    h_parts = []
    for g_i in range(G):
        # queries arrive as ONE (MT, 3) block straight off the (B, M, 3)
        # array (three (B, M/MT, MT, 1) planes forced XLA relayout copies)
        q3 = q_ref[g_i]                                       # (MT, 3)
        g_parts, cnt_parts = [], []
        for u in range(n_sub):
            qs = q3[u * MTsub:(u + 1) * MTsub]                # (MTsub, 3)
            qx, qy, qz = qs[:, 0:1], qs[:, 1:2], qs[:, 2:3]
            # ts/te arrive as G batch rows (G, 1, M/MTsub) in SMEM — the
            # full (B, M/MTsub) array SMEM-padded to 128 B/row and blew the
            # 1 MB SMEM budget at B=1024 (trunk crops); pick this subtile's
            # window by the m grid axis
            t_start = ts_ref[g_i, 0, pl.program_id(1) * n_sub + u]
            t_end = te_ref[g_i, 0, pl.program_id(1) * n_sub + u]

            def body(t, carry):
                g, base = carry
                px = px_ref[g_i, 0, pl.ds(t, 1), :]           # (1, 128)
                py = py_ref[g_i, 0, pl.ds(t, 1), :]
                pz = pz_ref[g_i, 0, pl.ds(t, 1), :]
                dx = qx - px
                dy = qy - py
                dz = qz - pz
                d2 = dx * dx + dy * dy + dz * dz              # (MTsub, 128)
                in_ball = d2 < radius * radius
                # inclusive prefix within the tile (counts <= 128: exact
                # bf16)
                prefix = jax.lax.dot_general(
                    in_ball.astype(jnp.bfloat16), L128,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)       # (MTsub, 128)
                # fold the in-ball mask INTO the rank (0 matches no target,
                # targets are >= 1): saves a second (MTsub, S, 128)
                # broadcast + AND on the hot selector tensor — the sel
                # construction is the VPU floor of the whole kernel
                rank = jnp.where(in_ball, prefix + base, 0.0)  # (MTsub, 128)
                sel = (rank[:, None, :]
                       == target[:, :, None])                 # (MTsub, S, 128)
                # comb0 is laid out (T, LANE, c0) so this dynamic slice
                # selects a whole (LANE, c0) tile on a non-minor dim —
                # slicing a flat (P, c0) at a dynamic sublane offset made
                # mosaic materialize lane-padded rotation copies (~8 MB at
                # P=16384), OOMing VMEM
                comb_t = comb_ref[g_i, pl.ds(t, 1)][0]        # (128, c0)
                part = jax.lax.dot_general(
                    sel.astype(jnp.bfloat16).reshape(MTsub * S, LANE),
                    comb_t.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)       # (MTsub*S, c0)
                return g + part, base + prefix[:, LANE - 1:LANE]

            g0 = jnp.zeros((MTsub * S, c0), jnp.float32)
            base0 = jnp.zeros((MTsub, 1), jnp.float32)
            if early_exit:
                # saturation exit: once EVERY query in the subtile has seen
                # >= S in-ball points, later tiles can only produce ranks
                # > S (targets are <= S) — sel is all-zero, so skipping them
                # is exact. NOTE the emitted `count` then undercounts at
                # saturation, which is only valid when the consumer uses
                # count solely for pad-with-first/empty logic (both compare
                # against <= S thresholds) — true here, NOT for wrap_pad.
                # MEASURED NEGATIVE at trunk shapes (BENCH.md round 3):
                # 12.6 -> 13.3 ms — the scalar-reduce condition serializes
                # the loop (no double-buffered tile prefetch) and costs more
                # than the skipped tiles save. Kept OFF by default as a
                # documented negative result (parity-tested either way).
                def cond(st):
                    t, _, base = st
                    return (t < t_end) & (jnp.min(base) < float(S))

                def wbody(st):
                    t, g, base = st
                    g, base = body(t, (g, base))
                    return t + 1, g, base

                _, g_u, cnt_u = jax.lax.while_loop(
                    cond, wbody, (t_start, g0, base0))
            else:
                g_u, cnt_u = jax.lax.fori_loop(t_start, t_end, body,
                                               (g0, base0))
            g_parts.append(g_u.reshape(MTsub, S, c0))
            cnt_parts.append(cnt_u)

        gathered = (g_parts[0] if n_sub == 1
                    else jnp.concatenate(g_parts, axis=0)).reshape(MT * S, c0)
        count = (cnt_parts[0] if n_sub == 1
                 else jnp.concatenate(cnt_parts, axis=0))     # (MT, 1)

        # pad-with-first: slots past the in-radius count matched no rank, so
        # their gathered rows are EXACTLY zero (the selector matmul summed
        # nothing) — an additive fix (add slot-0's row into the zero slots,
        # add the global point-0 row into fully-empty queries) costs 3
        # broadcast passes over (MT, S, c0) instead of the 6 a blend-style
        # `g*m + pad*(1-m)` pays; measured ~1.5 ms across the stage-2 batch.
        # float masks: mosaic can't insert a minor dim on i1 vectors
        g3 = gathered.reshape(MT, S, c0)
        unfilled = (s_col.astype(jnp.float32)
                    >= count).astype(jnp.float32)[:, :, None]  # (MT, S, 1)
        g3 = g3 + g3[:, 0:1, :] * unfilled
        emptyf = (count == 0.0).astype(jnp.float32)[:, :, None]  # (MT, 1, 1)
        g3 = g3 + comb_ref[g_i, 0, 0:1, :][None].astype(jnp.float32) * emptyf

        # layer 0: g3 holds [xyz, feats] @ W0; fold the center-subtract into
        # the bias (f32/HIGHEST — the xyz term carries absolute coordinates)
        b_eff = b_refs[0][...] - jax.lax.dot_general(
            q3, w0xyz_ref[...], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)               # (MT, c0)
        h3 = jnp.maximum(g3 + b_eff[:, None, :], 0.0)
        h_parts.append(h3.reshape(MT * S, c0))

    h = h_parts[0] if G == 1 else jnp.concatenate(h_parts, axis=0)
    GMT = G * MT
    for l in range(n_layers - 1):
        W = w_refs[l][...]
        b = b_refs[l + 1][...]
        c_out_l = W.shape[1]
        z = jax.lax.dot_general(h.astype(jnp.bfloat16), W.astype(jnp.bfloat16),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        z3 = jnp.maximum(z.reshape(GMT, S, c_out_l) + b[None, :, :], 0.0)
        h = z3.reshape(GMT * S, c_out_l)

    pooled = jnp.max(h.reshape(G, MT, S, -1), axis=2)         # (G, MT, c_out)
    for g_i in range(G):
        out_ref[g_i, 0] = pooled[g_i]


def _pallas_forward(xyz, features, new_xyz, radius, nsample, kernels, biases,
                    interpret=False, mtsub=None, early_exit=False):
    from jax.experimental.pallas import tpu as pltpu

    B, P, _ = xyz.shape
    M = new_xyz.shape[1]
    S = int(nsample)
    assert P % LANE == 0 and M % 8 == 0, (P, M)
    T = P // LANE
    n_layers = len(kernels)
    c_out = kernels[-1].shape[1]
    c0 = kernels[0].shape[1]

    # layer-0 pre-activations, stored bf16 (the selector matmul casts comb
    # rows to bf16 anyway). See fused_sa_bq_pallas.layer0_preact for the
    # fusion layout that keeps the f32 intermediate out of HBM.
    from ws3d_tpu.ops.fused_sa_bq_pallas import layer0_preact
    comb0 = layer0_preact(xyz, features, kernels[0])

    # Query-tile size from the VMEM stack budget. The dominant loop-body
    # intermediates are the (MT, S, 128) rank/selector broadcasts (~26
    # bytes/element across the equality, mask, bf16 and f32 copies —
    # MT=256, S=16 measured 16.25M against the 16M scoped limit), plus the
    # block-constant comb0/coords (~double-buffered) outside the per-query
    # term.
    # (empirical: MT=128, S=16 still peaked at 16.12M — mosaic keeps many
    # live copies of the loop-body broadcasts — so budget only 4M to the
    # per-query term; the rest is comb0/coords double-buffering headroom)
    per_q = S * LANE * 26 + max(c0, c_out) * 8
    budget = max((4 * 1024 * 1024) // per_q, 8)
    if mtsub is not None:
        budget = int(mtsub)
    MTsub = 8
    for cand in (256, 128, 64, 32, 16, 8):
        if cand <= budget and M % cand == 0:
            MTsub = cand
            break
    # Program query block: n_sub window subtiles per grid program (window
    # tightness follows MTsub; program-switch and per-program setup costs
    # follow MT). Cap at 256 queries per program — larger blocks grow the
    # post-loop (MT*S, c0) MLP intermediates past the VMEM comfort zone
    # with no further switch-amortization win.
    n_sub = 1
    while (MTsub * n_sub * 2 <= 256 and M % (MTsub * n_sub * 2) == 0):
        n_sub *= 2
    MT = MTsub * n_sub

    # Crop-batch blocking: at stage-2 shapes (M <= 256 -> one program per
    # crop) the ~2 us program switch + iota/target setup + small post-loop
    # matmuls dominate; block G crops per program and run the deep MLP once
    # on the (G*MT*S, .) concatenation. Bounded by a ~12 MB cap on the MLP
    # intermediates (h f32 + z f32 + bf16 copies ~ 12 bytes/elt/layer-pair).
    G = 1
    if M // MT == 1:
        cmax = max([c0, c_out] + [k.shape[1] for k in kernels])
        while (G * 2 * MT * S * cmax * 12 <= 32 * 1024 * 1024
               and B % (G * 2) == 0 and G < 8):
            G *= 2

    z_pts = xyz[..., 2].astype(jnp.float32)                    # (B, P) sorted
    z_q = new_xyz[..., 2].astype(jnp.float32).reshape(B, M // MTsub, MTsub)
    pz_min = z_pts.reshape(B, T, LANE)[:, :, 0]                # (B, T)
    pz_max = z_pts.reshape(B, T, LANE)[:, :, LANE - 1]
    q_lo = z_q[:, :, 0] - radius                               # (B, M/MTsub)
    q_hi = z_q[:, :, MTsub - 1] + radius
    t_start = jnp.sum(pz_max[:, None, :] < q_lo[:, :, None],
                      axis=-1).astype(jnp.int32)[:, None]      # (B,1,M/MTsub)
    t_end = jnp.sum(pz_min[:, None, :] <= q_hi[:, :, None],
                    axis=-1).astype(jnp.int32)[:, None]

    def coord(a, i, shape):
        return a[..., i].astype(jnp.float32).reshape(shape)

    px = coord(xyz, 0, (B, 1, T, LANE))
    py = coord(xyz, 1, (B, 1, T, LANE))
    pz = coord(xyz, 2, (B, 1, T, LANE))
    q = new_xyz[..., :3].astype(jnp.float32)                   # (B, M, 3)

    # queries ride as (G, MT, 3) blocks straight off (B, M, 3) — legal
    # ((MT, 3): 3 == array dim) and relayout-free, unlike the previous
    # three (B, M/MT, MT, 1) planes
    qspec = pl.BlockSpec((G, MT, 3), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((G, 1, M // MTsub), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.SMEM)
    pspec = pl.BlockSpec((G, 1, T, LANE), lambda b, m: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((G, T, LANE, c0), lambda b, m: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    w0spec = pl.BlockSpec((3, c0), lambda b, m: (0, 0),
                          memory_space=pltpu.VMEM)
    wspecs = [pl.BlockSpec(k.shape, lambda b, m: (0, 0),
                           memory_space=pltpu.VMEM) for k in kernels[1:]]
    bspecs = [pl.BlockSpec((1, b_.shape[0]), lambda b, m: (0, 0),
                           memory_space=pltpu.VMEM) for b_ in biases]
    ospec = pl.BlockSpec((G, 1, MT, c_out), lambda b, m: (b, m, 0, 0),
                         memory_space=pltpu.VMEM)

    # mosaic's scoped-vmem accounting of the dynamic-bounds loop is ~16 MB
    # nearly independent of MT (conservative stack sizing); raise the
    # per-kernel cap — v5e has 128 MB physical VMEM and the real working
    # set (comb block + per-tile buffers) is a few MB
    params = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
    out = pl.pallas_call(
        functools.partial(_kernel, S, float(radius), n_layers, n_sub, G,
                          bool(early_exit)),
        grid=(B // G, M // MT),
        in_specs=[qspec, sspec, sspec, pspec, pspec, pspec,
                  cspec, w0spec] + wspecs + bspecs,
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((B, M // MT, MT, c_out), jnp.float32),
        compiler_params=params,
        interpret=interpret,
    )(q, t_start, t_end, px, py, pz,
      comb0.reshape(B, T, LANE, c0),
      kernels[0][:3].astype(jnp.float32),
      *[k.astype(jnp.float32) for k in kernels[1:]],
      *[b_.reshape(1, -1).astype(jnp.float32) for b_ in biases])
    return out.reshape(B, M, c_out)


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
    from ws3d_tpu.ops.fused_sa_bq_pallas import _xla_reference
    xyz, features, new_xyz, kernels, biases = res
    _, vjp = jax.vjp(
        lambda x, f, q, ks, bs: _xla_reference(x, f, q, radius, nsample,
                                               ks, bs),
        xyz, features, new_xyz, tuple(kernels), tuple(biases))
    dx, df, dq, dks, dbs = vjp(gout)
    return dx, df, dq, dks, dbs


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_sa_window(xyz: jnp.ndarray, features: jnp.ndarray,
                    new_xyz: jnp.ndarray, radius: float, nsample: int,
                    kernels: Sequence[jnp.ndarray],
                    biases: Sequence[jnp.ndarray],
                    interpret: bool = False) -> jnp.ndarray:
    """Differentiable wrapper: windowed Pallas forward, XLA backward.

    xyz (B, P, 3) SORTED ascending by z, features (B, P, C), new_xyz
    (B, M, 3) sorted ascending by z; kernels[0] (3+C, C0), ... ->
    (B, M, C_last). Requires P % 128 == 0, M % 8 == 0.
    """
    return _fused(xyz, features, new_xyz, float(radius), int(nsample),
                  tuple(kernels), tuple(biases), interpret)
