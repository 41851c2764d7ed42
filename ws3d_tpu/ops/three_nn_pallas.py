"""Fused 3-nearest-neighbor search as a Pallas TPU kernel.

Feature-propagation companion to ball_query_pallas: per query tile the
(MT, m) squared-distance block lives in VMEM and three masked-min passes
extract the running top-3 (lowest index wins ties — the CUDA running-top-3
semantics, interpolate_gpu.cu:30-49). Returns SQUARED distances like the
reference kernel.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LANE = 128


def _kernel(m_total, qx_ref, qy_ref, qz_ref, px_ref, py_ref, pz_ref,
            dist_ref, idx_ref):
    MT = qx_ref.shape[2]
    m = px_ref.shape[3]

    qx, qy, qz = qx_ref[0, 0], qy_ref[0, 0], qz_ref[0, 0]   # (MT, 1)
    px, py, pz = px_ref[0, 0], py_ref[0, 0], pz_ref[0, 0]   # (1, m)

    dx = qx - px
    dy = qy - py
    dz = qz - pz
    d2 = dx * dx + dy * dy + dz * dz                        # (MT, m) 2D

    col = jax.lax.broadcasted_iota(jnp.int32, (MT, m), 1)

    cur = d2
    outs_d, outs_i = [], []
    for s in range(3):
        best = jnp.min(cur, axis=1, keepdims=True)           # (MT, 1)
        pick = jnp.min(jnp.where(cur == best, col, m_total),
                       axis=1, keepdims=True).astype(jnp.int32)
        outs_d.append(best)
        outs_i.append(pick)
        cur = jnp.where(col == pick, jnp.inf, cur)
    dist_ref[0, 0] = jnp.concatenate(outs_d, axis=1)
    idx_ref[0, 0] = jnp.concatenate(outs_i, axis=1)


def _interp_kernel(m_total, q_ref, px_ref, py_ref, pz_ref,
                   feat_ref, out_ref):
    """Fused 3-NN + inverse-squared-distance interpolation: instead of
    emitting indices (whose 3xC-wide XLA row-gathers dominate FP-stage time,
    ~150 MB of gathered features at FP-1 scale), build the dense weight
    matrix W[u, j] = sum_s w_s * (j == pick_s) in VMEM and interpolate with
    ONE MXU matmul W @ feats per query tile.

    Queries arrive as ONE (MT, 3) block straight off the (B, n, 3) array —
    the previous three (B, n//MT, MT, 1) coordinate planes forced XLA
    relayout copies (~0.4 ms EACH at FP-0 scale) in front of the call."""
    MT = q_ref.shape[1]
    m = px_ref.shape[3]

    q3 = q_ref[0]                                           # (MT, 3)
    qx, qy, qz = q3[:, 0:1], q3[:, 1:2], q3[:, 2:3]         # (MT, 1)
    px, py, pz = px_ref[0, 0], py_ref[0, 0], pz_ref[0, 0]   # (1, m)

    dx = qx - px
    dy = qy - py
    dz = qz - pz
    d2 = dx * dx + dy * dy + dz * dz                        # (MT, m)

    col = jax.lax.broadcasted_iota(jnp.int32, (MT, m), 1)
    cur = d2
    picks, dists = [], []
    for _ in range(3):
        best = jnp.min(cur, axis=1, keepdims=True)           # (MT, 1)
        pick = jnp.min(jnp.where(cur == best, col, m_total),
                       axis=1, keepdims=True).astype(jnp.int32)
        picks.append(pick)
        dists.append(best)
        cur = jnp.where(col == pick, jnp.inf, cur)

    recip = [1.0 / (d + 1e-8) for d in dists]
    norm = recip[0] + recip[1] + recip[2]                    # (MT, 1)
    W = jnp.zeros((MT, m), jnp.float32)
    for pick, rc in zip(picks, recip):
        W = W + jnp.where(col == pick, rc / norm, 0.0)

    # weights are [0,1] with ~3 significant digits needed; bf16 multiplies
    # with f32 accumulation match XLA's default-precision einsum numerics.
    # This diverges from the f32 gather composition used by the custom_vjp
    # backward and the unaligned fallback by ~1% per element (parity test
    # rtol 2e-2, tests/test_fused_interpolate.py); measured impact on the
    # fitted-checkpoint synthetic AP: none (BENCH.md round-2, AP unchanged
    # vs the f32 composition), so the ~2x MXU-rate win is kept.
    # The store casts to out_ref's dtype: emitting bf16 directly (when the
    # downstream Dense computes in bf16 anyway) removes a full-tensor XLA
    # convert pass + halves the kernel's HBM writes (134 MB at FP-0 scale).
    out_ref[0, 0] = jax.lax.dot_general(
        W.astype(jnp.bfloat16), feat_ref[0].astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)  # (MT, C)


def _window_interp_kernel(T2, n_sub, qx_ref, qy_ref, qz_ref, h_ref,
                          pzlo_ref, pzhi_ref, px_ref, py_ref, pz_ref,
                          feat_ref, out_ref):
    """Exact 3-NN + interpolation for Z-SORTED unknown AND known clouds.

    Per query subtile: merge the HOME known-tile first — its per-query
    3rd-best d2 is a provable upper bound D^2 on the true 3rd-NN distance
    (the home tile has >= 3 candidates), so every true neighbor lies in
    z-window +-D and the exact tile range [t_lo, t_hi) is computed ONCE
    from the SMEM tile z-bounds. Two clean dynamic-bounds fori loops (no
    per-iteration conds/reductions — a per-ring-step lax.cond + jnp.max
    variant measured 12x SLOWER than the dense kernel: Mosaic serializes
    the scalar sync) then merge the remaining tiles and accumulate the
    3-sparse weight-matmul per tile. Replaces the dense (MT, m) distance
    block + 3 full-width min passes and the dense (MT, m) @ (m, C) weight
    matmul with the ~3-6 tiles each subtile actually needs. Semantics stay
    CUDA-exact in the sorted order (running top-3, lowest index wins ties —
    interpolate_gpu.cu:30-49)."""
    MT = qx_ref.shape[2]
    MTsub = MT // n_sub
    C = feat_ref.shape[3]

    iota = jax.lax.broadcasted_iota(jnp.int32, (MTsub, LANE), 1)
    LARGE = jnp.int32(1 << 30)
    inf1 = jnp.full((MTsub, 1), jnp.inf, jnp.float32)
    large1 = jnp.full((MTsub, 1), LARGE, jnp.int32)

    for u in range(n_sub):
        qx = qx_ref[0, 0, u * MTsub:(u + 1) * MTsub]          # (MTsub, 1)
        qy = qy_ref[0, 0, u * MTsub:(u + 1) * MTsub]
        qz = qz_ref[0, 0, u * MTsub:(u + 1) * MTsub]
        h = h_ref[0, 0, pl.program_id(1) * n_sub + u]
        q_lo = qz[0, 0]
        q_hi = qz[MTsub - 1, 0]

        def merge_tile(t, carry):
            d0, i0, d1, i1, d2c, i2 = carry
            px = px_ref[0, 0, pl.ds(t, 1), :]                 # (1, 128)
            py = py_ref[0, 0, pl.ds(t, 1), :]
            pz = pz_ref[0, 0, pl.ds(t, 1), :]
            dx = qx - px
            dy = qy - py
            dz = qz - pz
            d2t = dx * dx + dy * dy + dz * dz                 # (MTsub, 128)
            colg = iota + t * LANE
            cur = d2t
            for _ in range(3):
                best = jnp.min(cur, axis=1, keepdims=True)    # (MTsub, 1)
                pick = jnp.min(jnp.where(cur == best, colg, LARGE),
                               axis=1, keepdims=True)
                cur = jnp.where(colg == pick, jnp.inf, cur)
                # lexicographic insertion (d2, idx): lowest index wins ties
                lt0 = (best < d0) | ((best == d0) & (pick < i0))
                lt1 = (best < d1) | ((best == d1) & (pick < i1))
                lt2 = (best < d2c) | ((best == d2c) & (pick < i2))
                d0, i0, d1, i1, d2c, i2 = (
                    jnp.where(lt0, best, d0), jnp.where(lt0, pick, i0),
                    jnp.where(lt0, d0, jnp.where(lt1, best, d1)),
                    jnp.where(lt0, i0, jnp.where(lt1, pick, i1)),
                    jnp.where(lt1, d1, jnp.where(lt2, best, d2c)),
                    jnp.where(lt1, i1, jnp.where(lt2, pick, i2)))
            return d0, i0, d1, i1, d2c, i2

        # phase 0: home tile -> D^2 bound
        carry = merge_tile(h, (inf1, large1, inf1, large1, inf1, large1))
        maxd = jnp.max(carry[4])                              # scalar, once

        # exact tile window from the bound: a tile t is skippable iff its
        # z-gap to the query range satisfies gap > 0 and gap^2 > D^2; gaps
        # are monotone in t so two scalar counting loops give the range
        def lo_body(t, cnt):
            gap = q_lo - pzhi_ref[0, 0, t]
            return cnt + jnp.where((gap > 0.0) & (gap * gap > maxd), 1, 0)

        def hi_body(t, cnt):
            gap = pzlo_ref[0, 0, t] - q_hi
            return cnt + jnp.where((gap > 0.0) & (gap * gap > maxd), 1, 0)

        t_lo = jax.lax.fori_loop(0, T2, lo_body, jnp.int32(0))
        t_hi = T2 - jax.lax.fori_loop(0, T2, hi_body, jnp.int32(0))

        # phase 1: merge the window, home tile excluded (two loops — a
        # duplicate insertion of an identical (d2, idx) candidate would
        # occupy two top-3 slots)
        carry = jax.lax.fori_loop(t_lo, h, merge_tile, carry)
        carry = jax.lax.fori_loop(h + 1, t_hi, merge_tile, carry)
        d0, i0, d1, i1, d2c, i2 = carry

        # inverse-squared-distance weights (pointnet2_modules.py:138-144)
        r0 = 1.0 / (d0 + 1e-8)
        r1 = 1.0 / (d1 + 1e-8)
        r2 = 1.0 / (d2c + 1e-8)
        norm = r0 + r1 + r2
        w0, w1, w2 = r0 / norm, r1 / norm, r2 / norm          # (MTsub, 1)

        # phase 2: W rows are 3-sparse in global columns — accumulate the
        # (MTsub, 128) @ (128, C) weight matmul over the window tiles only
        def wbody(t, acc):
            colg = iota + t * LANE
            Wt = ((colg == i0).astype(jnp.float32) * w0
                  + (colg == i1).astype(jnp.float32) * w1
                  + (colg == i2).astype(jnp.float32) * w2)    # (MTsub, 128)
            ft = feat_ref[0, pl.ds(t, 1)][0]                  # (128, C)
            return acc + jax.lax.dot_general(
                Wt.astype(jnp.bfloat16), ft.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        acc = jax.lax.fori_loop(t_lo, t_hi, wbody,
                                jnp.zeros((MTsub, C), jnp.float32))
        out_ref[0, 0, u * MTsub:(u + 1) * MTsub, :] = acc


def three_interpolate_window_pallas(unknown: jnp.ndarray, known: jnp.ndarray,
                                    known_feats: jnp.ndarray,
                                    interpret: bool = False) -> jnp.ndarray:
    """Windowed-exact fused interpolate for z-sorted levels: unknown
    (B, n, 3), known (B, m, 3), known_feats (B, m, C) -> (B, n, C).
    Requires BOTH clouds sorted ascending by z (cfg.TPU.SORT_POINTS_Z + the
    SA modules' sorted FPS picks), m % 128 == 0, n % 8 == 0."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n, _ = unknown.shape
    m = known.shape[1]
    C = known_feats.shape[2]
    assert m % LANE == 0 and n % 8 == 0
    T2 = m // LANE
    # window tightness follows the SUBTILE query z-extent; program-switch
    # cost follows the full MT block (see fused_sa_window_pallas)
    MTsub = 8
    for cand in (128, 64, 32, 16, 8):
        if n % cand == 0:
            MTsub = cand
            break
    n_sub = 1
    while MTsub * n_sub * 2 <= 512 and n % (MTsub * n_sub * 2) == 0:
        n_sub *= 2
    MT = MTsub * n_sub

    def coord(a, i):
        return a[..., i].astype(jnp.float32)

    qx = coord(unknown, 0).reshape(B, n // MT, MT, 1)
    qy = coord(unknown, 1).reshape(B, n // MT, MT, 1)
    qz = coord(unknown, 2).reshape(B, n // MT, MT, 1)
    px = coord(known, 0).reshape(B, 1, T2, LANE)
    py = coord(known, 1).reshape(B, 1, T2, LANE)
    pz = coord(known, 2).reshape(B, 1, T2, LANE)

    z_k = coord(known, 2).reshape(B, T2, LANE)
    pzlo = z_k[:, :, 0][:, None]                              # (B, 1, T2)
    pzhi = z_k[:, :, LANE - 1][:, None]
    z_q = coord(unknown, 2).reshape(B, n // MTsub, MTsub)
    qz_mid = 0.5 * (z_q[:, :, 0] + z_q[:, :, MTsub - 1])      # (B, n/MTsub)
    h = jnp.clip(jnp.sum(pzhi[:, 0, None, :] < qz_mid[:, :, None],
                         axis=-1), 0, T2 - 1).astype(jnp.int32)[:, None]

    qspec = pl.BlockSpec((1, 1, MT, 1), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec((1, 1, n // MTsub), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.SMEM)
    zspec = pl.BlockSpec((1, 1, T2), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.SMEM)
    pspec = pl.BlockSpec((1, 1, T2, LANE), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec((1, T2, LANE, C), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, 1, MT, C), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM)
    params = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
    out = pl.pallas_call(
        functools.partial(_window_interp_kernel, T2, n_sub),
        grid=(B, n // MT),
        in_specs=[qspec, qspec, qspec, hspec, zspec, zspec,
                  pspec, pspec, pspec, fspec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((B, n // MT, MT, C), jnp.float32),
        compiler_params=params,
        interpret=interpret,
    )(qx, qy, qz, h, pzlo, pzhi, px, py, pz,
      known_feats.astype(jnp.float32).reshape(B, T2, LANE, C))
    return out.reshape(B, n, C)


def three_interpolate_pallas(unknown: jnp.ndarray, known: jnp.ndarray,
                             known_feats: jnp.ndarray,
                             interpret: bool = False,
                             out_dtype=jnp.float32) -> jnp.ndarray:
    """Fused interpolate_features: unknown (B, n, 3), known (B, m, 3),
    known_feats (B, m, C) -> (B, n, C) `out_dtype`. Requires m % 128 == 0,
    n % 8 == 0. Semantics = three_nn + 1/(d2+1e-8) weights + weighted gather
    (interpolate_gpu.cu:9-161, pointnet2_modules.py:138-144)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n, _ = unknown.shape
    m = known.shape[1]
    C = known_feats.shape[2]
    assert m % LANE == 0 and n % 8 == 0
    # d2/W working set (MT, m) f32 x ~4 buffers + feats (m, C)
    budget = max(2 * 1024 * 1024 // (m * 4), 8)
    MT = 8
    for cand in (128, 64, 32, 16, 8):
        if cand <= budget and n % cand == 0:
            MT = cand
            break

    def coord(a, i):
        return a[..., i].astype(jnp.float32)

    q = unknown[..., :3].astype(jnp.float32)                 # (B, n, 3)
    px = coord(known, 0).reshape(B, 1, 1, m)
    py = coord(known, 1).reshape(B, 1, 1, m)
    pz = coord(known, 2).reshape(B, 1, 1, m)

    # (1, MT, 3) block straight off the (B, n, 3) array: last dims
    # (MT, 3) are legal (3 == array dim), no relayout copy in front
    qspec = pl.BlockSpec((1, MT, 3), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((1, 1, 1, m), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec((1, m, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, 1, MT, C), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_interp_kernel, m),
        grid=(B, n // MT),
        in_specs=[qspec, pspec, pspec, pspec, fspec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((B, n // MT, MT, C), out_dtype),
        interpret=interpret,
    )(q, px, py, pz, known_feats.astype(jnp.float32))
    return out.reshape(B, n, C)


def three_nn_pallas(unknown: jnp.ndarray, known: jnp.ndarray,
                    interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """unknown (B, n, 3), known (B, m, 3) -> (dist2 (B, n, 3), idx (B, n, 3)).
    Requires m % 128 == 0 and n % 8 == 0."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n, _ = unknown.shape
    m = known.shape[1]
    assert m % LANE == 0 and n % 8 == 0
    budget = max(2 * 1024 * 1024 // (m * 4), 8)
    MT = 8
    for cand in (128, 64, 32, 16, 8):
        if cand <= budget and n % cand == 0:
            MT = cand
            break

    def coord(a, i):
        return a[..., i].astype(jnp.float32)

    qx = coord(unknown, 0).reshape(B, n // MT, MT, 1)
    qy = coord(unknown, 1).reshape(B, n // MT, MT, 1)
    qz = coord(unknown, 2).reshape(B, n // MT, MT, 1)
    px = coord(known, 0).reshape(B, 1, 1, m)
    py = coord(known, 1).reshape(B, 1, 1, m)
    pz = coord(known, 2).reshape(B, 1, 1, m)

    qspec = pl.BlockSpec((1, 1, MT, 1), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((1, 1, 1, m), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, 1, MT, 3), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM)
    dist, idx = pl.pallas_call(
        functools.partial(_kernel, m),
        grid=(B, n // MT),
        in_specs=[qspec, qspec, qspec, pspec, pspec, pspec],
        out_specs=(ospec, ospec),
        out_shape=(jax.ShapeDtypeStruct((B, n // MT, MT, 3), jnp.float32),
                   jax.ShapeDtypeStruct((B, n // MT, MT, 3), jnp.int32)),
        interpret=interpret,
    )(qx, qy, qz, px, py, pz)
    return dist.reshape(B, n, 3), idx.reshape(B, n, 3)
