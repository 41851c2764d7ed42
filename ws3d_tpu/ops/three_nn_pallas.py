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


def _interp_kernel(m_total, qx_ref, qy_ref, qz_ref, px_ref, py_ref, pz_ref,
                   feat_ref, out_ref):
    """Fused 3-NN + inverse-squared-distance interpolation: instead of
    emitting indices (whose 3xC-wide XLA row-gathers dominate FP-stage time,
    ~150 MB of gathered features at FP-1 scale), build the dense weight
    matrix W[u, j] = sum_s w_s * (j == pick_s) in VMEM and interpolate with
    ONE MXU matmul W @ feats per query tile."""
    MT = qx_ref.shape[2]
    m = px_ref.shape[3]

    qx, qy, qz = qx_ref[0, 0], qy_ref[0, 0], qz_ref[0, 0]   # (MT, 1)
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
    out_ref[0, 0] = jax.lax.dot_general(
        W.astype(jnp.bfloat16), feat_ref[0].astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (MT, C)


def three_interpolate_pallas(unknown: jnp.ndarray, known: jnp.ndarray,
                             known_feats: jnp.ndarray,
                             interpret: bool = False) -> jnp.ndarray:
    """Fused interpolate_features: unknown (B, n, 3), known (B, m, 3),
    known_feats (B, m, C) -> (B, n, C). Requires m % 128 == 0, n % 8 == 0.
    Semantics = three_nn + 1/(d2+1e-8) weights + weighted gather
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
    fspec = pl.BlockSpec((1, m, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, 1, MT, C), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_interp_kernel, m),
        grid=(B, n // MT),
        in_specs=[qspec, qspec, qspec, pspec, pspec, pspec, fspec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((B, n // MT, MT, C), jnp.float32),
        interpret=interpret,
    )(qx, qy, qz, px, py, pz, known_feats.astype(jnp.float32))
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
