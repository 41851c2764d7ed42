"""Fused set-abstraction kernel: grouped gather + shared MLP + max-pool.

The stage-2 trunk's dominant cost is materializing grouped tensors
(B, M, S, C) via HBM gathers and streaming them through small Dense layers
(~85 GB/s effective). This kernel keeps everything in VMEM per crop:

  - the "gather" is a one-hot matmul on the MXU ((MT*S, P) @ (P, 3+C)) —
    no scalar gathers, no HBM round-trip for the grouped tensor,
  - the center-subtract folds into the first layer's bias
    (relu((g - c)@W + b) == relu(g@W + (b - c@W_xyz))),
  - the 3-layer MLP runs on the MXU and the S-axis max-pool on the VPU.

Only valid for the BN-free single-scale stages (cfg.RCNN/IOUN.USE_BN=False,
rcnn_net.py:40-58); the BN path keeps the unfused XLA formulation.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

LANE = 128


def _kernel(S, n_layers, qx_ref, qy_ref, qz_ref, idx_ref, xyz_ref, feat_ref,
            *wb_and_out):
    w_refs = wb_and_out[:n_layers]
    b_refs = wb_and_out[n_layers:2 * n_layers]
    out_ref = wb_and_out[2 * n_layers]

    MT = qx_ref.shape[2]
    P = xyz_ref.shape[1]

    q = jnp.concatenate([qx_ref[0, 0], qy_ref[0, 0], qz_ref[0, 0]],
                        axis=1)                              # (MT, 3)
    idx = idx_ref[0, 0]                                      # (MT, S)
    xyz = xyz_ref[0]                                         # (P, 3)
    feats = feat_ref[0]                                      # (P, C)
    comb = jnp.concatenate([xyz, feats], axis=1)             # (P, 3+C)

    # one-hot "gather": (MT, S, P) @ (P, 3+C) on the MXU. Runs as a native
    # bf16 matmul (12x the 3-pass f32 emulation): the one-hot side is exact
    # in bf16 and exactly one product contributes per output, so the only
    # effect is bf16 rounding of the gathered values — same rounding the
    # following (default-precision) MLP matmuls apply anyway.
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (MT, S, P), 2)
    onehot = (p_iota == idx[:, :, None]).astype(jnp.bfloat16)
    g = jax.lax.dot_general(onehot, comb.astype(jnp.bfloat16),
                            (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (MT,S,3+C)

    h = g
    for li in range(n_layers):
        W = w_refs[li][...]                                  # (Cin, Cout)
        b = b_refs[li][...]                                  # (1, Cout)
        if li == 0:
            # fold the center-subtract into the bias: b - q @ W[:3]
            b_eff = b - jax.lax.dot_general(
                q, W[:3, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (MT, Cout)
            b_eff = b_eff[:, None, :]
        else:
            b_eff = b[None, :, :]
        h = jax.lax.dot_general(h, W, (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        h = jnp.maximum(h + b_eff, 0.0)

    out_ref[0, 0] = jnp.max(h, axis=1)                       # (MT, Cout)


def _xla_reference(xyz, features, new_xyz, idx, kernels, biases):
    """Unfused composition (group + dense stack + max) — used for the
    backward pass (the Pallas forward has no autodiff rule) and as the
    golden reference in tests."""
    from ws3d_tpu.ops.grouping import group_with_idx
    h = group_with_idx(idx, xyz, new_xyz, features, use_xyz=True)
    for k, b in zip(kernels, biases):
        h = jnp.maximum(jnp.einsum("bmsc,cd->bmsd", h, k) + b, 0.0)
    return jnp.max(h, axis=2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _fused_sa(xyz, features, new_xyz, idx, kernels, biases, interpret):
    return _pallas_forward(xyz, features, new_xyz, idx, kernels, biases,
                           interpret)


def _fused_sa_fwd(xyz, features, new_xyz, idx, kernels, biases, interpret):
    out = _pallas_forward(xyz, features, new_xyz, idx, kernels, biases,
                          interpret)
    return out, (xyz, features, new_xyz, idx, kernels, biases)


def _fused_sa_bwd(interpret, res, g):
    xyz, features, new_xyz, idx, kernels, biases = res
    _, vjp = jax.vjp(
        lambda x, f, q, ks, bs: _xla_reference(x, f, q, idx, ks, bs),
        xyz, features, new_xyz, tuple(kernels), tuple(biases))
    dx, df, dq, dks, dbs = vjp(g)
    didx = np.zeros(idx.shape, dtype=jax.dtypes.float0)
    return dx, df, dq, didx, dks, dbs


_fused_sa.defvjp(_fused_sa_fwd, _fused_sa_bwd)


def fused_sa_single_scale(xyz: jnp.ndarray, features: jnp.ndarray,
                          new_xyz: jnp.ndarray, idx: jnp.ndarray,
                          kernels: Sequence[jnp.ndarray],
                          biases: Sequence[jnp.ndarray],
                          interpret: bool = False) -> jnp.ndarray:
    """Differentiable wrapper: Pallas forward, XLA-composition backward."""
    return _fused_sa(xyz, features, new_xyz, idx, tuple(kernels),
                     tuple(biases), interpret)


def _pallas_forward(xyz: jnp.ndarray, features: jnp.ndarray,
                    new_xyz: jnp.ndarray, idx: jnp.ndarray,
                    kernels: Sequence[jnp.ndarray],
                    biases: Sequence[jnp.ndarray],
                    interpret: bool = False) -> jnp.ndarray:
    """xyz (B, P, 3), features (B, P, C), new_xyz (B, M, 3), idx (B, M, S),
    kernels[0] (3+C, C0), ... -> (B, M, C_last): per-sample MLP over
    center-relative grouped features, max-pooled over S.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, P, _ = xyz.shape
    M, S = idx.shape[1], idx.shape[2]
    n_layers = len(kernels)
    c_out = kernels[-1].shape[1]

    # query tile: bound the (MT, S, P) one-hot buffer to ~2 MB
    budget = max(2 * 1024 * 1024 // (S * P * 4), 8)
    MT = 8
    for cand in (64, 32, 16, 8):
        if cand <= budget and M % cand == 0:
            MT = cand
            break

    def coord(a, i):
        return a[..., i].astype(jnp.float32).reshape(B, M // MT, MT, 1)

    qx, qy, qz = coord(new_xyz, 0), coord(new_xyz, 1), coord(new_xyz, 2)
    idx_r = idx.reshape(B, M // MT, MT, S).astype(jnp.int32)

    qspec = pl.BlockSpec((1, 1, MT, 1), lambda b, m: (b, m, 0, 0),
                         memory_space=pltpu.VMEM)
    ispec = pl.BlockSpec((1, 1, MT, S), lambda b, m: (b, m, 0, 0),
                         memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((1, P, 3), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec((1, P, features.shape[2]), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    wspecs = [pl.BlockSpec(k.shape, lambda b, m: (0, 0),
                           memory_space=pltpu.VMEM) for k in kernels]
    bspecs = [pl.BlockSpec((1, b_.shape[0]), lambda b, m: (0, 0),
                           memory_space=pltpu.VMEM) for b_ in biases]
    ospec = pl.BlockSpec((1, 1, MT, c_out), lambda b, m: (b, m, 0, 0),
                         memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, S, n_layers),
        grid=(B, M // MT),
        in_specs=[qspec, qspec, qspec, ispec, xspec, fspec] + wspecs + bspecs,
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((B, M // MT, MT, c_out), jnp.float32),
        interpret=interpret,
    )(qx, qy, qz, idx_r, xyz.astype(jnp.float32),
      features.astype(jnp.float32),
      *[k.astype(jnp.float32) for k in kernels],
      *[b_.reshape(1, -1).astype(jnp.float32) for b_ in biases])
    return out.reshape(B, M, c_out)
