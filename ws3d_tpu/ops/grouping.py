"""Ball query + grouping (fixed shapes, chunked distance tiles).

TPU-native equivalent of pointnet2's ball_query/group kernels
(/root/reference/pointnet2_lib/pointnet2/src/ball_query_gpu.cu:9-67,
group_points_gpu.cu:8-86). Semantics preserved exactly:

- for each query center, the first ``nsample`` in-radius point indices *in
  ascending index order* are taken (strict ``<`` radius test);
- slots beyond the in-radius count are padded with the FIRST in-radius index;
- centers with no in-radius point yield all-zero indices.

Instead of a per-center sequential scan (the CUDA approach), we tile the
(M, N) squared-distance matrix over M-chunks and use a top-k over masked
index keys — MXU-friendly batched matmuls for the distance tiles, VPU for
the top-k.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a (..., M, 3), b (..., N, 3) -> (..., M, N) squared distances.

    Computed as three broadcast (a-b)^2 passes on the VPU rather than the
    |a|^2 - 2ab + |b|^2 MXU form: a K=3 contraction wastes the 128-wide
    systolic array AND TPU matmuls default to bf16 multiplies, which
    perturbs the radius test near the boundary (exactness matters for
    CUDA-parity of the in-ball masks).
    """
    d = None
    for c in range(3):
        dc = a[..., :, None, c] - b[..., None, :, c]
        d = dc * dc if d is None else d + dc * dc
    return d


def first_k_true_indices(mask: jnp.ndarray, k: int,
                         tile: int = 128) -> jnp.ndarray:
    """mask (..., N) bool -> (..., k) int32: positions of the first k True
    entries in ascending order; slots past the count hold N (invalid marker).

    Sort-free and (almost) gather-free: a two-level rank search. The s-th
    True position is where cumsum(mask) first reaches s; instead of per-row
    binary searches (scalar gathers — slow on TPU) we
      1. cumsum within 128-wide tiles + a tiny cross-tile cumsum,
      2. locate the target tile with a vectorized compare-count over T tiles,
      3. slice-gather the one matching tile per (row, slot) and compare-count
         inside it.
    All heavy ops are VPU-friendly masked reductions; the only gather moves
    contiguous 128-element tiles.
    """
    N = mask.shape[-1]
    lead = mask.shape[:-1]
    m2 = mask.reshape(-1, N)
    M = m2.shape[0]
    targets = jnp.arange(1, k + 1, dtype=jnp.int32)

    if N % tile != 0 or N < tile:
        # irregular sizes: plain searchsorted fallback
        rank = jnp.cumsum(m2.astype(jnp.int32), axis=-1)
        idx = jax.vmap(lambda r: jnp.searchsorted(r, targets,
                                                  side="left"))(rank)
        return idx.reshape(lead + (k,)).astype(jnp.int32)

    T = N // tile
    m3 = m2.reshape(M, T, tile)
    local = jnp.cumsum(m3.astype(jnp.int32), axis=-1)      # (M, T, t)
    tile_end = jnp.cumsum(local[..., -1], axis=-1)         # (M, T)

    # tile holding slot s: first j with tile_end[j] >= s  ==  #{tile_end < s}
    tile_j = jnp.sum(tile_end[:, None, :] < targets[None, :, None],
                     axis=-1).astype(jnp.int32)            # (M, k) in [0, T]
    overflow = tile_j >= T
    tile_jc = jnp.minimum(tile_j, T - 1)

    base = jnp.where(
        tile_jc > 0,
        jnp.take_along_axis(tile_end, jnp.maximum(tile_jc - 1, 0), axis=-1),
        0)                                                  # (M, k)
    local_sel = jax.vmap(lambda l, j: l[j])(local, tile_jc)  # (M, k, t)
    local_target = (targets[None, :] - base)[..., None]      # (M, k, 1)
    off = jnp.sum(local_sel < local_target, axis=-1)         # (M, k)
    idx = tile_jc * tile + off.astype(jnp.int32)
    idx = jnp.where(overflow, N, idx)
    return idx.reshape(lead + (k,)).astype(jnp.int32)


def _select_in_ball(d2: jnp.ndarray, radius: float,
                    nsample: int) -> jnp.ndarray:
    """d2 (B, Mc, N) -> (B, Mc, nsample) first-k in-radius indices with the
    CUDA first-index padding / zero-on-empty semantics."""
    N = d2.shape[-1]
    in_ball = d2 < radius * radius
    idx = first_k_true_indices(in_ball, nsample)      # invalid slots -> N
    valid = idx < N
    first = idx[..., 0:1]
    idx = jnp.where(valid, idx, first)                              # pad w/ first
    return jnp.where(first < N, idx, 0).astype(jnp.int32)           # empty -> 0


def _ball_query_chunk(new_xyz_c: jnp.ndarray, xyz: jnp.ndarray,
                      radius: float, nsample: int) -> jnp.ndarray:
    """new_xyz_c (B, Mc, 3), xyz (B, N, 3) -> (B, Mc, nsample) int32."""
    d2 = _pairwise_sqdist(new_xyz_c, xyz)                          # (B, Mc, N)
    return _select_in_ball(d2, radius, nsample)


def _ball_query_chunk_multi(new_xyz_c, xyz, radii, nsamples):
    """Multi-scale variant sharing ONE distance matrix across radius scales
    (the reference recomputes per scale — pointnet2_modules.py:40-55)."""
    d2 = _pairwise_sqdist(new_xyz_c, xyz)
    return tuple(_select_in_ball(d2, r, s) for r, s in zip(radii, nsamples))


def _use_pallas(N: int, M: int) -> bool:
    try:
        backend = jax.default_backend()
    except Exception:                                       # pragma: no cover
        return False
    return backend in ("tpu", "axon") and N % 128 == 0 and M % 8 == 0


def ball_query_multi(radii, nsamples, xyz: jnp.ndarray, new_xyz: jnp.ndarray,
                     chunk: int = 512):
    """Per-scale index lists with a shared distance matrix.

    On TPU (and 128-aligned N) this dispatches to the fused Pallas kernel
    (ws3d_tpu.ops.ball_query_pallas — ~5x the XLA path at SA-1 scale);
    elsewhere to the chunked XLA implementation.

    :return: tuple of (B, M, nsamples[i]) int32, one per scale.
    """
    B, M, _ = new_xyz.shape
    if _use_pallas(xyz.shape[1], M):
        from ws3d_tpu.ops.ball_query_pallas import ball_query_pallas
        return ball_query_pallas(radii, nsamples, xyz, new_xyz)
    chunk = min(chunk, M)
    if M % chunk != 0:
        chunk = M
    n_chunks = M // chunk
    if n_chunks == 1:
        return _ball_query_chunk_multi(new_xyz, xyz, radii, nsamples)
    chunks = new_xyz.reshape(B, n_chunks, chunk, 3).swapaxes(0, 1)
    outs = jax.lax.map(
        functools.partial(_ball_query_chunk_multi, xyz=xyz, radii=tuple(radii),
                          nsamples=tuple(nsamples)),
        chunks,
    )
    return tuple(o.swapaxes(0, 1).reshape(B, M, s)
                 for o, s in zip(outs, nsamples))


def ball_query(radius: float, nsample: int, xyz: jnp.ndarray,
               new_xyz: jnp.ndarray, chunk: int = 512,
               force_xla: bool = False) -> jnp.ndarray:
    """:param xyz: (B, N, 3) all points
    :param new_xyz: (B, M, 3) query centers
    :param force_xla: skip the Pallas kernel (it has no autodiff rule —
        REQUIRED when this call sits inside a function being linearized
        w.r.t. the coordinates, e.g. a fused-SA custom_vjp backward)
    :return: (B, M, nsample) int32 indices into N
    """
    B, M, _ = new_xyz.shape
    if not force_xla and _use_pallas(xyz.shape[1], M):
        from ws3d_tpu.ops.ball_query_pallas import ball_query_pallas
        return ball_query_pallas([radius], [nsample], xyz, new_xyz)[0]
    chunk = min(chunk, M)
    if M % chunk != 0:
        chunk = M  # fall back to a single tile for irregular sizes
    n_chunks = M // chunk
    if n_chunks == 1:
        return _ball_query_chunk(new_xyz, xyz, radius, nsample)
    chunks = new_xyz.reshape(B, n_chunks, chunk, 3).swapaxes(0, 1)
    out = jax.lax.map(
        functools.partial(_ball_query_chunk, xyz=xyz, radius=radius,
                          nsample=nsample),
        chunks,
    )                                                                # (n, B, c, S)
    return out.swapaxes(0, 1).reshape(B, M, nsample)


def group_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """points (B, N, C), idx (B, M, S) -> (B, M, S, C)
    (group_points_kernel_fast equivalent, channel-last).

    Custom VJP: XLA's TPU lowering of the gather's natural backward (a
    scatter-add of B*M*S rows) serializes into index-expansion fusions and
    transposed-layout applies — measured 130+ ms per SA stage in the RCNN
    train step (800 crops x 256 x 16 x 131). The backward here is a
    segment-sum expressed as a chunked one-hot matmul (exact 0/1 operand,
    f32 HIGHEST accumulation): the sum lands on the MXU and the grad-side
    numerics match the scatter up to float reassociation (same as any
    reduction-order change). Narrow channels (C < 32) keep the scatter —
    there the VPU one-hot compares would dominate the tiny matmul
    (group_points_grad_kernel_fast is the reference twin,
    pointnet2_lib/src/group_points_gpu.cu:8-40)."""
    return _group_points(points, idx, points.shape[1])


# one-hot chunk buffer budget (elements) for the matmul backward: the
# (B, CH, N) one-hot is materialized per fori step; 2^25 f32 = 128 MB
_ONEHOT_BUDGET = 1 << 25


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _group_points(points, idx, n_points):
    return jax.vmap(lambda p, i: p[i])(points, idx)


def _group_points_fwd(points, idx, n_points):
    return _group_points(points, idx, n_points), idx


def _group_points_bwd(n_points, idx, g):
    B, M, S, C = g.shape
    N = n_points
    K = M * S
    if C < 32:
        dpoints = jnp.zeros((B, N, C), jnp.float32).at[
            jnp.arange(B)[:, None], idx.reshape(B, K)
        ].add(g.reshape(B, K, C).astype(jnp.float32))
        return dpoints.astype(g.dtype), None

    gf = g.reshape(B, K, C).astype(jnp.float32)
    fidx = idx.reshape(B, K).astype(jnp.int32)
    ch = max(8, min(K, _ONEHOT_BUDGET // max(B * N, 1) // 8 * 8))
    n_chunks = -(-K // ch)
    pad = n_chunks * ch - K
    if pad:
        # pad with an out-of-range index: its one-hot row is all zero, so
        # padded grad rows contribute nothing
        fidx = jnp.concatenate(
            [fidx, jnp.full((B, pad), N, jnp.int32)], axis=1)
        gf = jnp.concatenate([gf, jnp.zeros((B, pad, C), gf.dtype)], axis=1)

    iota_n = jnp.arange(N, dtype=jnp.int32)

    def body(j, acc):
        sl_idx = jax.lax.dynamic_slice(fidx, (0, j * ch), (B, ch))
        sl_g = jax.lax.dynamic_slice(gf, (0, j * ch, 0), (B, ch, C))
        onehot = (sl_idx[:, :, None] == iota_n[None, None, :]).astype(
            jnp.float32)                                     # (B, ch, N)
        return acc + jax.lax.dot_general(
            onehot, sl_g, (((1,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST)             # (B, N, C)

    dpoints = jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros((B, N, C), jnp.float32))
    return dpoints.astype(g.dtype), None


_group_points.defvjp(_group_points_fwd, _group_points_bwd)


def group_with_idx(idx: jnp.ndarray, xyz: jnp.ndarray,
                   new_xyz: jnp.ndarray, features: jnp.ndarray | None,
                   use_xyz: bool = True) -> jnp.ndarray:
    """Gather + center-subtract + concat for a precomputed index set.

    xyz and features are gathered with ONE row-gather from a concatenated
    (B, N, 3+C) buffer: separate gathers leave the xyz side fetching 3-float
    rows, which is badly lane-underutilized on TPU (measured ~2x the cost of
    the fused gather at stage-2 crop scale)."""
    if features is None:
        assert use_xyz, "cannot have no features and not use xyz"
        return group_points(xyz, idx) - new_xyz[:, :, None, :]
    if not use_xyz:
        return group_points(features, idx)
    combined = jnp.concatenate([xyz, features], axis=-1)     # (B, N, 3+C)
    grouped = group_points(combined, idx)                    # (B, M, S, 3+C)
    centered = grouped[..., :3] - new_xyz[:, :, None, :]
    return jnp.concatenate([centered, grouped[..., 3:]], axis=-1)


def query_and_group(radius: float, nsample: int, xyz: jnp.ndarray,
                    new_xyz: jnp.ndarray, features: jnp.ndarray | None,
                    use_xyz: bool = True, chunk: int = 512,
                    force_xla: bool = False) -> jnp.ndarray:
    """QueryAndGroup (pointnet2_utils.py:231-268) in channel-last layout.

    :return: (B, M, nsample, 3+C) — center-relative xyz concat features.
    """
    idx = ball_query(radius, nsample, xyz, new_xyz, chunk=chunk,
                     force_xla=force_xla)
    return group_with_idx(idx, xyz, new_xyz, features, use_xyz=use_xyz)


def group_all(xyz: jnp.ndarray, features: jnp.ndarray | None,
              use_xyz: bool = True) -> jnp.ndarray:
    """GroupAll (pointnet2_utils.py:271-290): one group holding all points.

    :return: (B, 1, N, 3+C)
    """
    grouped_xyz = xyz[:, None, :, :]
    if features is None:
        return grouped_xyz
    feats = features[:, None, :, :]
    if use_xyz:
        return jnp.concatenate([grouped_xyz, feats], axis=-1)
    return feats
