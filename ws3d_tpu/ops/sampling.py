"""Furthest point sampling + point gathering.

TPU-native equivalent of pointnet2's sampling kernels
(/root/reference/pointnet2_lib/pointnet2/src/sampling_gpu.cu:8-253):
FPS is a sequential lax.scan keeping the running min-distance cache in
registers/VMEM (the CUDA version does a per-block tree reduction; on TPU the
argmax reduction over N lives on the VPU). Gather is a plain XLA gather —
no custom kernel needed, XLA fuses it.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _fps_scan(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """Reference lax.scan FPS (portable path; used off-TPU)."""
    B, N, _ = xyz.shape
    first = jnp.zeros((B,), dtype=jnp.int32)

    def body(carry, _):
        min_d2, last = carry
        last_pt = jnp.take_along_axis(xyz, last[:, None, None], axis=1)  # (B,1,3)
        d2 = jnp.sum(jnp.square(xyz - last_pt), axis=-1)                 # (B,N)
        min_d2 = jnp.minimum(min_d2, d2)
        nxt = jnp.argmax(min_d2, axis=-1).astype(jnp.int32)
        return (min_d2, nxt), nxt

    init = (jnp.full((B, N), 1e10, dtype=xyz.dtype), first)
    if npoint == 1:
        return first[:, None]
    (_, _), rest = jax.lax.scan(body, init, None, length=npoint - 1)
    return jnp.concatenate([first[:, None], rest.T], axis=1)


def _fps_pallas_kernel(npoint, x_ref, y_ref, z_ref, out_ref, mind_ref):
    """One batch row per grid program. Point coordinates arrive as
    (1, 8, N/8) VMEM tiles (TPU lane layout); the min-distance cache stays in
    VMEM for the whole sweep; the last-picked coordinates are recovered each
    iteration with a masked reduction (no dynamic scalar gather); the picked
    indices stream to an SMEM output row."""
    _, R, C = x_ref.shape
    N = R * C
    # linear original index of element (r, c) is r*C + c (row-major reshape)
    iota = (jax.lax.broadcasted_iota(jnp.int32, (R, C), 0) * C
            + jax.lax.broadcasted_iota(jnp.int32, (R, C), 1))
    x, y, z = x_ref[0], y_ref[0], z_ref[0]
    mind_ref[...] = jnp.full((R, C), 1e10, jnp.float32)
    out_ref[0, 0, 0] = 0

    def body(i, last):
        sel = iota == last
        lx = jnp.max(jnp.where(sel, x, -jnp.inf))
        ly = jnp.max(jnp.where(sel, y, -jnp.inf))
        lz = jnp.max(jnp.where(sel, z, -jnp.inf))
        d2 = (jnp.square(x - lx) + jnp.square(y - ly) + jnp.square(z - lz))
        mind = jnp.minimum(mind_ref[...], d2)
        mind_ref[...] = mind
        best = jnp.max(mind)
        nxt = jnp.min(jnp.where(mind == best, iota, N)).astype(jnp.int32)
        out_ref[0, 0, i] = nxt
        return nxt

    jax.lax.fori_loop(1, npoint, body, jnp.int32(0))


def _fps_pallas(xyz: jnp.ndarray, npoint: int,
                interpret: bool = False) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, _ = xyz.shape
    assert N % 8 == 0, "pallas FPS requires N % 8 == 0"
    C = N // 8
    x = xyz[..., 0].astype(jnp.float32).reshape(B, 8, C)
    y = xyz[..., 1].astype(jnp.float32).reshape(B, 8, C)
    z = xyz[..., 2].astype(jnp.float32).reshape(B, 8, C)
    tile = pl.BlockSpec((1, 8, C), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, npoint), lambda b: (b, 0, 0),
                            memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        functools.partial(_fps_pallas_kernel, npoint),
        grid=(B,),
        in_specs=[tile, tile, tile],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, 1, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, C), jnp.float32)],
        interpret=interpret,
    )(x, y, z)
    return out.reshape(B, npoint)


def furthest_point_sample(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """Iterative FPS. xyz (B, N, 3) -> (B, npoint) int32 indices.

    Semantics match sampling_gpu.cu:93-253: the first selected index is 0;
    each following pick maximizes min-distance to the selected set (lowest
    index wins ties). On TPU this runs as a Pallas kernel with the
    min-distance cache resident in VMEM; elsewhere as a lax.scan.
    """
    if npoint <= 1:
        return jnp.zeros((xyz.shape[0], max(npoint, 1)), dtype=jnp.int32)
    try:
        on_tpu = jax.default_backend() in ("tpu", "axon")
    except Exception:                                       # pragma: no cover
        on_tpu = False
    if on_tpu and xyz.shape[1] % 8 == 0:
        return _fps_pallas(xyz, npoint)
    return _fps_scan(xyz, npoint)


def gather_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """points (B, N, C), idx (B, M) int -> (B, M, C).

    Equivalent of gather_points_kernel_fast (sampling_gpu.cu:8-83) in
    channel-last layout; XLA lowers this to a fused gather.
    """
    return jnp.take_along_axis(points, idx[..., None].astype(jnp.int32), axis=1)
