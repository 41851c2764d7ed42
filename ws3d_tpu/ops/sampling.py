"""Furthest point sampling + point gathering.

TPU-native equivalent of pointnet2's sampling kernels
(/root/reference/pointnet2_lib/pointnet2/src/sampling_gpu.cu:8-253):
FPS is a sequential lax.scan keeping the running min-distance cache in
registers/VMEM (the CUDA version does a per-block tree reduction; on TPU the
argmax reduction over N lives on the VPU). Gather is a plain XLA gather —
no custom kernel needed, XLA fuses it.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def furthest_point_sample(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """Iterative FPS. xyz (B, N, 3) -> (B, npoint) int32 indices.

    Semantics match sampling_gpu.cu:93-253: the first selected index is 0;
    each following pick maximizes min-distance to the selected set.
    """
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


def gather_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """points (B, N, C), idx (B, M) int -> (B, M, C).

    Equivalent of gather_points_kernel_fast (sampling_gpu.cu:8-83) in
    channel-last layout; XLA lowers this to a fused gather.
    """
    return jnp.take_along_axis(points, idx[..., None].astype(jnp.int32), axis=1)
