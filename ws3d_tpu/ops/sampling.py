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


def _fps_pallas_kernel(npoint, x_ref, y_ref, z_ref, out_ref, ox_ref, oy_ref,
                       oz_ref, mind_ref):
    """ALL batch rows advance together: rows (batch elements) live on the
    sublane axis, points on the lane axis, so each of the npoint sequential
    iterations does row-parallel masked reductions for the whole block —
    sequential depth is npoint, not B * npoint. The min-distance cache stays
    in VMEM for the whole sweep; picked indices stream to VMEM columns.

    The picked COORDINATES stream out alongside the indices: every step
    already extracts the new pick's (x, y, z) via masked reductions for the
    next distance update, and emitting them kills the consumer-side
    new_xyz = gather_points(xyz, idx) row gather (~11.5 ns/row regardless
    of width — 5.2 ms/iteration across the four FPS sites of the two-stage
    pipeline, profiled round 3)."""
    R, N = x_ref.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (R, N), 1)
    x, y, z = x_ref[...], y_ref[...], z_ref[...]
    mind_ref[...] = jnp.full((R, N), 1e10, jnp.float32)

    # Mosaic cannot store at a dynamic lane offset, so picks accumulate in a
    # (R, CH) pending buffer (select-by-lane) and flush once per 128-aligned
    # chunk.
    CH = 128 if npoint % 128 == 0 else npoint
    ch_iota = jax.lax.broadcasted_iota(jnp.int32, (R, CH), 1)

    def extract(nxt):
        """Coordinates of per-row point index `nxt` (masked reductions)."""
        sel = iota == nxt[:, None]
        cx = jnp.max(jnp.where(sel, x, -jnp.inf), axis=1, keepdims=True)
        cy = jnp.max(jnp.where(sel, y, -jnp.inf), axis=1, keepdims=True)
        cz = jnp.max(jnp.where(sel, z, -jnp.inf), axis=1, keepdims=True)
        return cx, cy, cz

    def step(i, last_xyz, pending):
        lx, ly, lz = last_xyz
        d2 = (jnp.square(x - lx) + jnp.square(y - ly) + jnp.square(z - lz))
        mind = jnp.minimum(mind_ref[...], d2)
        mind_ref[...] = mind
        best = jnp.max(mind, axis=1, keepdims=True)
        nxt = jnp.min(jnp.where(mind == best, iota, N), axis=1).astype(
            jnp.int32)
        # i == 0 is the fixed seed index 0 (sampling_gpu.cu semantics)
        nxt = jnp.where(i == 0, jnp.zeros((R,), jnp.int32), nxt)
        nx, ny, nz = extract(nxt)
        pi, px_, py_, pz_ = pending
        at = ch_iota == (i % CH)
        pending = (jnp.where(at, nxt[:, None], pi),
                   jnp.where(at, nx, px_), jnp.where(at, ny, py_),
                   jnp.where(at, nz, pz_))
        return (nx, ny, nz), pending

    def run_chunk(c, last_xyz):
        pending = (jnp.zeros((R, CH), jnp.int32),
                   jnp.zeros((R, CH), jnp.float32),
                   jnp.zeros((R, CH), jnp.float32),
                   jnp.zeros((R, CH), jnp.float32))

        def inner(j, st):
            last_xyz, pending = st
            return step(c * CH + j, last_xyz, pending)

        return jax.lax.fori_loop(0, CH, inner, (last_xyz, pending))

    # seed: the first distance update measures against point 0 (the i == 0
    # step overwrites its pick with index 0 and extracts point 0's coords)
    seed = (x[:, 0:1], y[:, 0:1], z[:, 0:1])
    if npoint == CH:
        # single chunk: static full-width store (Mosaic cannot prove
        # alignment of a loop-carried lane offset below 128)
        _, (pi, px_, py_, pz_) = run_chunk(0, seed)
        out_ref[...], ox_ref[...], oy_ref[...], oz_ref[...] = pi, px_, py_, pz_
    else:
        def chunk_body(c, last_xyz):
            last_xyz, (pi, px_, py_, pz_) = run_chunk(c, last_xyz)
            sl = pl.ds(pl.multiple_of(c * CH, CH), CH)
            out_ref[:, sl] = pi
            ox_ref[:, sl] = px_
            oy_ref[:, sl] = py_
            oz_ref[:, sl] = pz_
            return last_xyz

        jax.lax.fori_loop(0, npoint // CH, chunk_body, seed)


from jax.experimental import pallas as pl  # noqa: E402  - used in kernel


def _fps_pallas(xyz: jnp.ndarray, npoint: int,
                rows_per_program: int | None = None,
                interpret: bool = False) -> jnp.ndarray:
    from jax.experimental.pallas import tpu as pltpu

    B, N, _ = xyz.shape
    if rows_per_program is None:
        # as many batch rows per program as ~2 MB of VMEM per buffer allows:
        # sequential iteration count is npoint * ceil(B/R), so bigger R
        # directly cuts the sweep count for many-small-cloud workloads
        # (stage-2 runs 512 crop-rows: R=512 -> ONE 256-iteration sweep
        # instead of four)
        rows_per_program = max(min(2 * 1024 * 1024 // (N * 4), 512), 8)
    R = min(rows_per_program, max(8, B))
    pad = (-B) % R
    if pad:
        xyz = jnp.concatenate(
            [xyz, jnp.broadcast_to(xyz[:1], (pad,) + xyz.shape[1:])], axis=0)
    BP = xyz.shape[0]
    x = xyz[..., 0].astype(jnp.float32)
    y = xyz[..., 1].astype(jnp.float32)
    z = xyz[..., 2].astype(jnp.float32)
    tile = pl.BlockSpec((R, N), lambda b: (b, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((R, npoint), lambda b: (b, 0),
                            memory_space=pltpu.VMEM)
    idx, ox, oy, oz = pl.pallas_call(
        functools.partial(_fps_pallas_kernel, npoint),
        grid=(BP // R,),
        in_specs=[tile, tile, tile],
        out_specs=[out_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((BP, npoint), jnp.int32)]
                  + [jax.ShapeDtypeStruct((BP, npoint), jnp.float32)] * 3,
        scratch_shapes=[pltpu.VMEM((R, N), jnp.float32)],
        interpret=interpret,
    )(x, y, z)
    coords = jnp.stack([ox, oy, oz], axis=-1)
    return idx[:B], coords[:B]


def furthest_point_sample(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """Iterative FPS. xyz (B, N, 3) -> (B, npoint) int32 indices.

    Semantics match sampling_gpu.cu:93-253: the first selected index is 0;
    each following pick maximizes min-distance to the selected set (lowest
    index wins ties). On TPU this runs as a Pallas kernel with the
    min-distance cache resident in VMEM; elsewhere as a lax.scan.
    """
    return furthest_point_sample_with_coords(xyz, npoint)[0]


def furthest_point_sample_with_coords(xyz: jnp.ndarray, npoint: int):
    """FPS returning (idx (B, npoint) int32, coords (B, npoint, 3) f32).

    coords == gather_points(xyz[..., :3], idx), but on TPU the Pallas kernel
    emits the picked coordinates directly (it extracts them every step for
    the distance update anyway), which saves the consumer-side row gather —
    XLA row gathers cost ~11.5 ns/row regardless of width (BENCH.md)."""
    if npoint <= 1:
        npoint = max(npoint, 1)
        idx = jnp.zeros((xyz.shape[0], npoint), dtype=jnp.int32)
        return idx, jnp.broadcast_to(
            xyz[:, :1, :3], (xyz.shape[0], npoint, 3)).astype(jnp.float32)
    try:
        on_tpu = jax.default_backend() in ("tpu", "axon")
    except Exception:                                       # pragma: no cover
        on_tpu = False
    if on_tpu and xyz.shape[1] % 8 == 0:
        return _fps_pallas(xyz, npoint)
    idx = _fps_scan(xyz, npoint)
    return idx, gather_points(xyz[..., :3], idx).astype(jnp.float32)


def gather_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """points (B, N, C), idx (B, M) int -> (B, M, C).

    Equivalent of gather_points_kernel_fast (sampling_gpu.cu:8-83) in
    channel-last layout; XLA lowers this to a fused gather.
    """
    return jnp.take_along_axis(points, idx[..., None].astype(jnp.int32), axis=1)
