"""Device-mesh helpers: data-parallel sharding over ICI.

The reference has no distributed runtime (SURVEY.md §2.6 — only optional
single-process nn.DataParallel, tools/train_rpn.py:175-176). The TPU-native
equivalent is a 1-D `data` mesh: batches sharded over devices, parameters
replicated, gradients all-reduced by XLA via sharding propagation — no
hand-written collectives needed for a ~10 M-param model.

Multi-host extension: the same named sharding works under
jax.distributed.initialize with a global mesh; per-host loaders feed
host-local shards via jax.make_array_from_process_local_data.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh,
                axis: str = "data") -> Dict[str, Any]:
    """Device-put a host batch with the leading dim sharded. Scalar/0-d
    entries are replicated."""
    data_s = batch_sharding(mesh, axis)
    repl = replicated_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] % mesh.devices.size == 0:
            return jax.device_put(x, data_s)
        return jax.device_put(x, repl)

    return jax.tree.map(put, batch)


def shard_batch_multihost(batch: Dict[str, Any], mesh: Mesh,
                          axis: str = "data") -> Dict[str, Any]:
    """Multi-host variant of shard_batch: each process supplies its local
    slice of the GLOBAL batch (leading dim = global batch size across all
    hosts); builds jax.Arrays via make_array_from_process_local_data so the
    data-parallel step sees one global array per leaf. Single-host meshes
    fall through to shard_batch."""
    import jax.experimental.multihost_utils  # noqa: F401  (ensures init)
    if jax.process_count() == 1:
        return shard_batch(batch, mesh, axis)
    data_s = batch_sharding(mesh, axis)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(data_s, x)

    return jax.tree.map(put, batch)


def data_parallel_step(step, mesh: Mesh, axis: str = "data",
                       donate_state: bool = True):
    """shard_map a train step built with axis_name=axis (see
    make_*_train_step): each device differentiates its batch shard with the
    Pallas forwards executing per-device — Mosaic custom calls have no SPMD
    partitioning rule, so the propagation-based path (data_parallel_jit)
    cannot carry the fused kernels onto a real multi-chip mesh — and the
    step's internal pmean makes every replica apply the identical update.
    This is the scaling-book shard_map recipe and the semantic twin of the
    reference's nn.DataParallel (replica-mean losses/grads,
    tools/train_rpn.py:175-176)."""
    from jax.experimental.shard_map import shard_map

    mapped = shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(axis), P(), P()),
        out_specs=(P(), P()),
        check_rep=False)
    jfn = jax.jit(mapped, donate_argnums=(0,) if donate_state else ())
    repl = replicated_sharding(mesh)

    def wrapper(state, batch, rng, bn_momentum):
        state = jax.device_put(state, repl)   # no-op once resident
        return jfn(state, batch, rng, bn_momentum)

    return wrapper


def data_parallel_infer(fn, mesh: Mesh, axis: str = "data"):
    """shard_map a pure inference fn(variables, batch) over the data axis:
    params replicated, scene batch split, every Pallas kernel runs on its
    own device's shard. Per-scene results are unchanged — the two-stage
    graph is batch-leading everywhere except the stage-2 compaction, whose
    batch-pooled top-k only regroups work."""
    from jax.experimental.shard_map import shard_map

    mapped = shard_map(fn, mesh=mesh, in_specs=(P(), P(axis)),
                       out_specs=P(axis), check_rep=False)
    return jax.jit(mapped)


def data_parallel_jit(fn, mesh: Mesh, axis: str = "data",
                      donate_state: bool = True):
    """jit `fn(state, batch, *extras)` for data parallelism: the state is
    replicated, the batch arrives pre-sharded on its leading dim (see
    shard_batch), and XLA's sharding propagation inserts the gradient
    all-reduce over ICI. Extras (rng keys, scalars) are replicated.

    With donate_state (default) the incoming train-state buffers are
    donated to the updated state — the caller must follow the standard
    `state = step(state, ...)` pattern and not reuse the old state."""
    repl = replicated_sharding(mesh)
    jfn = jax.jit(fn, donate_argnums=(0,) if donate_state else ())

    def wrapper(state, batch, *extras):
        state = jax.device_put(state, repl)   # no-op once resident
        return jfn(state, batch, *extras)

    return wrapper
