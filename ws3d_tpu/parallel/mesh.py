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
