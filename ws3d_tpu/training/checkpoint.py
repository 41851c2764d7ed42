"""Checkpoint save/restore via orbax, with partial (stage-wise) loading.

Equivalent of tools/train_utils/train_utils.py:67-118: the reference pickles
{it, model_state, optimizer_state} with torch.save and stacks stage
checkpoints via key-filtered state-dict updates (load_part_ckpt — RPN ckpt +
RCNN ckpt merged for joint eval, eval_active.py:677-703). Here: orbax
PyTreeCheckpointer over {step, params, batch_stats}, and
`load_part_checkpoint` grafts matching top-level subtrees.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except ImportError:                                         # pragma: no cover
    _HAVE_ORBAX = False


def _to_host(tree):
    return jax.tree.map(np.asarray, tree)


def save_checkpoint(path: str, state, extra: Optional[Dict[str, Any]] = None):
    """Save {step, params, batch_stats} (+extra) to `path` (a directory)."""
    payload = {"step": np.asarray(state.step),
               "params": _to_host(state.params),
               "batch_stats": _to_host(state.batch_stats)}
    if extra:
        payload["extra"] = extra
    path = os.path.abspath(path)
    if _HAVE_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, payload, force=True)
    else:                                                   # pragma: no cover
        import pickle
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path + ".pkl", "wb") as f:
            pickle.dump(payload, f)


def load_checkpoint(path: str) -> Dict[str, Any]:
    path = os.path.abspath(path)
    if _HAVE_ORBAX and os.path.isdir(path):
        ckptr = ocp.PyTreeCheckpointer()
        return ckptr.restore(path)
    import pickle                                           # pragma: no cover
    with open(path + ".pkl", "rb") as f:
        return pickle.load(f)


def save_train_state(path: str, state):
    """Full-resume checkpoint: params + batch_stats + optimizer state + step
    (the reference torch.saves {it, model_state, optimizer_state},
    train_utils.py:67-83)."""
    # The optimizer state is a pytree of namedtuples orbax would flatten to
    # a *key-sorted* nested dict; store the leaves under explicit
    # order-preserving keys instead so restore can rebuild the live treedef
    # exactly, independent of field-name sort order.
    opt_leaves = jax.tree.leaves(state.opt_state)
    payload = {"step": np.asarray(state.step),
               "params": _to_host(state.params),
               "batch_stats": _to_host(state.batch_stats),
               "opt_leaves": {f"{i:05d}": np.asarray(leaf)
                              for i, leaf in enumerate(opt_leaves)}}
    path = os.path.abspath(path)
    if _HAVE_ORBAX:
        ocp.PyTreeCheckpointer().save(path, payload, force=True)
    else:                                                   # pragma: no cover
        import pickle
        with open(path + ".pkl", "wb") as f:
            pickle.dump(payload, f)


def restore_train_state(state, path: str):
    """Restore a full-resume checkpoint into an existing TrainState (the
    optimizer-state pytree is rebuilt with the state's own structure)."""
    ckpt = load_checkpoint(path)
    new_opt = state.opt_state
    treedef = jax.tree.structure(state.opt_state)
    if "opt_leaves" in ckpt:
        leaves = [ckpt["opt_leaves"][k] for k in sorted(ckpt["opt_leaves"])]
        new_opt = jax.tree.unflatten(treedef, leaves)
    elif "opt_state" in ckpt:                       # legacy checkpoints
        new_opt = jax.tree.unflatten(treedef, jax.tree.leaves(ckpt["opt_state"]))
    return state.replace(step=jnp_asarray_i32(ckpt["step"]),
                         params=ckpt["params"],
                         batch_stats=ckpt.get("batch_stats", {}),
                         opt_state=new_opt)


def jnp_asarray_i32(x):
    import jax.numpy as jnp
    return jnp.asarray(x, jnp.int32)


def _merge_subtree(fresh, loaded):
    """Recursive graft: loaded leaves win where present; fresh leaves fill
    anything the checkpoint lacks (e.g. IOUN cascade heads when loading an
    RCNN-only pretrain — the reference's key-filtered state-dict update has
    the same keep-missing behavior, train_utils.py:102-118)."""
    if not isinstance(loaded, dict) or not isinstance(fresh, dict):
        return loaded
    out = dict(fresh)
    for k, v in loaded.items():
        out[k] = _merge_subtree(fresh[k], v) if k in fresh else v
    return out


def load_part_checkpoint(variables: Dict[str, Any], path: str,
                         subtrees=("rpn", "rcnn")) -> Dict[str, Any]:
    """Graft matching top-level param subtrees from a checkpoint into
    `variables` (load_part_ckpt, train_utils.py:102-118): used to stack an
    RPN ckpt with an RCNN/IOUN ckpt for joint two-stage eval, or to warm an
    IOUN model from an RCNN-only pretrain (missing keys stay fresh)."""
    ckpt = load_checkpoint(path)
    out_params = dict(variables["params"])
    for key in subtrees:
        if key in ckpt["params"] and key in out_params:
            out_params[key] = _merge_subtree(out_params[key],
                                             ckpt["params"][key])
    out = dict(variables)
    out["params"] = out_params
    if "batch_stats" in variables and ckpt.get("batch_stats"):
        bs = dict(variables["batch_stats"])
        for key in subtrees:
            if key in ckpt["batch_stats"] and key in bs:
                bs[key] = _merge_subtree(bs[key], ckpt["batch_stats"][key])
        out["batch_stats"] = bs
    return out
