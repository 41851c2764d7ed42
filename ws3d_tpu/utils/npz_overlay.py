"""Overlay a flat 'collection/path/leaf'-keyed npz onto a variables tree.

Used by bench.py (fitted bench weights) and tools/eval_auto.py
(--bench_weights) so the benchmark and AP checks run the SAME loader with
the same all-or-nothing coverage guarantee: a partial overlay after a
model/config refactor must fail, not silently measure part-random weights.
"""
from __future__ import annotations

import numpy as np


def overlay_flat_npz(variables, path: str):
    """Return (variables_with_npz_leaves, overlaid_count, total_leaves).

    Raises RuntimeError unless EVERY leaf of `variables` is overlaid by a
    same-shaped npz entry and EVERY npz key is consumed.
    """
    flat = np.load(path)
    leaves = {tuple(key.split("/")): flat[key] for key in flat.files}
    stats = {"total": 0, "overlaid": 0, "mismatched": []}
    unused = set(leaves)

    def walk(tree, prefix):
        if isinstance(tree, dict):
            return {k: walk(v, prefix + (k,)) for k, v in tree.items()}
        stats["total"] += 1
        new = leaves.get(prefix)
        if new is None or new.shape != tree.shape:
            stats["mismatched"].append(
                "/".join(prefix) + ("" if new is None
                                    else f" shape {new.shape}!={tree.shape}"))
            return tree
        unused.discard(prefix)
        stats["overlaid"] += 1
        return new.astype(np.asarray(tree).dtype)

    out = walk(variables, ())
    if stats["mismatched"] or unused:
        raise RuntimeError(
            f"npz weight overlay incomplete: {stats['overlaid']}/"
            f"{stats['total']} leaves overlaid; missing/mismatched="
            f"{stats['mismatched'][:5]}; unused npz keys="
            f"{sorted('/'.join(k) for k in unused)[:5]} — regenerate "
            f"{path} with tools/fit_bench_weights.py")
    return out, stats["overlaid"], stats["total"]
