"""Host-side sampling utilities.

Equivalents of the reference misc utils (SURVEY.md §2.3 G11):
- weighted_sample (lib/utils/weighted_sample.py:6-35): draw k indices with
  probability proportional to weights, without replacement.
- greedy_furthest_point_sample (lib/utils/greedFurthestPoint.py:11-84):
  O(N*k) CPU FPS used by host-side tooling (the device path is
  ws3d_tpu.ops.sampling).
"""
from __future__ import annotations

import numpy as np


def weighted_sample(weights: np.ndarray, k: int,
                    rng: np.random.RandomState | None = None) -> np.ndarray:
    """Draw k distinct indices with prob ∝ weights (weighted_sample.py)."""
    rng = rng or np.random.RandomState()
    w = np.asarray(weights, np.float64)
    w = np.clip(w, 0, None)
    n = w.shape[0]
    k = min(k, int((w > 0).sum()))
    if k == 0:
        return np.zeros(0, np.int64)
    p = w / w.sum()
    return rng.choice(n, size=k, replace=False, p=p)


def greedy_furthest_point_sample(points: np.ndarray, k: int,
                                 start: int = 0) -> np.ndarray:
    """CPU FPS: same semantics as the device kernel (first pick = start)."""
    n = points.shape[0]
    k = min(k, n)
    out = np.empty(k, np.int64)
    out[0] = start
    d2 = np.full(n, np.inf)
    last = start
    for i in range(1, k):
        diff = points - points[last]
        d2 = np.minimum(d2, np.einsum("nd,nd->n", diff, diff))
        last = int(d2.argmax())
        out[i] = last
    return out
