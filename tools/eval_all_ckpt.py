"""Checkpoint sweep: evaluate every checkpoint in a directory and report the
best by summed Car 3D AP.

Equivalent of eval_all_ckpt in /root/reference/tools/eval_active.py:745-788.

Usage:
    python tools/eval_all_ckpt.py --ckpt_dir output/ --synthetic --scenes 4
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

from common import base_parser, setup


def main():
    p = base_parser("sweep checkpoints, pick best by summed 3D AP")
    p.add_argument("--ckpt_dir", type=str, required=True)
    p.add_argument("--scenes", type=int, default=8)
    p.add_argument("--points", type=int, default=None)
    args = p.parse_args()
    cfg, log = setup(args)

    ckpts = sorted(
        os.path.join(args.ckpt_dir, d) for d in os.listdir(args.ckpt_dir)
        if os.path.isdir(os.path.join(args.ckpt_dir, d)) and "ckpt" in d)
    if not ckpts:
        log.error("no checkpoints under %s", args.ckpt_dir)
        return

    results = []
    here = os.path.dirname(os.path.abspath(__file__))
    for ckpt in ckpts:
        out_dir = os.path.join(args.output_dir, os.path.basename(ckpt))
        cmd = [sys.executable, os.path.join(here, "eval_auto.py"),
               "--ckpt", ckpt, "--scenes", str(args.scenes),
               "--output_dir", out_dir]
        if args.synthetic:
            cmd.append("--synthetic")
        if args.data_root:
            cmd += ["--data_root", args.data_root]
        if args.points:
            cmd += ["--points", str(args.points)]
        if args.cpu:
            cmd.append("--cpu")
        log.info("evaluating %s", ckpt)
        proc = subprocess.run(cmd, capture_output=True, text=True)
        score = None
        for line in (proc.stdout + proc.stderr).splitlines():
            if "Car 3D AP e/m/h:" in line:
                parts = line.split("Car 3D AP e/m/h:")[1].split("/")
                score = sum(float(x) for x in parts)
        results.append({"ckpt": ckpt, "sum_3d_ap": score})
        log.info("  -> sum 3D AP: %s", score)

    scored = [r for r in results if r["sum_3d_ap"] is not None]
    best = max(scored, key=lambda r: r["sum_3d_ap"]) if scored else None
    summary = {"results": results, "best": best}
    path = os.path.join(args.output_dir, "ckpt_sweep.json")
    with open(path, "w") as f:
        json.dump(summary, f, indent=2)
    log.info("best: %s", best)
    log.info("summary -> %s", path)


if __name__ == "__main__":
    main()
