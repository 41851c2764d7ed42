"""Produce ws3d_tpu/data/bench_weights.npz for the honest benchmark.

Runs the full synthetic weak-label flow (train_rpn -> generate_box_dataset
-> train_cascade rcnn -> train_cascade ioun), stacks the stage checkpoints,
and flattens the resulting variables into one float16 npz keyed by
'params/...'-style paths. bench.py overlays these onto the init tree so the
measured loop produces real detections (VERDICT round 1: bench measured an
untrained model with 0 detections).

Usage (on the TPU; ~15-30 min with the default step counts):
    python tools/fit_bench_weights.py
    python tools/fit_bench_weights.py --rpn_steps 300 --rcnn_steps 500 \
        --ioun_steps 300 --scenes 16   # quick smoke

Pass --from_ckpts RPN_CKPT IOUN_CKPT to skip training and just convert.
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "ws3d_tpu", "data", "bench_weights.npz")


def flatten(tree, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from flatten(v, path + (str(k),))
    else:
        yield "/".join(path), np.asarray(tree)


def convert(rpn_ckpt: str, ioun_ckpt: str, out: str = OUT):
    from ws3d_tpu.config import load_config
    from ws3d_tpu.models import build_model, init_model
    from ws3d_tpu.training.checkpoint import load_part_checkpoint
    import jax

    cfg = load_config()
    cfg.RCNN.ENABLED = True
    cfg.IOUN.ENABLED = True
    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(0))
    variables = load_part_checkpoint(variables, ioun_ckpt,
                                     subtrees=("rpn", "rcnn"))
    variables = load_part_checkpoint(variables, rpn_ckpt, subtrees=("rpn",))
    os.makedirs(os.path.dirname(out), exist_ok=True)
    leaves = dict(flatten(jax.tree_util.tree_map(np.asarray, variables)))
    # float16 halves the file; bench casts back to the init dtype. Keep BN
    # running stats f32 (means/vars span decades).
    packed = {k: (v if "batch_stats" in k or v.dtype.kind in "iub"
                  else v.astype(np.float16))
              for k, v in leaves.items()}
    np.savez_compressed(out, **packed)
    size = os.path.getsize(out) / 1e6
    print(f"wrote {out}: {len(packed)} arrays, {size:.1f} MB")


def run(cmd):
    print("+", " ".join(cmd), flush=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    subprocess.run(cmd, check=True, cwd=REPO, env=env)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rpn_steps", type=int, default=3000)
    p.add_argument("--rcnn_steps", type=int, default=20000)
    p.add_argument("--ioun_steps", type=int, default=8000)
    p.add_argument("--scenes", type=int, default=96)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--workdir", type=str, default="/tmp/ws3d_fit")
    p.add_argument("--from_ckpts", nargs=2, default=None,
                   metavar=("RPN_CKPT", "IOUN_CKPT"))
    args = p.parse_args()

    if args.from_ckpts:
        convert(args.from_ckpts[0], args.from_ckpts[1])
        return

    wd = args.workdir
    py = sys.executable
    t = os.path.join(REPO, "tools")
    run([py, os.path.join(t, "train_rpn.py"), "--synthetic",
         "--steps", str(args.rpn_steps), "--batch", str(args.batch),
         "--scenes", str(args.scenes), "--output_dir", wd])
    run([py, os.path.join(t, "generate_box_dataset.py"), "--synthetic",
         "--ckpt", os.path.join(wd, "rpn_ckpt"),
         "--scenes", str(args.scenes), "--output_dir", wd,
         "--out", os.path.join(wd, "train_boxes.pkl")])
    run([py, os.path.join(t, "train_cascade.py"), "--stage", "rcnn",
         "--synthetic", "--steps", str(args.rcnn_steps),
         "--db", os.path.join(wd, "train_boxes.pkl"), "--output_dir", wd])
    run([py, os.path.join(t, "train_cascade.py"), "--stage", "ioun",
         "--synthetic", "--steps", str(args.ioun_steps),
         "--db", os.path.join(wd, "train_boxes.pkl"),
         "--ckpt", os.path.join(wd, "rcnn_ckpt"), "--output_dir", wd])
    convert(os.path.join(wd, "rpn_ckpt"), os.path.join(wd, "ioun_ckpt"))


if __name__ == "__main__":
    main()
