"""Shared CLI plumbing for the tools/ drivers."""
from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def base_parser(desc: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("--cfg_file", type=str, default=None,
                   help="optional YAML config overriding the defaults")
    p.add_argument("--set", dest="set_cfgs", nargs="*", default=None,
                   help="key=value config overrides")
    p.add_argument("--data_root", type=str, default=None,
                   help="KITTI root dir (object/, ImageSets/)")
    p.add_argument("--synthetic", action="store_true",
                   help="run on the synthetic scene generator (no KITTI)")
    p.add_argument("--output_dir", type=str, default="output")
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true",
                   help="force the host CPU jax backend")
    return p


def setup(args):
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from ws3d_tpu.config import load_config
    cfg = load_config(args.cfg_file, args.set_cfgs)
    os.makedirs(args.output_dir, exist_ok=True)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)5s %(message)s",
        handlers=[logging.StreamHandler(),
                  logging.FileHandler(os.path.join(args.output_dir,
                                                   "log.txt"))])
    return cfg, logging.getLogger("ws3d_tpu")


def make_scene_source(args, num_scenes: int = 64, points: int = 18000):
    if args.synthetic or not args.data_root:
        from ws3d_tpu.datasets import SyntheticKitti
        return SyntheticKitti(num_scenes=num_scenes,
                              points_per_scene=points, seed=args.seed)
    from ws3d_tpu.datasets import KittiRaw
    return KittiRaw(args.data_root, split=getattr(args, "split", "train"))
