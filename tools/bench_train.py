"""Training-path throughput benchmark (TPU).

The reference's dominant compute is its training runs — 8k-iteration RPN
training (/root/reference/tools/train_rpn.py:133-228) and 40k/10k-iteration
RCNN/IOUN cascade training (train_cascade1.py, train_cascade_later.py) — so
"matching-or-beating perf" includes steps/sec of the train loop, not just
inference scenes/sec (bench.py). The reference publishes no training
throughput (BASELINE.md), so these are our own journal numbers.

Measurement protocol (CLAUDE.md): the tunneled TPU dispatches asynchronously
and one-off calls carry a ~3.5 ms host RTT floor, so each stage runs its
train step n times inside ONE jit (lax.fori_loop threading the TrainState),
transfers a single scalar, and reports (t_n - t_1) / (n - 1). The input
pipeline is benchmarked separately on the host (batches/sec) so the JSON
shows the device/host split explicitly.

Shapes default to the reference's training shapes:
  rpn   batch 25 scenes x 16384 pts   (train_rpn.py args.batch_size)
  rcnn  batch 800 crops x 512 pts     (train_cascade1.py:154)
  ioun  batch 800 crops x 512 pts     (train_cascade_later.py)

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_train.py \
        [--stages rpn,rcnn,ioun] [--reps 8]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _loop_jit(step, n):
    import jax
    import jax.numpy as jnp

    def run(state, batch, rng):
        def body(i, carry):
            st, _ = carry
            st, aux = step(st, batch, jax.random.fold_in(rng, i), 0.1)
            return (st, aux["loss"].astype(jnp.float32))
        _, loss = jax.lax.fori_loop(0, n, body, (state, jnp.float32(0)))
        return loss
    return jax.jit(run)


def _float_key(batch):
    """The loop carry must perturb the NETWORK INPUT, not just any float
    leaf: perturbing a label (e.g. stage-2 `cls`) leaves the whole network
    forward loop-invariant and XLA hoists it out of the fori_loop — the
    split then reads fwd_ms ~0 (measured). It must also be a FLOAT leaf:
    `.astype` rounds the 1e-30 nudge on an int array to 0."""
    import jax.numpy as jnp

    for k in ("pts_input", "cur_box_point"):
        if k in batch:
            return k
    return next(k for k, v in sorted(batch.items())
                if jnp.issubdtype(jnp.asarray(v).dtype, jnp.floating))


def _fwd_loop_jit(loss_fn, n):
    """Forward-only loop: same loss computation without value_and_grad.
    The fori carry threads the loss back through a batch perturbation so
    XLA cannot hoist the body out of the loop."""
    import jax
    import jax.numpy as jnp

    def run(state, batch, rng):
        key = _float_key(batch)

        def body(i, carry):
            prev = carry
            b = dict(batch)
            b[key] = b[key] + (prev * 1e-30).astype(b[key].dtype)
            loss, _ = loss_fn(state.params, state.batch_stats, b,
                              jax.random.fold_in(rng, i), 0.1)
            return loss.astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))
    return jax.jit(run)


def _grad_loop_jit(loss_fn, n):
    """value_and_grad loop WITHOUT the optimizer update: fwd+bwd cost."""
    import jax
    import jax.numpy as jnp

    vg = jax.value_and_grad(loss_fn, has_aux=True)

    def run(state, batch, rng):
        key = _float_key(batch)

        def body(i, carry):
            prev = carry
            b = dict(batch)
            b[key] = b[key] + (prev * 1e-30).astype(b[key].dtype)
            (loss, _), grads = vg(state.params, state.batch_stats, b,
                                  jax.random.fold_in(rng, i), 0.1)
            gsum = sum(jnp.sum(jnp.abs(g)).astype(jnp.float32)
                       for g in jax.tree_util.tree_leaves(grads))
            return loss.astype(jnp.float32) + gsum * 1e-30
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))
    return jax.jit(run)


def _timed(fn, state, batch, rng) -> float:
    t0 = time.perf_counter()
    out = np.asarray(fn(state, batch, rng))
    dt = time.perf_counter() - t0
    assert np.isfinite(out), f"non-finite loss {out}"
    return dt


def _measure(step, state, batch, rng, reps: int, make_loop=_loop_jit):
    """Amortized seconds/step: n-step jit minus 1-step jit."""
    f1 = make_loop(step, 1)
    fn = make_loop(step, reps)
    _timed(f1, state, batch, rng)          # compile n=1
    _timed(fn, state, batch, rng)          # compile n=reps
    t1 = min(_timed(f1, state, batch, rng) for _ in range(3))
    tn = min(_timed(fn, state, batch, rng) for _ in range(2))
    return (tn - t1) / (reps - 1)


def _split(res, loss_fn, state, batch, rng, reps, sec_full):
    """Add the forward / fwd+bwd / optimizer device-time split."""
    fwd = _measure(loss_fn, state, batch, rng, reps, make_loop=_fwd_loop_jit)
    vg = _measure(loss_fn, state, batch, rng, reps, make_loop=_grad_loop_jit)
    res["fwd_ms"] = round(fwd * 1e3, 2)
    res["bwd_ms"] = round((vg - fwd) * 1e3, 2)
    res["optimizer_ms"] = round((sec_full - vg) * 1e3, 2)
    return res


def bench_rpn(args):
    import jax
    from ws3d_tpu.config import load_config
    from ws3d_tpu.datasets import SyntheticKitti, RPNDataset
    from ws3d_tpu.models import build_model, init_model
    from ws3d_tpu.training import create_train_state
    from ws3d_tpu.training.trainer import (make_rpn_train_step,
                                           make_rpn_loss_fn)

    cfg = load_config(None)
    src = SyntheticKitti(num_scenes=max(args.rpn_batch, 8),
                         points_per_scene=18000, seed=0)
    ds = RPNDataset(src, cfg, mode="TRAIN", seed=0)
    t0 = time.perf_counter()
    batch = next(ds.batches(args.rpn_batch))
    host_s_per_batch = time.perf_counter() - t0

    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(0))
    state = create_train_state(model, cfg, variables, total_steps=1000,
                               stage="rpn")
    step = make_rpn_train_step(model, cfg)
    batch = jax.device_put(batch)
    rng = jax.random.PRNGKey(1)
    sec = _measure(step, state, batch, rng, args.reps)
    res = {"stage": "rpn", "batch": args.rpn_batch,
           "points": int(cfg.RPN.NUM_POINTS),
           "device_ms_per_step": round(sec * 1e3, 2),
           "steps_per_sec": round(1.0 / sec, 2),
           "scenes_per_sec_train": round(args.rpn_batch / sec, 1),
           "host_ms_per_batch": round(host_s_per_batch * 1e3, 1)}
    if args.split:
        res = _split(res, make_rpn_loss_fn(model, cfg), state, batch, rng,
                     args.reps, sec)
    return res


def bench_stage2(args, stage: str):
    import jax
    from ws3d_tpu.config import load_config
    from ws3d_tpu.datasets.boxplace_dataset import (
        BoxPlaceDataset, synthetic_proposal_database)
    from ws3d_tpu.models import build_model, init_model
    from ws3d_tpu.training import create_train_state
    from ws3d_tpu.training.trainer import (make_rcnn_train_step,
                                           make_rcnn_loss_fn)

    cfg = load_config(None)
    cfg.RPN.ENABLED = False
    cfg.RCNN.ENABLED = True
    cfg.IOUN.ENABLED = stage == "ioun"
    cfg.RCNN.NUM_POINTS = args.stage2_points
    db = synthetic_proposal_database(num=max(64, args.stage2_batch // 4),
                                     seed=0, crop_points=args.stage2_points)
    ds = BoxPlaceDataset(db, cfg, mode="TRAIN", npoints=args.stage2_points,
                         seed=0)
    t0 = time.perf_counter()
    batch = next(ds.batches(args.stage2_batch))
    host_s_per_batch = time.perf_counter() - t0

    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(0))
    state = create_train_state(model, cfg, variables, total_steps=1000,
                               stage=stage)
    step = make_rcnn_train_step(model, cfg, stage=stage)
    batch = jax.device_put(batch)
    rng = jax.random.PRNGKey(1)
    sec = _measure(step, state, batch, rng, args.reps)
    res = {"stage": stage, "batch": args.stage2_batch,
           "points": args.stage2_points,
           "device_ms_per_step": round(sec * 1e3, 2),
           "steps_per_sec": round(1.0 / sec, 2),
           "crops_per_sec_train": round(args.stage2_batch / sec, 1),
           "host_ms_per_batch": round(host_s_per_batch * 1e3, 1)}
    if args.split:
        res = _split(res, make_rcnn_loss_fn(model, cfg, stage=stage), state,
                     batch, rng, args.reps, sec)
    return res


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--stages", default="rpn,rcnn,ioun")
    def _reps(v):
        # _measure amortizes as (t_n - t_1)/(reps - 1): reps==1 divides by 0
        n = int(v)
        if n < 2:
            raise argparse.ArgumentTypeError("--reps must be >= 2")
        return n
    p.add_argument("--reps", type=_reps, default=8)
    p.add_argument("--rpn_batch", type=int, default=25)
    p.add_argument("--stage2_batch", type=int, default=800)
    p.add_argument("--stage2_points", type=int, default=512)
    p.add_argument("--split", action="store_true",
                   help="also measure forward-only and fwd+bwd loops for a "
                        "device-time split (fwd_ms/bwd_ms/optimizer_ms)")
    args = p.parse_args()

    stages = args.stages.split(",")
    if len(stages) > 1:
        # one subprocess per stage: the stages' jit caches + live buffers
        # otherwise accumulate in HBM and the third stage's compile OOMs
        # (measured: rpn,rcnn,ioun --split died allocating an HLO temp)
        import os
        import subprocess
        import sys
        for stage in stages:
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--stages", stage, "--reps", str(args.reps),
                   "--rpn_batch", str(args.rpn_batch),
                   "--stage2_batch", str(args.stage2_batch),
                   "--stage2_points", str(args.stage2_points)]
            if args.split:
                cmd.append("--split")
            subprocess.run(cmd, check=True)
        return

    stage = stages[0]
    res = bench_rpn(args) if stage == "rpn" else bench_stage2(args, stage)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
