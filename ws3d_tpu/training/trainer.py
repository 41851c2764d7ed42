"""Train states, jitted train steps, and the epoch-loop Trainer.

TPU-native equivalent of tools/train_utils/train_utils.py:138-612 and the
loss glue in lib/net/train_functions.py:24-159: a functional TrainState
(params + batch_stats + optax state) instead of in-place module mutation;
the zero-grad/backward/clip/step sequence becomes one jitted value_and_grad
step; data-parallel via sharded batches (ws3d_tpu.parallel).
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ws3d_tpu import losses
from ws3d_tpu.training.optim import (build_optimizer, bn_momentum_schedule)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)


def _ioun_trainable_mask(params) -> Any:
    """False for the frozen RCNN trunk when training the IOUN cascade
    (rcnn_net.py:126-128: all pre-cascade params requires_grad=False)."""
    cascade_prefixes = ("can_xyz_up_", "can_feature_up_", "can_merge_down_",
                        "sa_score_", "iou_head_", "icl_head_", "ref_head_")

    def mark(tree, trainable):
        return jax.tree.map(lambda _: trainable, tree)

    out = {}
    for top, sub in params.items():          # e.g. {"rcnn": {...}}
        if top != "rcnn":
            out[top] = mark(sub, False)
            continue
        out[top] = {k: mark(v, k.startswith(cascade_prefixes))
                    for k, v in sub.items()}
    return out


def create_train_state(model, cfg, variables, total_steps: int,
                       stage: str = "rpn") -> TrainState:
    params = variables["params"]
    mask = _ioun_trainable_mask(params) if stage == "ioun" else None
    tx = build_optimizer(cfg, total_steps, params, trainable_mask=mask)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=variables.get("batch_stats", {}),
                      opt_state=tx.init(params), tx=tx, apply_fn=model.apply)


# ---------------------------------------------------------------------------
# Jitted train steps
# ---------------------------------------------------------------------------

def _cross_device_mean(grads, new_bs, aux, axis_name):
    """All-reduce a step's products over the data axis (shard_map path).

    Mean-of-shard gradients/losses is the reference's own data-parallel
    semantics (nn.DataParallel averages replica losses,
    tools/train_rpn.py:175-176); BN stats become the mean of per-replica
    stats (DataParallel does not sync BN at all)."""
    pm = lambda t: jax.tree.map(lambda x: jax.lax.pmean(x, axis_name), t)
    return pm(grads), pm(new_bs), pm(aux)


def make_rpn_loss_fn(model, cfg):
    """loss_fn(params, batch_stats, batch, rng, bn_momentum) ->
    (total, (aux, new_batch_stats)) for the stage-1 step — exposed
    separately so tools/bench_train.py can time forward vs backward."""
    loc_scope = cfg.RPN.LOC_SCOPE
    loc_bin_size = cfg.RPN.LOC_BIN_SIZE
    alpha = cfg.RPN.FOCAL_ALPHA[0]
    gamma = cfg.RPN.FOCAL_GAMMA
    weights = tuple(cfg.RPN.LOSS_WEIGHT)

    def loss_fn(params, batch_stats, batch, rng, bn_momentum):
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            {"pts_input": batch["pts_input"]}, train=True,
            bn_momentum=bn_momentum, rngs={"dropout": rng},
            mutable=["batch_stats"], method=model.rpn_forward)
        total, aux = losses.rpn_loss(
            out["rpn_cls"], out["rpn_reg"], batch["rpn_cls_label"],
            batch["rpn_reg_label"], loc_scope, loc_bin_size,
            focal_alpha=alpha, focal_gamma=gamma, loss_weights=weights)
        return total, (aux, mut["batch_stats"])

    return loss_fn


def make_rpn_train_step(model, cfg, axis_name: Optional[str] = None):
    """Stage-1 step: focal cls on Gaussian soft labels + bin reg
    (train_functions.get_rpn_loss:163-228).

    With axis_name set, the step is built for shard_map over a data mesh:
    each device differentiates its batch shard locally (Pallas forwards stay
    per-device — Mosaic custom calls are not SPMD-partitionable) and
    gradients/BN stats/aux are pmean'd over the axis, so every replica
    applies the identical update."""
    loss_fn = make_rpn_loss_fn(model, cfg)

    def step(state: TrainState, batch, rng, bn_momentum=0.1):
        if axis_name is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        (loss, (aux, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch,
                                   rng, bn_momentum)
        aux["loss"] = loss
        if axis_name is not None:
            grads, new_bs, aux = _cross_device_mean(grads, new_bs, aux,
                                                    axis_name)
        state = state.apply_gradients(grads).replace(batch_stats=new_bs)
        return state, aux

    return step


def make_rcnn_loss_fn(model, cfg, stage: str = "rcnn"):
    """loss_fn for the stage-2 step (see make_rpn_loss_fn)."""
    anchor = jnp.asarray(cfg.CLS_MEAN_SIZE[0], jnp.float32)
    loc_scope = cfg.RCNN.LOC_SCOPE
    loc_bin_size = cfg.RCNN.LOC_BIN_SIZE
    num_head_bin = cfg.RCNN.NUM_HEAD_BIN
    xz_fine = cfg.RCNN.LOC_XZ_FINE
    is_ioun = stage == "ioun"

    def loss_fn(params, batch_stats, batch, rng, bn_momentum):
        model_in = {"cur_box_point": batch["cur_box_point"],
                    "cur_box_reflect": batch["cur_box_reflect"],
                    "train_mask": batch["train_mask"]}
        for k in ("iou_trans", "iou_scale", "iou_ry"):
            if k in batch:
                model_in[k] = batch[k]
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats}, model_in,
            train=True, bn_momentum=bn_momentum, rngs={"dropout": rng},
            mutable=["batch_stats"], method=model.rcnn_forward)
        gt = batch["gt_boxes"].reshape(-1, 7)
        cls_label = batch["cls"].reshape(-1)
        if is_ioun:
            total, aux = losses.ioun_loss(
                out["rcnn_iou"], out["rcnn_ref"],
                out["pred_boxes3d"].reshape(-1, 7),
                out["refined_box"].reshape(-1, 7), gt, cls_label)
        else:
            total, aux = losses.rcnn_loss(
                out["rcnn_cls"], out["rcnn_reg"],
                out["pred_boxes3d"].reshape(-1, 7), gt, cls_label, anchor,
                loc_scope=loc_scope, loc_bin_size=loc_bin_size,
                num_head_bin=num_head_bin, get_xz_fine=xz_fine)
        return total, (aux, mut["batch_stats"])

    return loss_fn


def make_rcnn_train_step(model, cfg, stage: str = "rcnn",
                         axis_name: Optional[str] = None):
    """Stage-2 step: RCNN (cls+reg+corner) or IOUN (iou+refine) loss
    (train_functions.py:230-516)."""
    loss_fn = make_rcnn_loss_fn(model, cfg, stage=stage)

    def step(state: TrainState, batch, rng, bn_momentum=0.1):
        if axis_name is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        (loss, (aux, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch,
                                   rng, bn_momentum)
        aux["loss"] = loss
        if axis_name is not None:
            grads, new_bs, aux = _cross_device_mean(grads, new_bs, aux,
                                                    axis_name)
        state = state.apply_gradients(grads).replace(batch_stats=new_bs)
        return state, aux

    return step


# ---------------------------------------------------------------------------
# Epoch-loop Trainer
# ---------------------------------------------------------------------------

class Trainer:
    """Minimal epoch/step driver (train_utils.Trainer:517-612 equivalent):
    OneCycle handled inside optax; BN-momentum schedule per epoch;
    prob_mask_ratio schedule for stage-2 (train_utils.py:546-548)."""

    def __init__(self, model, cfg, state: TrainState, stage: str = "rpn",
                 seed: int = 0, mesh=None, log_fn=print, tb_dir=None):
        self.model = model
        self.cfg = cfg
        self.state = state
        self.stage = stage
        self.rng = jax.random.PRNGKey(seed)
        self.log_fn = log_fn
        self.writer = None
        if tb_dir:
            from ws3d_tpu.utils.tb import ScalarWriter
            self.writer = ScalarWriter(tb_dir)
        self.bn_sched = bn_momentum_schedule(cfg)
        axis = mesh.axis_names[0] if mesh is not None else None
        step_fn = (
            make_rpn_train_step(model, cfg, axis_name=axis)
            if stage == "rpn"
            else make_rcnn_train_step(model, cfg, stage=stage,
                                      axis_name=axis))
        if mesh is not None:
            from ws3d_tpu.parallel import data_parallel_step
            self._mesh = mesh
            self.step_fn = data_parallel_step(step_fn, mesh, axis=axis)
        else:
            self._mesh = None
            self.step_fn = jax.jit(step_fn)

    def recalibrate_bn(self, batch_iter, n_batches: int = 20,
                       momentum: float = 0.2):
        """Re-estimate BatchNorm running statistics at the FINAL weights.

        Short runs leave running averages far from the statistics the final
        weights produce (the reference sidesteps this with 8k-40k-iteration
        schedules + BN-momentum decay); a recalibration sweep is the
        standard fix and is cheap (forward-only)."""
        if self.stage == "rpn":
            def fwd(bs, batch, rng):
                _, mut = self.model.apply(
                    {"params": self.state.params, "batch_stats": bs},
                    {"pts_input": batch["pts_input"]}, train=True,
                    bn_momentum=jnp.float32(momentum),
                    rngs={"dropout": rng}, mutable=["batch_stats"],
                    method=self.model.rpn_forward)
                return mut["batch_stats"]
        else:
            def fwd(bs, batch, rng):
                model_in = {"cur_box_point": batch["cur_box_point"],
                            "cur_box_reflect": batch["cur_box_reflect"],
                            "train_mask": batch["train_mask"]}
                for k in ("iou_trans", "iou_scale", "iou_ry"):
                    if k in batch:
                        model_in[k] = batch[k]
                _, mut = self.model.apply(
                    {"params": self.state.params, "batch_stats": bs},
                    model_in, train=True, bn_momentum=jnp.float32(momentum),
                    rngs={"dropout": rng}, mutable=["batch_stats"],
                    method=self.model.rcnn_forward)
                return mut["batch_stats"]

        fwd = jax.jit(fwd)
        bs = self.state.batch_stats
        for i, batch in enumerate(batch_iter):
            if i >= n_batches:
                break
            self.rng, sub = jax.random.split(self.rng)
            bs = fwd(bs, batch, sub)
        self.state = self.state.replace(batch_stats=bs)
        self.log_fn(f"recalibrated BN stats over {min(i + 1, n_batches)} batches")

    def prob_mask_ratio(self, epoch: int, total_epochs: int) -> float:
        return min(0.5 + 0.5 * (epoch + total_epochs / 3.0) / total_epochs, 1.0)

    def train_steps(self, batch_iter, total_steps: int,
                    log_every: int = 10, epoch_size: Optional[int] = None,
                    prefetch_size: int = 2, ckpt_every: Optional[int] = None,
                    ckpt_dir: Optional[str] = None,
                    val_fn=None, val_every: Optional[int] = None):
        """Step loop. When `val_fn(state) -> metric dict` is given (see
        ws3d_tpu.training.validation.make_val_fn), it runs every `val_every`
        steps (default ~total/20, the reference's eval cadence,
        train_utils.py:523) and at the final step; each eval saves a
        `{stage}_ckpt_e{k}` checkpoint under ckpt_dir and the best `score`
        additionally updates `{stage}_ckpt_best` — the per-eval list is what
        tools/eval_all_ckpt.py sweeps."""
        from ws3d_tpu.utils.prefetch import prefetch
        if prefetch_size:
            batch_iter = prefetch(batch_iter, size=prefetch_size)
        if val_fn is not None and not val_every:
            val_every = max(total_steps // 20, 1)
        history = []
        self.best_val = None
        n_eval = 0
        for i, batch in enumerate(batch_iter):
            if i >= total_steps:
                break
            epoch = i // epoch_size if epoch_size else 0
            bn_m = self.bn_sched(epoch)
            self.rng, sub = jax.random.split(self.rng)
            if self._mesh is not None:
                from ws3d_tpu.parallel import shard_batch
                batch = shard_batch(batch, self._mesh)
            self.state, aux = self.step_fn(self.state, batch, sub,
                                           jnp.asarray(bn_m, jnp.float32))
            if i % log_every == 0:
                vals = {k: float(v) for k, v in aux.items()
                        if jnp.ndim(v) == 0}
                self.log_fn(f"step {i}: " + " ".join(
                    f"{k}={v:.4f}" for k, v in sorted(vals.items())))
                if self.writer is not None:
                    self.writer.write(i, vals)
                history.append(vals)
            last = i == total_steps - 1
            if val_fn is not None and ((i + 1) % val_every == 0 or last):
                n_eval += 1
                self._run_validation(val_fn, i, n_eval, ckpt_dir)
            if (ckpt_every and ckpt_dir and i > 0 and i % ckpt_every == 0):
                from ws3d_tpu.training.checkpoint import save_train_state
                import os
                save_train_state(os.path.join(ckpt_dir,
                                              f"resume_step_{i}"), self.state)
                self.log_fn(f"saved resume checkpoint at step {i}")
        if self.writer is not None:
            self.writer.close()
            self.writer = None
        return history

    def _run_validation(self, val_fn, step: int, n_eval: int,
                        ckpt_dir: Optional[str]):
        metrics = val_fn(self.state)
        self.log_fn(f"val @ step {step}: " + " ".join(
            f"{k}={v:.4f}" for k, v in sorted(metrics.items())))
        if self.writer is not None:
            self.writer.write(step, {f"val/{k}": v
                                     for k, v in metrics.items()})
        if ckpt_dir:
            import os
            from ws3d_tpu.training.checkpoint import save_checkpoint
            save_checkpoint(os.path.join(
                ckpt_dir, f"{self.stage}_ckpt_e{n_eval}"), self.state)
            score = metrics.get("score")
            if score is not None and (self.best_val is None
                                      or score > self.best_val["score"]):
                self.best_val = {"step": step, **metrics}
                save_checkpoint(os.path.join(
                    ckpt_dir, f"{self.stage}_ckpt_best"), self.state)
                self.log_fn(f"new best val score {score:.4f} @ step {step}")
        return metrics
