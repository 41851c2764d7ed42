"""Tests: optimizer schedules, train steps actually learn, checkpoint
roundtrip, IOUN freezing, data-parallel step on the 8-device CPU mesh."""
import os

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from ws3d_tpu.config import load_config
from ws3d_tpu.datasets import SyntheticKitti, RPNDataset
from ws3d_tpu.datasets.boxplace_dataset import (BoxPlaceDataset,
                                                synthetic_proposal_database)
from ws3d_tpu.models import build_model, init_model
from ws3d_tpu.training import (onecycle_schedule, onecycle_momentum,
                               create_train_state, Trainer,
                               save_checkpoint, load_checkpoint,
                               load_part_checkpoint)
from ws3d_tpu.training.trainer import (make_rpn_train_step,
                                       make_rcnn_train_step)


def test_onecycle_shapes():
    lr = onecycle_schedule(100, 0.002, div_factor=10.0, pct_start=0.4)
    assert abs(float(lr(0)) - 0.0002) < 1e-8
    assert abs(float(lr(40)) - 0.002) < 1e-5
    assert float(lr(100)) < 1e-5
    mom = onecycle_momentum(100)
    assert abs(float(mom(0)) - 0.95) < 1e-6
    assert abs(float(mom(40)) - 0.85) < 1e-3
    assert abs(float(mom(100)) - 0.95) < 1e-6


def _tiny_rpn_cfg():
    cfg = load_config()
    cfg.RPN.NUM_POINTS = 256
    cfg.RPN.SA_CONFIG.NPOINTS = [64, 32, 16, 8]
    cfg.TRAIN.BATCH_SIZE = 2
    return cfg


def test_rpn_train_step_decreases_loss():
    cfg = _tiny_rpn_cfg()
    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(0))
    state = create_train_state(model, cfg, variables, total_steps=30,
                               stage="rpn")
    src = SyntheticKitti(num_scenes=4, points_per_scene=2000, seed=0)
    ds = RPNDataset(src, cfg, mode="TRAIN", npoints=256)
    step = jax.jit(make_rpn_train_step(model, cfg))
    rng = jax.random.PRNGKey(1)
    first = last = None
    for i, batch in enumerate(ds.batches(batch_size=2, steps=25)):
        rng, sub = jax.random.split(rng)
        state, aux = step(state, batch, sub, jnp.float32(0.1))
        if first is None:
            first = float(aux["loss"])
        last = float(aux["loss"])
    assert np.isfinite(last)
    assert last < first, f"loss did not decrease: {first} -> {last}"


def _tiny_rcnn_cfg(ioun=False):
    cfg = load_config()
    cfg.RPN.ENABLED = False
    cfg.RCNN.ENABLED = not ioun
    cfg.IOUN.ENABLED = ioun
    cfg.RCNN.NUM_POINTS = 128
    cfg.RCNN.SA_CONFIG.NPOINTS = [32, 16, 8, -1]
    cfg.IOUN.SA_CONFIG.NPOINTS = [32, 16, 8, -1]
    return cfg


def test_rcnn_train_step_runs():
    cfg = _tiny_rcnn_cfg()
    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(0))
    state = create_train_state(model, cfg, variables, total_steps=10,
                               stage="rcnn")
    db = synthetic_proposal_database(num=8, seed=0, crop_points=128)
    ds = BoxPlaceDataset(db, cfg, mode="TRAIN", npoints=128)
    step = jax.jit(make_rcnn_train_step(model, cfg, stage="rcnn"))
    rng = jax.random.PRNGKey(2)
    batch = next(ds.batches(batch_size=4, steps=1))
    state2, aux = step(state, batch, rng, jnp.float32(0.1))
    assert np.isfinite(float(aux["loss"]))
    # params changed
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        state.params, state2.params)
    assert max(jax.tree.leaves(diff)) > 0


def test_ioun_stage_freezes_trunk():
    cfg = _tiny_rcnn_cfg(ioun=True)
    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(0))
    state = create_train_state(model, cfg, variables, total_steps=10,
                               stage="ioun")
    db = synthetic_proposal_database(num=8, seed=1, crop_points=128)
    ds = BoxPlaceDataset(db, cfg, mode="TRAIN", npoints=128)
    step = jax.jit(make_rcnn_train_step(model, cfg, stage="ioun"))
    batch = next(ds.batches(batch_size=4, steps=1))
    state2, aux = step(state, batch, jax.random.PRNGKey(3), jnp.float32(0.1))
    assert np.isfinite(float(aux["loss"]))
    # trunk (sa_stack) unchanged, cascade heads updated
    trunk_diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                              state.params["rcnn"]["sa_stack"],
                              state2.params["rcnn"]["sa_stack"])
    assert max(jax.tree.leaves(trunk_diff)) == 0.0
    head_diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                             state.params["rcnn"]["iou_head_0"],
                             state2.params["rcnn"]["iou_head_0"])
    assert max(jax.tree.leaves(head_diff)) > 0.0


def test_checkpoint_roundtrip(tmp_path):
    cfg = _tiny_rpn_cfg()
    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(0))
    state = create_train_state(model, cfg, variables, total_steps=10)
    path = os.path.join(str(tmp_path), "ckpt")
    save_checkpoint(path, state)
    loaded = load_checkpoint(path)
    assert int(loaded["step"]) == 0
    got = jax.tree.leaves(loaded["params"])
    want = jax.tree.leaves(jax.tree.map(np.asarray, state.params))
    assert all(np.allclose(a, b) for a, b in zip(got, want))
    # partial load grafts the rpn subtree into fresh variables
    fresh = init_model(model, cfg, jax.random.PRNGKey(9))
    merged = load_part_checkpoint(fresh, path, subtrees=("rpn",))
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(merged["params"]["rpn"])[0]),
        np.asarray(jax.tree.leaves(loaded["params"]["rpn"])[0]))


def test_data_parallel_trainer_on_cpu_mesh():
    from ws3d_tpu.parallel import make_mesh
    cfg = _tiny_rpn_cfg()
    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(0))
    state = create_train_state(model, cfg, variables, total_steps=4)
    mesh = make_mesh()          # 8 virtual CPU devices from conftest
    assert mesh.devices.size == 8
    src = SyntheticKitti(num_scenes=8, points_per_scene=1500, seed=1)
    ds = RPNDataset(src, cfg, mode="TRAIN", npoints=256)
    tr = Trainer(model, cfg, state, stage="rpn", mesh=mesh,
                 log_fn=lambda *a: None)
    hist = tr.train_steps(ds.batches(batch_size=8, steps=2), total_steps=2,
                          log_every=1)
    assert len(hist) == 2
    assert np.isfinite(hist[-1]["loss"])


def test_full_resume_roundtrip(tmp_path):
    from ws3d_tpu.training import save_train_state, restore_train_state
    cfg = _tiny_rpn_cfg()
    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(0))
    state = create_train_state(model, cfg, variables, total_steps=10)
    src = SyntheticKitti(num_scenes=2, points_per_scene=1500, seed=3)
    ds = RPNDataset(src, cfg, mode="TRAIN", npoints=256)
    step = jax.jit(make_rpn_train_step(model, cfg))
    batch = next(ds.batches(batch_size=2, steps=1))
    state, _ = step(state, batch, jax.random.PRNGKey(1), jnp.float32(0.1))
    path = os.path.join(str(tmp_path), "resume")
    save_train_state(path, state)
    fresh = create_train_state(model, cfg, variables, total_steps=10)
    restored = restore_train_state(fresh, path)
    assert int(restored.step) == 1
    a = jax.tree.leaves(jax.tree.map(np.asarray, restored.opt_state))
    b = jax.tree.leaves(jax.tree.map(np.asarray, state.opt_state))
    assert all(np.allclose(x, y) for x, y in zip(a, b))
    # continues training without error
    restored2, aux = step(restored, batch, jax.random.PRNGKey(2),
                          jnp.float32(0.1))
    assert np.isfinite(float(aux["loss"]))


def test_in_training_validation_and_best_ckpt(tmp_path):
    """Trainer runs val_fn at the eval cadence, saves per-eval checkpoints
    and tracks the best score (reference: eval_epoch_* driving the saved
    checkpoint list, train_utils.py:150-515)."""
    from ws3d_tpu.training.validation import make_val_fn

    cfg = _tiny_rpn_cfg()
    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(0))
    state = create_train_state(model, cfg, variables, total_steps=8,
                               stage="rpn")
    src = SyntheticKitti(num_scenes=4, points_per_scene=2000, seed=0)
    ds = RPNDataset(src, cfg, mode="TRAIN", npoints=256)
    val_src = SyntheticKitti(num_scenes=2, points_per_scene=2000, seed=77)
    val_ds = RPNDataset(val_src, cfg, mode="EVAL", npoints=256)
    val_fn = make_val_fn(model, cfg, "rpn",
                         lambda: val_ds.batches(2, steps=1, shuffle=False))

    trainer = Trainer(model, cfg, state, stage="rpn", log_fn=lambda *a: None)
    trainer.train_steps(ds.batches(2), total_steps=8, epoch_size=2,
                        ckpt_dir=str(tmp_path), val_fn=val_fn, val_every=4)
    assert trainer.best_val is not None
    assert "gt_recall" in trainer.best_val
    evals = [d for d in os.listdir(tmp_path) if d.startswith("rpn_ckpt_e")]
    assert len(evals) == 2                       # steps 4 and 8
    assert os.path.isdir(tmp_path / "rpn_ckpt_best")


def test_rcnn_validator_metrics():
    from ws3d_tpu.training.validation import Validator

    cfg = _tiny_rcnn_cfg(ioun=True)
    cfg.RCNN.ENABLED = True
    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(0))
    state = create_train_state(model, cfg, variables, total_steps=4,
                               stage="ioun")
    db = synthetic_proposal_database(num=8, seed=2, crop_points=128)
    val_ds = BoxPlaceDataset(db, cfg, mode="EVAL", npoints=128)
    v = Validator(model, cfg, "ioun")
    m = v.run(state, val_ds.batches(4, steps=2, shuffle=False))
    for key in ("iou_mean", "recall_0.5", "refined_recall_0.7",
                "iou_pred_mae", "score"):
        assert key in m and np.isfinite(m[key]), (key, m)


@pytest.mark.slow
def test_data_parallel_step_exact_parity_on_identical_shards():
    """shard_map train-step plumbing is EXACT: with every device fed the
    identical shard (and dropout off), per-replica grads/BN stats are
    identical, so the pmean'd update must match the single-device step on
    that one shard (the nn.DataParallel-replacement claim,
    /root/reference/tools/train_rpn.py:175-176)."""
    from ws3d_tpu.parallel import make_mesh, shard_batch, data_parallel_step

    cfg = _tiny_rpn_cfg()
    cfg.RPN.DP_RATIO = 0.0
    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(0))
    state = create_train_state(model, cfg, variables, total_steps=4)
    mesh = make_mesh()
    n = mesh.devices.size

    src = SyntheticKitti(num_scenes=1, points_per_scene=1500, seed=2)
    ds = RPNDataset(src, cfg, mode="TRAIN", npoints=256)
    shard0 = next(ds.batches(batch_size=1, steps=1))
    tiled = {k: np.concatenate([np.asarray(v)] * n) for k, v in shard0.items()}

    rng, mom = jax.random.PRNGKey(1), jnp.float32(0.1)
    ref_state, ref_aux = jax.jit(make_rpn_train_step(model, cfg))(
        state, shard0, rng, mom)
    sharded = data_parallel_step(
        make_rpn_train_step(model, cfg, axis_name="data"), mesh,
        donate_state=False)
    new_state, aux = sharded(state, shard_batch(tiled, mesh), rng, mom)

    np.testing.assert_allclose(float(aux["loss"]), float(ref_aux["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(new_state.params),
                    jax.tree.leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    for a, b in zip(jax.tree.leaves(new_state.batch_stats),
                    jax.tree.leaves(ref_state.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
