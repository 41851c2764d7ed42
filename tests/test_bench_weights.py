"""The fitted-weights npz pipeline: tools/fit_bench_weights.flatten must
roundtrip through bench._load_fitted's overlay exactly (the driver's
benchmark loads this file; a silent leaf mismatch would bench random
weights while reporting weights=fitted)."""
import sys

import numpy as np
import jax

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")


def test_flatten_overlay_roundtrip(tmp_path, monkeypatch):
    import bench
    from fit_bench_weights import flatten

    from ws3d_tpu.config import load_config
    from ws3d_tpu.models import build_model, init_model

    cfg = load_config()
    cfg.RPN.NUM_POINTS = 256
    cfg.RPN.SA_CONFIG.NPOINTS = [64, 32, 16, 8]
    cfg.RCNN.ENABLED = True
    cfg.IOUN.ENABLED = True
    cfg.RCNN.SA_CONFIG.NPOINTS = [32, 16, 8, -1]
    cfg.IOUN.SA_CONFIG.NPOINTS = [32, 16, 8, -1]
    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(0))

    # perturb every leaf so the overlay is distinguishable from init
    fitted = jax.tree_util.tree_map(lambda x: np.asarray(x) + 1.0, variables)
    leaves = dict(flatten(fitted))
    npz = tmp_path / "w.npz"
    np.savez_compressed(npz, **{k: (v if "batch_stats" in k
                                    or v.dtype.kind in "iub"
                                    else v.astype(np.float16))
                                for k, v in leaves.items()})

    monkeypatch.setattr(bench, "WEIGHTS", str(npz))
    restored, overlaid, total = bench._load_fitted(variables)

    flat_init = jax.tree_util.tree_leaves(variables)
    flat_rest = jax.tree_util.tree_leaves(restored)
    assert len(flat_init) == len(flat_rest)
    assert overlaid == total == len(flat_init)
    n_changed = sum(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(flat_init, flat_rest))
    # every leaf must have been overlaid (float16 rounding tolerated)
    assert n_changed == len(flat_init), (n_changed, len(flat_init))
    for a, b in zip(flat_init, flat_rest):
        np.testing.assert_allclose(np.asarray(a) + 1.0, np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_partial_overlay_fails(tmp_path, monkeypatch):
    """A npz missing even one leaf must raise, not silently bench
    part-random weights (round-2 advisor finding)."""
    import pytest

    import bench
    from fit_bench_weights import flatten

    from ws3d_tpu.config import load_config
    from ws3d_tpu.models import build_model, init_model

    cfg = load_config()
    cfg.RPN.NUM_POINTS = 256
    cfg.RPN.SA_CONFIG.NPOINTS = [64, 32, 16, 8]
    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(0))

    leaves = dict(flatten(jax.tree_util.tree_map(np.asarray, variables)))
    dropped = sorted(leaves)[0]
    del leaves[dropped]
    npz = tmp_path / "w.npz"
    np.savez_compressed(npz, **leaves)

    monkeypatch.setattr(bench, "WEIGHTS", str(npz))
    with pytest.raises(RuntimeError, match="overlay incomplete"):
        bench._load_fitted(variables)
