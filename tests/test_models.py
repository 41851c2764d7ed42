"""Shape/jit tests for the model layer (RPN, RCNN+IOUN, facade)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ws3d_tpu.config import load_config
from ws3d_tpu.models import build_model, init_model


def tiny_rpn_cfg():
    cfg = load_config()
    cfg.RPN.NUM_POINTS = 128
    cfg.RPN.SA_CONFIG.NPOINTS = [32, 16, 8, 4]
    return cfg


def tiny_rcnn_cfg(ioun=False, cascade=1):
    cfg = load_config()
    cfg.RPN.ENABLED = False
    cfg.RCNN.ENABLED = True
    cfg.IOUN.ENABLED = ioun
    cfg.CASCADE = cascade
    cfg.RCNN.NUM_POINTS = 64
    cfg.RCNN.SA_CONFIG.NPOINTS = [32, 16, 8, -1]
    cfg.IOUN.SA_CONFIG.NPOINTS = [32, 16, 8, -1]
    return cfg


def test_rpn_forward_shapes(rng):
    cfg = tiny_rpn_cfg()
    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(0))
    batch = {"pts_input": jnp.asarray(rng.randn(2, 128, 4), jnp.float32)}
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch)
    assert out["rpn_cls"].shape == (2, 128, 1)
    assert out["rpn_reg"].shape == (2, 128, 40)
    assert out["backbone_xyz"].shape == (2, 128, 3)
    assert out["backbone_features"].shape == (2, 128, 128)
    assert np.all(np.isfinite(np.asarray(out["rpn_cls"])))


def test_rpn_cls_bias_prior():
    # focal-init: with zero input, sigmoid(cls logits) should be near 0.01
    cfg = tiny_rpn_cfg()
    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(0))
    bias = variables["params"]["rpn"]["cls_head"]["Dense_1"]["bias"]
    np.testing.assert_allclose(jax.nn.sigmoid(bias), 0.01, rtol=1e-5)


def test_rcnn_forward_shapes(rng):
    cfg = tiny_rcnn_cfg()
    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(1))
    batch = {
        "cur_box_point": jnp.asarray(rng.randn(3, 64, 3), jnp.float32),
        "cur_box_reflect": jnp.asarray(rng.rand(3, 64, 1), jnp.float32),
        "train_mask": jnp.ones((3, 64, 1), jnp.float32),
    }
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch)
    assert out["rcnn_cls"].shape == (3,)
    assert out["rcnn_reg"].shape == (3, 52)
    assert out["pred_boxes3d"].shape == (3, 7)
    # decoded sizes must be near the anchor for near-zero reg output
    hwl = np.asarray(out["pred_boxes3d"][:, 3:6])
    np.testing.assert_allclose(hwl, np.tile(cfg.CLS_MEAN_SIZE[0], (3, 1)),
                               atol=0.5)


@pytest.mark.parametrize("cascade", [1, 2])
def test_ioun_cascade(rng, cascade):
    cfg = tiny_rcnn_cfg(ioun=True, cascade=cascade)
    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(2))
    batch = {
        "cur_box_point": jnp.asarray(rng.randn(2, 64, 3), jnp.float32),
        "cur_box_reflect": jnp.asarray(rng.rand(2, 64, 1), jnp.float32),
        "train_mask": jnp.ones((2, 64, 1), jnp.float32),
    }
    out = model.apply(variables, batch, train=False)
    for key, shape in [("rcnn_iou", (2,)), ("ioun_cls", (2,)),
                       ("rcnn_ref", (2, 7)), ("refined_box", (2, 7)),
                       ("pred_boxes3d", (2, 7))]:
        assert out[key].shape == shape, key
    # cascade params exist per stage
    params = variables["params"]["rcnn"]
    for c in range(cascade):
        assert f"sa_score_{c}" in params
        assert f"iou_head_{c}" in params


def test_ioun_train_noise(rng):
    cfg = tiny_rcnn_cfg(ioun=True)
    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(3))
    base = {
        "cur_box_point": jnp.asarray(rng.randn(2, 64, 3), jnp.float32),
        "cur_box_reflect": jnp.asarray(rng.rand(2, 64, 1), jnp.float32),
        "train_mask": jnp.ones((2, 64, 1), jnp.float32),
    }
    noisy = dict(base)
    noisy["iou_trans"] = jnp.ones((2, 3, 1)) * 0.3
    noisy["iou_scale"] = jnp.ones((2, 3, 1)) * 1.1
    noisy["iou_ry"] = jnp.ones((2, 1, 1)) * 0.2
    out0 = model.apply(variables, base, train=False)
    out1 = model.apply(variables, noisy, train=False)
    # the jitter shifts the canonical frame => different iou features
    assert not np.allclose(np.asarray(out0["rcnn_iou"]),
                           np.asarray(out1["rcnn_iou"]))
    # but the first-stage RCNN outputs are unaffected
    np.testing.assert_allclose(np.asarray(out0["rcnn_reg"]),
                               np.asarray(out1["rcnn_reg"]), rtol=1e-6)


def test_context_attention_matches_torch_semantics(rng):
    """Literal NumPy port of the reference block (rcnn_net.py:276-283):
    feat (B, C, N); A = softmax(featT @ feat / sqrt(C), dim=1);
    out = feat @ A + feat. The ATT 'context' module is
    pt_utils.SharedMLP([C]) — zero layers, identity."""
    from ws3d_tpu.models.rcnn import context_attention
    B, N, C = 2, 16, 8
    f = rng.randn(B, N, C).astype(np.float32)

    ft = np.transpose(f, (0, 2, 1))                       # (B, C, N)
    logits = np.einsum("bci,bcj->bij", ft, ft) / np.sqrt(float(C))
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    attn = e / e.sum(axis=1, keepdims=True)               # softmax dim=1
    ref = np.einsum("bci,bij->bcj", ft, attn) + ft        # (B, C, N)
    ref = np.transpose(ref, (0, 2, 1))

    out = np.asarray(context_attention(jnp.asarray(f)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_attention_flag_wires_and_keeps_param_tree(rng):
    """cfg.ATTENTION=True changes the forward (parameter-FREE residual
    blocks, so the param tree is identical — the fitted-npz overlay still
    covers 100% of leaves)."""
    batch = {
        "cur_box_point": jnp.asarray(rng.randn(2, 64, 3), jnp.float32),
        "cur_box_reflect": jnp.asarray(rng.rand(2, 64, 1), jnp.float32),
        "train_mask": jnp.ones((2, 64, 1), jnp.float32),
    }
    outs, trees = [], []
    for att in (False, True):
        cfg = tiny_rcnn_cfg(ioun=True)
        cfg.ATTENTION = att
        model = build_model(cfg)
        variables = init_model(model, cfg, jax.random.PRNGKey(2))
        trees.append(jax.tree_util.tree_structure(variables))
        outs.append(model.apply(variables, batch, train=False))
    assert trees[0] == trees[1]
    for key in ("rcnn_cls", "rcnn_iou"):
        assert not np.allclose(np.asarray(outs[0][key]),
                               np.asarray(outs[1][key])), key
        assert np.all(np.isfinite(np.asarray(outs[1][key]))), key


def test_fp_layer0_fold_matches_standard():
    """Eval-time FP layer-0 fold (interp(F) @ W == interp(F @ W) pushed
    through the knowns) matches the standard SharedMLP application."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ws3d_tpu.models import pointnet2 as p2

    rng = np.random.RandomState(0)
    B, n, m, C, Cs = 2, 64, 24, 8, 4
    unknown = jnp.asarray(rng.randn(B, n, 3).astype(np.float32))
    known = jnp.asarray(rng.randn(B, m, 3).astype(np.float32))
    kf = jnp.asarray(rng.randn(B, m, C).astype(np.float32))
    uf = jnp.asarray(rng.randn(B, n, Cs).astype(np.float32))

    mod = p2.PointnetFPModule(mlp=[16, 16], use_bn=True)
    variables = mod.init(jax.random.PRNGKey(0), unknown, known, uf, kf)
    # make running stats non-trivial so the BN fold is actually exercised
    variables = jax.tree_util.tree_map(
        lambda a: a + 0.1 if a.ndim == 1 else a, variables)

    std = mod.apply(variables, unknown, known, uf, kf, train=False)
    old = p2.FORCE_FP_FOLD
    p2.FORCE_FP_FOLD = True
    try:
        fold = mod.apply(variables, unknown, known, uf, kf, train=False)
    finally:
        p2.FORCE_FP_FOLD = old
    np.testing.assert_allclose(np.asarray(fold), np.asarray(std),
                               rtol=1e-4, atol=1e-4)
