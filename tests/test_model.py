"""MVS4Net forward/shape/gradient tests on tiny inputs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep_reconstruction_with_epipolar_lines_mvster_tpu.config import (
    LossConfig,
    ModelConfig,
)
from deep_reconstruction_with_epipolar_lines_mvster_tpu.models import (
    MVS4Net,
    mvs4net_loss,
)


def make_inputs(B=1, V=3, H=64, W=64, ndepth_range=(425.0, 935.0), seed=0):
    """Input dims must be multiples of 64 (stage1 is 1/8 res and reg2d
    downsamples 3 more times) — the same constraint the reference eval loader
    enforces by snapping to 64-multiples (dataloader_eval.py:127-144)."""
    rng = np.random.default_rng(seed)
    imgs = rng.uniform(size=(B, V, H, W, 3)).astype(np.float32)
    K = np.array(
        [[W / 2.0, 0, W / 2.0], [0, W / 2.0, H / 2.0], [0, 0, 1]], dtype=np.float32
    )
    projs = {}
    for s in range(4):
        scale = 2.0 ** (s - 3)  # stage4 = full res
        stacks = np.zeros((B, V, 2, 4, 4), dtype=np.float32)
        for v in range(V):
            E = np.eye(4, dtype=np.float32)
            E[0, 3] = 0.1 * v
            stacks[:, v, 0] = E
            Ks = K.copy()
            Ks[:2] *= scale
            stacks[:, v, 1, :3, :3] = Ks
        projs[f"stage{s + 1}"] = jnp.asarray(stacks)
    depth_values = jnp.asarray(
        np.broadcast_to(np.array(ndepth_range, dtype=np.float32), (B, 2)).copy()
    )
    return jnp.asarray(imgs), projs, depth_values


DTU_CFG = ModelConfig(
    group_cor=True, group_cor_dim=(8, 8, 4, 4), inverse_depth=True, mono=True
)


@pytest.fixture(scope="module")
def model_and_vars():
    imgs, projs, dv = make_inputs()
    model = MVS4Net(DTU_CFG)
    variables = model.init(
        jax.random.PRNGKey(0), imgs, projs, dv, train=True
    )
    return model, variables, (imgs, projs, dv)


def test_forward_shapes_train(model_and_vars):
    model, variables, (imgs, projs, dv) = model_and_vars
    out, _ = model.apply(
        variables, imgs, projs, dv, train=True, mutable=["batch_stats"]
    )
    B, V, H, W, _ = imgs.shape
    assert set(out) == {"stage1", "stage2", "stage3", "stage4"}
    for s, (d, h, w) in enumerate(
        [(8, H // 8, W // 8), (8, H // 4, W // 4), (4, H // 2, W // 2), (4, H, W)]
    ):
        st = out[f"stage{s + 1}"]
        assert st["depth"].shape == (B, h, w)
        assert st["hypo_depth"].shape == (B, d, h, w)
        assert st["attn_weight"].shape == (B, d, h, w)
        assert st["inverse_min_depth"].shape == (B, h, w)
        np.testing.assert_allclose(
            np.asarray(st["attn_weight"].sum(axis=1)), 1.0, atol=1e-5
        )
        dnp = np.asarray(st["depth"])
        assert np.isfinite(dnp).all() and (dnp > 0).all()
        if s == 0:
            # stage1 samples the global range exactly; later stages re-center
            # windows around predictions and may extend past it (reference
            # schedule_inverse_range semantics)
            assert dnp.min() >= 425.0 - 1e-3 and dnp.max() <= 935.0 + 1e-3
    # mono depths attached to stages 2..4 in training
    for s in (2, 3, 4):
        assert f"stage{s}" in out and "mono_depth" in out[f"stage{s}"]
    assert "mono_depth" not in out["stage1"]


def test_forward_eval_confidence(model_and_vars):
    model, variables, (imgs, projs, dv) = model_and_vars
    out = model.apply(variables, imgs, projs, dv, train=False)
    conf = out["stage4"]["photometric_confidence"]
    assert conf.shape == out["stage4"]["depth"].shape
    assert "mono_depth" not in out["stage4"]


@pytest.mark.slow  # 108 s; train-grad covered fast by test_train_step overfit (r5 re-tier)
def test_loss_and_gradients(model_and_vars):
    model, variables, (imgs, projs, dv) = model_and_vars
    B, V, H, W, _ = imgs.shape
    rng = np.random.default_rng(1)
    gt4 = rng.uniform(500, 900, (B, H, W)).astype(np.float32)
    depth_gt, mask = {}, {}
    for s, (h, w) in enumerate([(H // 8, W // 8), (H // 4, W // 4), (H // 2, W // 2), (H, W)]):
        depth_gt[f"stage{s + 1}"] = jnp.asarray(gt4[:, :h, :w])
        mask[f"stage{s + 1}"] = jnp.ones((B, h, w), dtype=jnp.float32)
    lcfg = LossConfig(inverse_depth=True, mono=True)

    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, **other}, imgs, projs, dv, train=True,
            mutable=["batch_stats"],
        )
        total, aux = mvs4net_loss(out, depth_gt, mask, lcfg)
        return total, aux

    (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(total))
    for s in range(4):
        assert np.isfinite(float(aux[f"s{s}_c_loss"]))
        assert np.isfinite(float(aux[f"s{s}_range_err_ratio"]))
    # gradients reach the backbone and every stage's regularizer
    flat = jax.tree_util.tree_leaves_with_path(grads)
    nonzero = {
        jax.tree_util.keystr(path)
        for path, g in flat
        if np.abs(np.asarray(g)).max() > 0
    }
    assert any("FPN4" in k for k in nonzero)
    for s in range(4):
        assert any(f"reg_stage{s + 1}" in k for k in nonzero), f"stage {s+1} got no grads"
    # mono decoder receives gradients (L1 weight is 0 by default => via OT? no —
    # mono head only feeds the L1 term; use l1 weight to check wiring)
    lcfg_l1 = LossConfig(inverse_depth=True, mono=True, l1_lw=1.0)

    def loss_fn_l1(p):
        out, _ = model.apply(
            {"params": p, **other}, imgs, projs, dv, train=True,
            mutable=["batch_stats"],
        )
        return mvs4net_loss(out, depth_gt, mask, lcfg_l1)[0]

    grads_l1 = jax.grad(loss_fn_l1)(params)
    flat_l1 = jax.tree_util.tree_leaves_with_path(grads_l1)
    nonzero_l1 = {
        jax.tree_util.keystr(path)
        for path, g in flat_l1
        if np.abs(np.asarray(g)).max() > 0
    }
    assert any("MonoDepthDecoder" in k for k in nonzero_l1)


def test_no_group_cor_variant():
    cfg = ModelConfig(inverse_depth=True)
    imgs, projs, dv = make_inputs(V=2, H=64, W=64)
    model = MVS4Net(cfg)
    variables = model.init(jax.random.PRNGKey(0), imgs, projs, dv, train=False)
    out = model.apply(variables, imgs, projs, dv, train=False)
    assert out["stage4"]["depth"].shape == (1, 64, 64)


def test_forward_depth_range_non_inverse():
    cfg = ModelConfig(group_cor=True, group_cor_dim=(8, 8, 4, 4))
    imgs, projs, dv = make_inputs(V=2, H=64, W=64)
    model = MVS4Net(cfg)
    variables = model.init(jax.random.PRNGKey(0), imgs, projs, dv, train=False)
    out = model.apply(variables, imgs, projs, dv, train=False)
    assert np.isfinite(np.asarray(out["stage4"]["depth"])).all()
