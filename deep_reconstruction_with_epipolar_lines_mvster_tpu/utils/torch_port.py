"""Torch-checkpoint transplant: reference MVS4net state_dict -> flax variables.

Maps every tensor of the reference PyTorch network
(``/root/reference/models/MVS4Net.py:16-69`` construction;
``mvs4net_utils.py:426-509`` FPN4, ``:884-926`` reg2d, ``:928-979`` reg3d,
``:840-882`` mono_depth_decoder) onto this repo's flax ``MVS4Net`` parameter
tree, so one set of weights can be run through both nets (full-model parity
tests) and the reference's released checkpoints can be loaded directly.

Weight-layout transforms (all verified numerically against torch ops in
``tests/test_torch_parity.py``):

  Conv2d        [O, I, kh, kw]        -> [kh, kw, I, O]
  Conv3d        [O, I, kd, kh, kw]    -> [kd, kh, kw, I, O]
  Conv3d(1,k,k) [O, I, 1, kh, kw]     -> [kh, kw, I, O]   (folded-2D path)
  ConvTransp.   [I, O, (kd,) kh, kw]  -> spatial FLIP, then [(kd,) kh, kw, I, O]
                (torch's transposed conv is the *gradient* of a conv: with the
                module padding (1,2) used here it equals an lhs-dilated conv
                with the spatially flipped kernel)
  BatchNorm     weight/bias           -> params  scale/bias
                running_mean/var      -> batch_stats mean/var

The numeric-parity preconditions (symmetric k//2 conv padding, (1,2)
transposed-conv padding — NOT XLA "SAME") are baked into models/layers.py.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

__all__ = ["torch_state_dict_to_flax", "load_reference_checkpoint"]


# ------------------------------------------------------------- transforms ---

def _conv2d(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _conv3d(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 4, 1, 0))


def _conv3d_as_2d(w) -> np.ndarray:
    w = np.asarray(w)
    assert w.shape[2] == 1, f"depth-extent kernel cannot fold to 2D: {w.shape}"
    return np.transpose(w[:, :, 0], (2, 3, 1, 0))


def _deconv3d_as_2d(w) -> np.ndarray:
    # [I, O, 1, kh, kw] -> flip spatial -> [kh, kw, I, O]
    w = np.asarray(w)
    assert w.shape[2] == 1
    return np.transpose(w[:, :, 0, ::-1, ::-1], (2, 3, 0, 1))


def _deconv3d(w) -> np.ndarray:
    w = np.asarray(w)
    return np.transpose(w[:, :, ::-1, ::-1, ::-1], (2, 3, 4, 0, 1))


def _vec(w) -> np.ndarray:
    return np.asarray(w)


def _dense(w) -> np.ndarray:
    # torch Linear [O, I] -> flax Dense kernel [I, O]
    return np.transpose(np.asarray(w), (1, 0))


def _dcn_weight(w) -> np.ndarray:
    """DeformConvPack ``weight`` [O, I, kh, kw] -> the 1x1 kernel of our
    DeformConv2d's tap contraction, [1, 1, kh*kw*I, O] with input index
    ``tap * I + i`` (taps row-major) — matching the tap-major stack in
    ``models/fpn.py:DeformConv2d``."""
    w = np.asarray(w)
    O, I, kh, kw = w.shape
    return np.transpose(w, (2, 3, 1, 0)).reshape(1, 1, kh * kw * I, O)


# ------------------------------------------------------------- map builder --

def _bn(entries, flax_prefix: str, torch_prefix: str):
    """BatchNorm tensors: torch ``{p}.weight/...`` -> flax params+batch_stats."""
    entries.append(("params", f"{flax_prefix}/scale", f"{torch_prefix}.weight", _vec))
    entries.append(("params", f"{flax_prefix}/bias", f"{torch_prefix}.bias", _vec))
    entries.append(
        ("batch_stats", f"{flax_prefix}/mean", f"{torch_prefix}.running_mean", _vec)
    )
    entries.append(
        ("batch_stats", f"{flax_prefix}/var", f"{torch_prefix}.running_var", _vec)
    )


def _conv_bn_relu(entries, flax_prefix: str, torch_prefix: str,
                  transform=_conv2d, gn: bool = False):
    entries.append(
        ("params", f"{flax_prefix}/Conv_0/kernel", f"{torch_prefix}.conv.weight", transform)
    )
    if gn:
        # reference Conv2d with gn: conv has a bias (bias = not bn,
        # mvs4net_utils.py:236-238) and the norm is GroupNorm (.gn.*)
        entries.append(
            ("params", f"{flax_prefix}/Conv_0/bias", f"{torch_prefix}.conv.bias", _vec)
        )
        entries.append(
            ("params", f"{flax_prefix}/GroupNorm_0/scale", f"{torch_prefix}.gn.weight", _vec)
        )
        entries.append(
            ("params", f"{flax_prefix}/GroupNorm_0/bias", f"{torch_prefix}.gn.bias", _vec)
        )
    else:
        _bn(entries, f"{flax_prefix}/BatchNorm_0", f"{torch_prefix}.bn")


def _topdown_entries(entries, td: str, *, dcn: bool = False,
                      gn: bool = False):
    """The FPN top-down pathway (inner/out convs) shared by FPN4 and the
    ConvNeXt variants (reference mvs4net_utils.py:459-502, :604-650), plus
    the optional NA_DCN heads (``:410-424``, ``feature.dcn{1..4}`` =
    Sequential(BatchNorm2d, ReLU, DeformConvPack))."""
    for i, p in enumerate(["inner1", "inner2", "inner3"]):
        entries.append(("params", f"{td}/Conv_{i}/kernel", f"feature.{p}.weight", _conv2d))
        entries.append(("params", f"{td}/Conv_{i}/bias", f"feature.{p}.bias", _vec))
    for i, p in enumerate(["out1", "out2", "out3", "out4"]):
        entries.append(
            ("params", f"{td}/Conv_{i + 3}/kernel", f"feature.{p}.weight", _conv2d)
        )
    if dcn:
        for i in range(4):
            na = f"{td}/NADCN_{i}"
            if gn:
                # NA_DCN(gn=True) = GroupNorm + ReLU + DeformConvPack
                # (mvs4net_utils.py:410-417)
                entries.append((
                    "params", f"{na}/GroupNorm_0/scale",
                    f"feature.dcn{i + 1}.0.weight", _vec,
                ))
                entries.append((
                    "params", f"{na}/GroupNorm_0/bias",
                    f"feature.dcn{i + 1}.0.bias", _vec,
                ))
            else:
                _bn(entries, f"{na}/BatchNorm_0", f"feature.dcn{i + 1}.0")
            dc = f"{na}/DeformConv2d_0"
            entries.append((
                "params", f"{dc}/Conv_0/kernel",
                f"feature.dcn{i + 1}.2.conv_offset.weight", _conv2d,
            ))
            entries.append((
                "params", f"{dc}/Conv_0/bias",
                f"feature.dcn{i + 1}.2.conv_offset.bias", _vec,
            ))
            entries.append((
                "params", f"{dc}/Conv_1/kernel",
                f"feature.dcn{i + 1}.2.weight", _dcn_weight,
            ))


def _fpn4_entries(entries, feature: str, *, dcn: bool = False,
                  gn: bool = False):
    """FPN4 (reference mvs4net_utils.py:426-509). ``feature`` is the flax
    module name (``FPN4_0`` or ``CheckpointFPN4_0`` under remat)."""
    stem = [
        "conv0.0", "conv0.1",
        "conv1.0", "conv1.1", "conv1.2",
        "conv2.0", "conv2.1", "conv2.2",
        "conv3.0", "conv3.1", "conv3.2",
    ]
    for i, p in enumerate(stem):
        _conv_bn_relu(entries, f"{feature}/ConvBnReLU_{i}", f"feature.{p}",
                      gn=gn)
    _topdown_entries(entries, f"{feature}/_TopDown_0", dcn=dcn, gn=gn)


def _fpn4_convnext_entries(entries, feature: str, *, patchify: bool,
                           dcn: bool = False, gn: bool = False):
    """FPN4_convnext / FPN4_convnext4 (reference mvs4net_utils.py:588-728):
    2-conv stem + three ConvNeXt stages + the shared top-down pathway."""
    _conv_bn_relu(entries, f"{feature}/ConvBnReLU_0", "feature.conv0.0",
                  gn=gn)
    _conv_bn_relu(entries, f"{feature}/ConvBnReLU_1", "feature.conv0.1",
                  gn=gn)
    block_cls = "ConvNeXt4Block" if patchify else "ConvNeXtBlock"
    for i in range(3):
        blk = f"{feature}/{block_cls}_{i}"
        tb = f"feature.conv{i + 1}"
        if patchify:
            # convnext4_block: sconv (2x2 stride-2) then dwconv (7x7 grouped)
            entries.append(("params", f"{blk}/Conv_0/kernel", f"{tb}.sconv.weight", _conv2d))
            entries.append(("params", f"{blk}/Conv_0/bias", f"{tb}.sconv.bias", _vec))
            entries.append(("params", f"{blk}/Conv_1/kernel", f"{tb}.dwconv.weight", _conv2d))
            entries.append(("params", f"{blk}/Conv_1/bias", f"{tb}.dwconv.bias", _vec))
        else:
            entries.append(("params", f"{blk}/Conv_0/kernel", f"{tb}.dwconv.weight", _conv2d))
            entries.append(("params", f"{blk}/Conv_0/bias", f"{tb}.dwconv.bias", _vec))
        entries.append(("params", f"{blk}/LayerNorm_0/scale", f"{tb}.norm.weight", _vec))
        entries.append(("params", f"{blk}/LayerNorm_0/bias", f"{tb}.norm.bias", _vec))
        entries.append(("params", f"{blk}/Dense_0/kernel", f"{tb}.pwconv1.weight", _dense))
        entries.append(("params", f"{blk}/Dense_0/bias", f"{tb}.pwconv1.bias", _vec))
        entries.append(("params", f"{blk}/Dense_1/kernel", f"{tb}.pwconv2.weight", _dense))
        entries.append(("params", f"{blk}/Dense_1/bias", f"{tb}.pwconv2.bias", _vec))
        entries.append(("params", f"{blk}/gamma", f"{tb}.gamma", _vec))
    _topdown_entries(entries, f"{feature}/_TopDown_0", dcn=dcn, gn=gn)


# per ASFF level: the three level-specific convs in the reference's
# construction order == our instantiation order (models/fpn.py:ASFF vs
# reference mvs4net_utils.py:736-755)
_ASFF_LEVEL_CONVS = {
    0: ["stride_level_1", "stride_level_2", "stride_level_3"],
    1: ["compress_level_0", "stride_level_2", "stride_level_3"],
    2: ["compress_level_0", "compress_level_1", "stride_level_3"],
    3: ["compress_level_0", "compress_level_1", "compress_level_2"],
}


def _asff_entries(entries, num_stages: int):
    """ASFF fusion modules (reference mvs4net_utils.py:730-812; constructed
    as ``self.asff = nn.ModuleList([ASFF(i) ...])``, MVS4Net.py:42-43)."""
    for s in range(num_stages):
        flax_pfx = f"ASFF_{s}"
        t = f"asff.{s}"
        for i, name in enumerate(_ASFF_LEVEL_CONVS[s]):
            _conv_bn_relu(entries, f"{flax_pfx}/ConvBnReLU_{i}", f"{t}.{name}")
        for k in range(4):
            _conv_bn_relu(
                entries, f"{flax_pfx}/ConvBnReLU_{3 + k}", f"{t}.weight_level_{k}"
            )
        entries.append(
            ("params", f"{flax_pfx}/Conv_0/kernel", f"{t}.weight_levels.weight", _conv2d)
        )
        entries.append(
            ("params", f"{flax_pfx}/Conv_0/bias", f"{t}.weight_levels.bias", _vec)
        )
        _conv_bn_relu(entries, f"{flax_pfx}/ConvBnReLU_7", f"{t}.expand")


def _agg_block(entries, flax_blk: str, torch_blk: str, agg_type: str):
    """One attention mid block (reference ConvBnReLU3D_{CAM,DCAM,PAM,PDAM},
    mvs4net_utils.py:132-202): full 3x3x3 conv + attention branch + post-
    residual BN (models/layers.py:_AttnConvBase)."""
    entries.append(
        ("params", f"{flax_blk}/Conv_0/kernel", f"{torch_blk}.conv.weight", _conv3d)
    )
    _bn(entries, f"{flax_blk}/BatchNorm_0", f"{torch_blk}.bn")
    if agg_type in ("ConvBnReLU3D_CAM", "ConvBnReLU3D_DCAM"):
        for j, t in enumerate(("linear_agg.0", "linear_agg.2")):
            entries.append((
                "params", f"{flax_blk}/_MLP_0/Dense_{j}/kernel",
                f"{torch_blk}.{t}.weight", _dense,
            ))
            entries.append((
                "params", f"{flax_blk}/_MLP_0/Dense_{j}/bias",
                f"{torch_blk}.{t}.bias", _vec,
            ))
    elif agg_type == "ConvBnReLU3D_PAM":
        entries.append((
            "params", f"{flax_blk}/Conv_1/kernel",
            f"{torch_blk}.pixel_conv.weight", _conv2d,
        ))
        entries.append((
            "params", f"{flax_blk}/Conv_1/bias",
            f"{torch_blk}.pixel_conv.bias", _vec,
        ))
    elif agg_type == "ConvBnReLU3D_PDAM":
        entries.append((
            "params", f"{flax_blk}/Conv_1/kernel",
            f"{torch_blk}.spatial_conv.weight", _conv3d,
        ))
        entries.append((
            "params", f"{flax_blk}/Conv_1/bias",
            f"{torch_blk}.spatial_conv.bias", _vec,
        ))
    else:
        raise NotImplementedError(f"agg_type {agg_type!r}")


def _reg2d_entries(entries, flax_reg: str, torch_reg: str,
                   agg_type: str = "ConvBnReLU3D"):
    """reg2d (reference mvs4net_utils.py:884-926).

    Flax child numbering follows *instantiation* order in ``Reg2D.__call__``
    (models/reg.py): each mid block is constructed before the stride conv it
    wraps. With the default agg_type all seven blocks share one class, so
    ConvBnReLU3D_{0..6} = torch conv0, conv2, conv1, conv4, conv3, conv6,
    conv5; with an attention agg_type the mid blocks (torch conv2/conv4/
    conv6, MVS4Net ``conv_name`` slots, mvs4net_utils.py:891-897) get their
    own class counter ``{AGG}_{0..2}`` and the plain stride/boundary convs
    renumber to ConvBnReLU3D_{0..3} = conv0, conv1, conv3, conv5.
    """
    if agg_type == "ConvBnReLU3D":
        order = [
            ("ConvBnReLU3D_0", "conv0", _conv3d_as_2d),
            ("ConvBnReLU3D_1", "conv2", _conv3d),
            ("ConvBnReLU3D_2", "conv1", _conv3d_as_2d),
            ("ConvBnReLU3D_3", "conv4", _conv3d),
            ("ConvBnReLU3D_4", "conv3", _conv3d_as_2d),
            ("ConvBnReLU3D_5", "conv6", _conv3d),
            ("ConvBnReLU3D_6", "conv5", _conv3d_as_2d),
        ]
    else:
        order = [
            ("ConvBnReLU3D_0", "conv0", _conv3d_as_2d),
            ("ConvBnReLU3D_1", "conv1", _conv3d_as_2d),
            ("ConvBnReLU3D_2", "conv3", _conv3d_as_2d),
            ("ConvBnReLU3D_3", "conv5", _conv3d_as_2d),
        ]
        for i, torch_name in enumerate(["conv2", "conv4", "conv6"]):
            _agg_block(
                entries, f"{flax_reg}/{agg_type}_{i}",
                f"{torch_reg}.{torch_name}", agg_type,
            )
    for flax_name, torch_name, tr in order:
        _conv_bn_relu(entries, f"{flax_reg}/{flax_name}", f"{torch_reg}.{torch_name}", tr)
    for i, torch_name in enumerate(["conv7", "conv9", "conv11"]):
        entries.append((
            "params",
            f"{flax_reg}/DeconvBnReLU3D_{i}/ConvTranspose_0/kernel",
            f"{torch_reg}.{torch_name}.0.weight",
            _deconv3d_as_2d,
        ))
        _bn(
            entries,
            f"{flax_reg}/DeconvBnReLU3D_{i}/BatchNorm_0",
            f"{torch_reg}.{torch_name}.1",
        )
    entries.append(
        ("params", f"{flax_reg}/Conv_0/kernel", f"{torch_reg}.prob.weight", _conv3d_as_2d)
    )
    entries.append(("params", f"{flax_reg}/Conv_0/bias", f"{torch_reg}.prob.bias", _vec))


def _reg3d_entries(entries, flax_reg: str, torch_reg: str, down_size: int):
    """reg3d (reference mvs4net_utils.py:928-979). Flax ``Reg3D`` builds
    ``_C3`` blocks in call order: conv0, conv1, conv2 [, conv3, conv4
    [, conv5, conv6]] then deconvs top-down, then the prob conv."""
    torch_c3 = ["conv0", "conv1", "conv2"]
    deconvs = ["conv11"]
    if down_size >= 2:
        torch_c3 += ["conv3", "conv4"]
        deconvs = ["conv9", "conv11"]
    if down_size >= 3:
        torch_c3 += ["conv5", "conv6"]
        deconvs = ["conv7", "conv9", "conv11"]
    # flax _C3 instantiation order mirrors the nesting _C3(out)(_C3(in)(x)):
    # inner (stride) first? No: outer constructed first in expression order.
    flax_c3 = ["_C3_0", "_C3_1", "_C3_2", "_C3_3", "_C3_4", "_C3_5", "_C3_6"]
    # call-order pairs: conv0 -> _C3_0; then _C3(2b,1)(_C3(2b,2)(..)):
    # outer (conv2) is instantiated before inner (conv1)
    pair_order = {
        1: ["conv0", "conv2", "conv1"],
        2: ["conv0", "conv2", "conv1", "conv4", "conv3"],
        3: ["conv0", "conv2", "conv1", "conv4", "conv3", "conv6", "conv5"],
    }[down_size]
    for flax_name, torch_name in zip(flax_c3, pair_order):
        entries.append((
            "params", f"{flax_reg}/{flax_name}/Conv_0/kernel",
            f"{torch_reg}.{torch_name}.conv.weight", _conv3d,
        ))
        _bn(entries, f"{flax_reg}/{flax_name}/BatchNorm_0", f"{torch_reg}.{torch_name}.bn")
    for i, torch_name in enumerate(deconvs):
        entries.append((
            "params",
            f"{flax_reg}/DeconvBnReLU3D_true_{i}/ConvTranspose_0/kernel",
            f"{torch_reg}.{torch_name}.0.weight",
            _deconv3d,
        ))
        _bn(
            entries,
            f"{flax_reg}/DeconvBnReLU3D_true_{i}/BatchNorm_0",
            f"{torch_reg}.{torch_name}.1",
        )
    entries.append(
        ("params", f"{flax_reg}/Conv_0/kernel", f"{torch_reg}.prob.weight", _conv3d)
    )


def _mono_entries(entries):
    for i in range(3):
        _conv_bn_relu(
            entries,
            f"MonoDepthDecoder_0/ConvBnReLU_{i}",
            f"mono_depth_decoder.convblocks.{i}",
        )
        entries.append((
            "params", f"MonoDepthDecoder_0/Conv_{i}/kernel",
            f"mono_depth_decoder.conv3x3.{i}.weight", _conv2d,
        ))
        entries.append((
            "params", f"MonoDepthDecoder_0/Conv_{i}/bias",
            f"mono_depth_decoder.conv3x3.{i}.bias", _vec,
        ))


# ------------------------------------------------------------------ public --

def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, p))
        else:
            out[p] = v
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    tree: Dict = {}
    for path, v in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def torch_state_dict_to_flax(state_dict, template_variables, cfg):
    """Convert a reference ``MVS4net`` state_dict to flax ``variables``.

    Args:
      state_dict: torch ``model.state_dict()`` (tensors or numpy arrays;
        ``module.``-prefixed DataParallel keys are accepted).
      template_variables: variables from ``MVS4Net(cfg).init`` — provides the
        target tree structure/dtypes and is used to validate full coverage.
      cfg: the ``ModelConfig`` the template was built with.

    Returns a new variables dict {params, batch_stats}. Raises ``ValueError``
    listing any unmapped/missing leaves (shape mismatches included), so a
    silent partial transplant is impossible.
    """
    sd = {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in state_dict.items()
    }

    tmpl_flat = {
        col: _flatten(template_variables[col]) for col in template_variables
    }
    # backbone module name: FPN4_0 / FPN4ConvNeXt_0, Checkpoint- prefixed
    # under remat
    feature = next(
        p.split("/")[0] for p in tmpl_flat["params"] if "FPN4" in p.split("/")[0]
    )

    entries: list = []
    if cfg.arch_mode == "fpn":
        _fpn4_entries(entries, feature, dcn=cfg.dcn, gn=cfg.gn)
    elif cfg.arch_mode in ("fpn_convnext", "fpn_convnext4"):
        _fpn4_convnext_entries(
            entries, feature,
            patchify=(cfg.arch_mode == "fpn_convnext4"), dcn=cfg.dcn,
            gn=cfg.gn,
        )
    else:
        raise NotImplementedError(
            f"torch transplant: arch_mode={cfg.arch_mode!r} not mapped"
        )
    if cfg.asff:
        _asff_entries(entries, cfg.num_stages)
    from ..models.mvs4net import REG3D_DOWN_SIZE

    for s in range(cfg.num_stages):
        if cfg.reg_mode == "reg2d":
            _reg2d_entries(entries, f"reg_stage{s + 1}", f"reg.{s}", cfg.agg_type)
        else:
            _reg3d_entries(
                entries, f"reg_stage{s + 1}", f"reg.{s}", REG3D_DOWN_SIZE[s]
            )
    if cfg.mono:
        _mono_entries(entries)

    # pos_enc: the reference parses --pos_enc but never populates
    # pos_enc_func (dead flag, MVS4Net.py:51-52), so reference checkpoints
    # contain NO pos-enc tensors regardless of the flag. pos_enc=1 (sine) is
    # parameter-free here too; pos_enc=2 (learned) has embeddings with no
    # torch source — keep the template's fresh init and say so.
    posenc_fresh = {
        col: {
            p: np.asarray(v)
            for p, v in tmpl_flat[col].items()
            if p.startswith("pos_enc_stage")
        }
        for col in tmpl_flat
    }
    if cfg.pos_enc == 2 and posenc_fresh["params"]:
        import warnings

        warnings.warn(
            "pos_enc=2: reference checkpoints carry no learned pos-enc "
            "tensors (dead flag upstream, MVS4Net.py:51-52); the "
            "depth embeddings keep their fresh initialization",
            stacklevel=2,
        )

    out = {col: dict(posenc_fresh.get(col, {})) for col in ("params", "batch_stats")}
    problems = []
    for col, flax_path, torch_key, transform in entries:
        if torch_key not in sd:
            problems.append(f"missing torch key {torch_key}")
            continue
        src = sd[torch_key]
        if hasattr(src, "detach"):
            src = src.detach().cpu().numpy()
        arr = transform(src)
        tmpl = tmpl_flat[col].get(flax_path)
        if tmpl is None:
            problems.append(f"no flax leaf {col}:{flax_path} (from {torch_key})")
            continue
        if tuple(arr.shape) != tuple(np.shape(tmpl)):
            problems.append(
                f"shape mismatch {col}:{flax_path} {arr.shape} != {np.shape(tmpl)}"
            )
            continue
        out[col][flax_path] = arr.astype(np.asarray(tmpl).dtype)

    for col in out:
        uncovered = set(tmpl_flat.get(col, {})) - set(out[col])
        for path in sorted(uncovered):
            problems.append(f"flax leaf not covered: {col}:{path}")
    if problems:
        raise ValueError(
            "torch->flax transplant incomplete:\n  " + "\n  ".join(problems)
        )
    return {col: _unflatten(flat) for col, flat in out.items()}


def load_reference_checkpoint(path: str, template_variables, cfg):
    """Load a reference ``.ckpt`` file (torch.save dict with a ``model`` key,
    reference train_mvs4.py:552/test_mvs4.py:317) into flax variables."""
    import torch

    blob = torch.load(path, map_location="cpu")
    sd = blob.get("model", blob)
    return torch_state_dict_to_flax(sd, template_variables, cfg)
