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


def _conv_bn_relu(entries, flax_prefix: str, torch_prefix: str, transform=_conv2d):
    entries.append(
        ("params", f"{flax_prefix}/Conv_0/kernel", f"{torch_prefix}.conv.weight", transform)
    )
    _bn(entries, f"{flax_prefix}/BatchNorm_0", f"{torch_prefix}.bn")


def _fpn4_entries(entries, feature: str):
    """FPN4 (reference mvs4net_utils.py:426-509). ``feature`` is the flax
    module name (``FPN4_0`` or ``CheckpointFPN4_0`` under remat)."""
    stem = [
        "conv0.0", "conv0.1",
        "conv1.0", "conv1.1", "conv1.2",
        "conv2.0", "conv2.1", "conv2.2",
        "conv3.0", "conv3.1", "conv3.2",
    ]
    for i, p in enumerate(stem):
        _conv_bn_relu(entries, f"{feature}/ConvBnReLU_{i}", f"feature.{p}")
    td = f"{feature}/_TopDown_0"
    for i, p in enumerate(["inner1", "inner2", "inner3"]):
        entries.append(("params", f"{td}/Conv_{i}/kernel", f"feature.{p}.weight", _conv2d))
        entries.append(("params", f"{td}/Conv_{i}/bias", f"feature.{p}.bias", _vec))
    for i, p in enumerate(["out1", "out2", "out3", "out4"]):
        entries.append(
            ("params", f"{td}/Conv_{i + 3}/kernel", f"feature.{p}.weight", _conv2d)
        )


def _reg2d_entries(entries, flax_reg: str, torch_reg: str):
    """reg2d (reference mvs4net_utils.py:884-926), agg_type=ConvBnReLU3D.

    Flax child numbering follows *instantiation* order in ``Reg2D.__call__``
    (models/reg.py): each mid block is constructed before the stride conv it
    wraps, so ConvBnReLU3D_{0..6} = torch conv0, conv2, conv1, conv4, conv3,
    conv6, conv5.
    """
    order = [
        ("ConvBnReLU3D_0", "conv0", _conv3d_as_2d),
        ("ConvBnReLU3D_1", "conv2", _conv3d),
        ("ConvBnReLU3D_2", "conv1", _conv3d_as_2d),
        ("ConvBnReLU3D_3", "conv4", _conv3d),
        ("ConvBnReLU3D_4", "conv3", _conv3d_as_2d),
        ("ConvBnReLU3D_5", "conv6", _conv3d),
        ("ConvBnReLU3D_6", "conv5", _conv3d_as_2d),
    ]
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

    if cfg.arch_mode != "fpn":
        raise NotImplementedError(
            f"torch transplant: arch_mode={cfg.arch_mode!r} not mapped yet"
        )
    if cfg.agg_type != "ConvBnReLU3D":
        raise NotImplementedError(
            f"torch transplant: agg_type={cfg.agg_type!r} not mapped yet"
        )
    if cfg.dcn or cfg.asff or cfg.pos_enc:
        raise NotImplementedError("torch transplant: dcn/asff/pos_enc not mapped yet")

    tmpl_flat = {
        col: _flatten(template_variables[col]) for col in template_variables
    }
    feature = (
        "CheckpointFPN4_0"
        if any(p.startswith("CheckpointFPN4_0/") for p in tmpl_flat["params"])
        else "FPN4_0"
    )

    entries: list = []
    _fpn4_entries(entries, feature)
    from ..models.mvs4net import REG3D_DOWN_SIZE

    for s in range(cfg.num_stages):
        if cfg.reg_mode == "reg2d":
            _reg2d_entries(entries, f"reg_stage{s + 1}", f"reg.{s}")
        else:
            _reg3d_entries(
                entries, f"reg_stage{s + 1}", f"reg.{s}", REG3D_DOWN_SIZE[s]
            )
    if cfg.mono:
        _mono_entries(entries)

    out = {col: {} for col in ("params", "batch_stats")}
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
