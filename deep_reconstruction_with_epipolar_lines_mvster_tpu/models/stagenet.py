"""Single cascade stage: aggregation -> regularization -> depth readout.

Functional equivalent of the reference ``stagenet.forward``
(``models/mvs4net_utils.py:1027-1162``). Parameters live in the per-stage
regularization network passed in by MVS4Net; this module is pure orchestration.

Readout semantics reproduced exactly:
- winner-take-all depth: gather the hypothesis at the argmax of
  ``softmax_D(scores)`` (``:1129-1130``; the expectation variant is
  commented out upstream);
- eval-only photometric confidence from the *pre-softmax* scores:
  ``max_D(score) / sum_D(score)`` (the fork's "OLI" confidence,
  ``:1109-1114,1135-1142``);
- next-stage inverse-depth window ``1/depth ± split_itv · itv`` with
  ``itv = 1/hypo[:,2] - 1/hypo[:,1]`` (``:1151-1156``).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Sequence

import jax
import jax.numpy as jnp

from ..ops.warp_cor import epipolar_aggregate


def run_stage(
    features: Sequence[jnp.ndarray],   # per view [B, h, w, C], ref first
    proj_stacks: jnp.ndarray,          # [B, V, 2, 4, 4]
    depth_hypo: jnp.ndarray,           # [B, D, h, w]
    regnet: Callable[[jnp.ndarray], jnp.ndarray],  # volume -> [B, D, h, w]
    *,
    group_cor: bool,
    group_dim: int,
    split_itv: float,
    attn_temp: float,
    attn_fuse_d: bool,
    inverse_depth: bool,
    train: bool,
    warp_impl: str = "gather",
    warp_band: int = 16,
    warp_tile_rows: int = 8,
    warp_xband: int = 0,
    warp_tile_cols: int = 128,
    fuse_cor: bool = True,
    kernel_coords: bool = True,
    fuse_attn: bool = False,
    features_cw: bool = False,
    pack_out: int = 1,
) -> Dict[str, Any]:
    B, D, H, W = depth_hypo.shape
    cost = epipolar_aggregate(
        features, proj_stacks, depth_hypo,
        group_cor=group_cor, group_dim=group_dim,
        attn_temp=attn_temp, attn_fuse_d=attn_fuse_d,
        impl=warp_impl, band=warp_band, tile_rows=warp_tile_rows,
        xband=warp_xband, tile_cols=warp_tile_cols,
        # eval-only fused warp+group-cor kernel (no VJP; the train path
        # keeps the differentiable two-step v3/hybrid warp)
        fuse_cor=fuse_cor and not train,
        kernel_coords=kernel_coords,
        fuse_attn=fuse_attn,
        features_cw=features_cw,
        # pack_out > 1: emit the volume width-packed for a prepacked reg
        # U-Net (caller guarantees the regnet expects exactly this factor)
        pack_out=pack_out,
    )  # folded [B*D, h, w, G]; packed [B*D, h, w/k, k*G] when pack_out=k>1

    score = regnet(cost).astype(jnp.float32).reshape(B, D, H, W)

    attn_weight = jax.nn.softmax(score, axis=1)
    # winner-take-all readout, gather-free: argmax(softmax) == argmax, and
    # the take_along_axis select is a one-hot masked sum — identical values,
    # but XLA's TPU gather lowering is ~45x slower than the fused
    # mask-and-reduce at the full-res stage (BENCH_NOTES.md round 2;
    # reference semantics mvs4net_utils.py:1129-1130 unchanged)
    idx = jnp.argmax(score, axis=1)  # [B, h, w]
    onehot = (
        jnp.arange(D, dtype=idx.dtype)[None, :, None, None] == idx[:, None]
    )
    depth = jnp.where(onehot, depth_hypo, 0.0).sum(axis=1)

    out: Dict[str, Any] = {
        "depth": depth,
        "hypo_depth": depth_hypo,
        "attn_weight": attn_weight,
    }

    if train:
        out["photometric_confidence"] = jnp.zeros((), dtype=jnp.float32)
    else:
        score_max = jnp.where(onehot, score, 0.0).sum(axis=1)
        out["photometric_confidence"] = score_max / score.sum(axis=1)

    if inverse_depth:
        itv = 1.0 / depth_hypo[:, 2] - 1.0 / depth_hypo[:, 1]
        out["inverse_min_depth"] = 1.0 / depth + split_itv * itv
        out["inverse_max_depth"] = 1.0 / depth - split_itv * itv
    return out
