"""Epipolar Transformer Aggregation — the model's hot loop.

Reimplements the per-source-view warp -> (group) correlation ->
depth-softmax attention -> weighted accumulation of the reference stagenet
(``models/mvs4net_utils.py:1027-1102``) as a fused device-side computation:

  for each source view v:
      warped_v = homo_warp(feat_v)                    [B, D, H, W, C]
      cor_v    = groupwise <warped_v, ref>            [B, D, H, W, G]
      w_v      = softmax_D(sum_G cor_v / T) / sqrt(C) [B, D, H, W]
      acc     += w_v * cor_v ;  norm += w_v

XLA formulation: a static Python loop over the (small, static) view axis with
running accumulators — no ``[V, B, D, H, W, C]`` materialization, each view's
warped volume is consumed immediately (XLA fuses warp arithmetic + gather +
multiply + reduce). The Pallas kernel in ``ops/pallas`` replaces the inner
warp+correlate for large shapes; this module is the reference path and the
CPU/interpret fallback.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

from ..core.geometry import (
    grid_sample_2d,
    relative_projection,
    warp_coords,
    warp_coords_xy,
)


def correlate_view(
    src_fea: jnp.ndarray,       # [B, H, W, C]
    ref_fea: jnp.ndarray,       # [B, H, W, C]
    rel_proj: jnp.ndarray,      # [B, 4, 4]
    depth_hypo: jnp.ndarray,    # [B, D, H, W]
    *,
    group_cor: bool,
    group_dim: int,
    impl: str = "gather",
    band: int = 16,
    tile_rows: int = 8,
    xband: int = 0,
    tile_cols: int = 128,
) -> jnp.ndarray:
    """Warp one source view and correlate against the reference.

    Returns ``[B, D, H, W, G]`` with G = ``group_dim`` (group correlation,
    reference mvs4net_utils.py:1066-1069) or G = C (squared difference,
    ``:1071``).

    ``impl='mxu'`` selects the gather-free banded-matmul warp
    (ops.warp_mxu) — ~10-100x faster on TPU where XLA's gather/scatter
    lowering dominates the train step; falls back to the gather path when
    the height doesn't tile.
    """
    B, D, H, W = depth_hypo.shape
    C = src_fea.shape[-1]
    warped = _warp(
        src_fea, rel_proj, depth_hypo, impl, band, tile_rows, xband, tile_cols
    )
    if group_cor:
        ref_tiled = jnp.broadcast_to(
            ref_fea[:, None], (B, D, H, W, C)
        ).reshape(B * D, H, W, C)
        return _group_correlate(
            warped.reshape(B * D, H, W, C), ref_tiled, group_dim
        ).reshape(B, D, H, W, group_dim)
    diff = ref_fea[:, None] - warped
    return diff * diff  # [B, D, H, W, C]


def _warp(src_fea, rel_proj, depth_hypo, impl, band, tile_rows,
          xband=0, tile_cols=128):
    B, D, H, W = depth_hypo.shape
    if (
        impl in ("mxu", "mxu_pallas", "mxu_hybrid", "mxu_v3")
        and H % tile_rows == 0
        and src_fea.shape[1] >= band
    ):
        from .warp_mxu import homo_warp_mxu

        return homo_warp_mxu(
            src_fea, rel_proj, depth_hypo, band=band, tile_rows=tile_rows,
            xband=xband, tile_cols=tile_cols,
            use_pallas=impl == "mxu_pallas",
            hybrid=impl == "mxu_hybrid",
            v3=impl == "mxu_v3",
        )
    coords = warp_coords(rel_proj, depth_hypo)
    return grid_sample_2d(src_fea, coords)  # [B, D, H, W, C]


def _group_correlate(wf, ref_tiled, g):
    """Folded group correlation: [N,H,W,C] x [N,H,W,C] -> [N,H,W,G] via
    per-group channel slices — fused elementwise chains, no [.., G, C/G]
    6-D intermediate (which XLA materializes with pathological padding)."""
    C = wf.shape[-1]
    cpg = C // g
    cors = [
        (wf[..., gi * cpg : (gi + 1) * cpg]
         * ref_tiled[..., gi * cpg : (gi + 1) * cpg]).mean(axis=-1)
        for gi in range(g)
    ]
    return jnp.stack(cors, axis=-1)


def fuse_cor_eligible(B, H, W, C, dtype, *, band, tile_rows, fuse_cor,
                      group_cor, impl):
    """Single-source eligibility of the fused warp+group-cor Pallas path —
    used by ``epipolar_aggregate`` to pick the branch AND by MVS4Net to
    predict it (to request CW stage features from the FPN). The two must
    agree or a CW feature would reach a non-CW branch."""
    from .warp_mxu import v3_fwd_eligible

    return bool(
        fuse_cor and group_cor and impl == "mxu_v3"
        and H % tile_rows == 0
        and v3_fwd_eligible((B, H, W, C), W, band, dtype)
    )


def epipolar_aggregate(
    features: Sequence[jnp.ndarray],   # per view [B, H, W, C], ref first
    proj_stacks: jnp.ndarray,          # [B, V, 2, 4, 4], ref first
    depth_hypo: jnp.ndarray,           # [B, D, H, W]
    *,
    group_cor: bool,
    group_dim: int,
    attn_temp: float,
    attn_fuse_d: bool = True,
    impl: str = "gather",
    band: int = 16,
    tile_rows: int = 8,
    xband: int = 0,
    tile_cols: int = 128,
    fuse_cor: bool = False,
    pack_out: int = 1,
    kernel_coords: bool = True,
    fuse_attn: bool = False,  # measured negative — ModelConfig.fuse_attn
    features_cw: bool = False,  # features arrive channels-in-sublanes
                                # [B, H, C, Wp] (fpn cw_request); only the
                                # kernel_coords fused path consumes CW —
                                # any other branch transposes back first
) -> jnp.ndarray:
    """Cross-view attention-weighted fused cost volume, FOLDED layout
    ``[B*D, H, W, G]`` (depth folded into batch — keeps XLA from choosing
    batch-minor layouts that pad 5-D volumes ~5x on TPU; the consumer reg
    U-Net convolves in exactly this layout).

    ``pack_out`` > 1: return the volume WIDTH-PACKED, ``[B*D, H, W/k, k*G]``
    (exactly ``packed_conv.pack_w`` of the folded volume) — the consumer reg
    U-Net packs its input anyway, and emitting the packed arrangement
    straight out of the kernel-native accumulation replaces the
    native->NHWC->packed relayout PAIR with one transpose (the r4g trace
    shows the pair costing ~2 copies of the full volume per stage).

    Faithful to the reference accumulation (mvs4net_utils.py:1078-1100)
    including the 1e-8 epsilon seed of the weight sum and the
    ``softmax_D(sum_G / attn_temp) / sqrt(C)`` weighting (attn_fuse_d path)
    or the per-pixel max-weight variant (``attn_fuse_d=False``, ``:1079-1081``).

    ``fuse_cor`` (eval-only; caller gates on ``not train``): with
    ``impl='mxu_v3'`` and group correlation, run warp + correlation in ONE
    Pallas pass (ops/warp_mxu.warp_cor_v3) — the per-view warped volume
    (the largest tensor of the stage) never round-trips HBM. Values
    identical to the two-step path up to f32 accumulation order.
    """
    ref_fea = features[0]
    D = depth_hypo.shape[1]
    if features_cw:
        # CW features share the stage resolution with the hypotheses
        B, H, C = ref_fea.shape[:3]
        W = depth_hypo.shape[3]
    else:
        B, H, W, C = ref_fea.shape
    ref_stack = proj_stacks[:, 0]
    fuse_v3 = fuse_cor_eligible(
        B, H, W, C, features[1].dtype, band=band, tile_rows=tile_rows,
        fuse_cor=fuse_cor, group_cor=group_cor, impl=impl,
    )
    if fuse_v3:
        from .warp_mxu import warp_cor_v3

        # per-stage effective x margin, mirroring homo_warp_mxu's plan
        tc = next(
            (t for t in (tile_cols, 128, 64, 32, 16) if W % t == 0), 0
        )
        xb = max(xband - tile_cols + tc, tc + 16) if tc and xband else 0
    if features_cw and not (fuse_v3 and kernel_coords):
        # CW features reached a branch that wants NHWC (eligibility drift
        # or precomputed-coords kernel): transpose back once, correctly
        features = [
            jnp.swapaxes(f, 2, 3)[:, :, :W] for f in features
        ]
        ref_fea = features[0]
        features_cw = False
    if fuse_v3:
        # kernel-native accumulation: every per-view tensor stays in the
        # pallas output layout [B, D, T, TR, G, W] (G in sublanes, W in
        # lanes) — the per-view NHWC transpose costs ~4.5 ms/view at the
        # bench stage 4 (r4f trace); only the final fused volume is
        # relayouted, once.
        acc = 0.0
        norm = 1e-8
        if kernel_coords:
            from .warp_mxu import warp_cor_v3_ik
        cors = []
        fuse_attn = fuse_attn and attn_fuse_d
        for v in range(1, len(features)):
            rel = relative_projection(proj_stacks[:, v], ref_stack)
            if kernel_coords:
                # coords + band/chunk plan computed INSIDE the kernel from
                # (rel, hypo): no [B, D, H, W] coordinate planes, no XLA
                # plan reductions (~0.9 ms/view coords fusions, r4 trace)
                cor = warp_cor_v3_ik(
                    features[v], ref_fea, rel, depth_hypo, band, tile_rows,
                    xb, group_dim, cw=features_cw,
                )  # [B, D, T, TR, G, W]
            else:
                cxv, cyv = warp_coords_xy(rel, depth_hypo)
                cor = warp_cor_v3(
                    features[v], ref_fea, cxv, cyv, band, tile_rows, xb,
                    group_dim, native=True,
                )  # [B, D, T, TR, G, W]
            if fuse_attn:
                # whole attention chain in ONE Pallas pass after the view
                # loop (softmax_D, weighting, accumulation, normalization)
                # — the XLA elementwise chain was ~2.8 ms/iter of loop
                # fusions + acc/norm round-trips (r5e trace)
                cors.append(cor)
                continue
            cor_sum = cor.sum(axis=4)  # [B, D, T, TR, W]
            if attn_fuse_d:
                w = jax.nn.softmax(cor_sum / attn_temp, axis=1) / math.sqrt(C)
            else:
                w = jax.nn.softmax(cor_sum, axis=1).max(axis=1, keepdims=True)
                w = jnp.broadcast_to(w, cor_sum.shape)
            w = w[:, :, :, :, None]
            acc = acc + w * cor
            norm = norm + w
        if fuse_attn:
            from .pallas.attn_fuse import attn_fuse_native

            out = attn_fuse_native(
                cors, attn_temp=attn_temp, channels=C,
                interpret=jax.default_backend() not in ("tpu", "axon"),
            )
        else:
            out = acc / norm  # [B, D, T, TR, G, W]
        out = out.transpose(0, 1, 2, 3, 5, 4)  # ONE relayout
        out = out.reshape(B * D, H, W, group_dim)
        if pack_out > 1:
            # NOTE (r5 trace, _probe_r5a.out): expressing the pack as a
            # direct [.., G, Wq, k] -> [.., Wq, k, G] transpose compiled to
            # copy+reshape+copy (2.6 ms at the bench s4) — WORSE than this
            # transpose + free pack_w reshape order (~2.1 ms r4g). XLA sees
            # through module boundaries; the relayout pair needs a kernel-
            # level mechanism (flipped-layout reg), not expression shuffling.
            from .packed_conv import pack_w

            out = pack_w(out, pack_out)
        return out

    ref_tiled = jnp.broadcast_to(
        ref_fea[:, None], (B, D, H, W, C)
    ).reshape(B * D, H, W, C)
    acc = 0.0
    norm = 1e-8
    for v in range(1, len(features)):
        rel = relative_projection(proj_stacks[:, v], ref_stack)
        wf = _warp(
            features[v], rel, depth_hypo, impl, band, tile_rows, xband,
            tile_cols,
        ).reshape(B * D, H, W, C)
        if group_cor:
            cor = _group_correlate(wf, ref_tiled, group_dim)
        else:
            diff = ref_tiled - wf
            cor = diff * diff
        cor_sum = cor.sum(axis=-1).reshape(B, D, H, W)
        if attn_fuse_d:
            w = jax.nn.softmax(cor_sum / attn_temp, axis=1) / math.sqrt(C)
            w = w.reshape(B * D, H, W, 1)
            acc = acc + w * cor
            norm = norm + w
        else:
            w = jax.nn.softmax(cor_sum, axis=1).max(axis=1)  # [B, H, W]
            w = jnp.broadcast_to(w[:, None], (B, D, H, W)).reshape(B * D, H, W, 1)
            acc = acc + w * cor
            norm = norm + w
    out = acc / norm  # [B*D, H, W, G]
    if pack_out > 1:
        from .packed_conv import pack_w

        out = pack_w(out, pack_out)  # free reshape of the folded NHWC volume
    return out
