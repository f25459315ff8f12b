"""MVS4Net — the 4-stage cascaded MVSTER network (flax linen, NHWC).

TPU-first re-design of the reference top-level net
(``models/MVS4Net.py:16-193``):

- the per-view FPN runs once with views folded into the batch axis (the
  reference loops the backbone per view, ``MVS4Net.py:78-80``);
- stages are unrolled statically (shapes differ per stage — natural under
  XLA) with the depth window schedulers from ``core.hypothesis``;
- the depth range stays on device (the reference syncs ``depth_values`` to
  host numpy every step, ``MVS4Net.py:72-74`` — removed);
- ``pos_enc`` is actually wired (dead flag upstream, ``MVS4Net.py:51-52``).

Sample spec (matches the reference loaders, ``datasets/dtu_yao4.py:228-232``):
  imgs            [B, V, H, W, 3]
  proj_matrices   dict {"stage1".."stage4"} of [B, V, 2, 4, 4]
  depth_values    [B, >=2]  (min..max; eval passes all 192 samples)

Output: dict {"stage{i}": {depth, photometric_confidence, hypo_depth,
attn_weight, inverse_min_depth*, inverse_max_depth*, mono_feat*, mono_depth*}}.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from ..core.hypothesis import (
    init_inverse_range,
    init_range,
    schedule_inverse_range,
    schedule_range,
)
from .fpn import ASFF, FPN4, FPN4ConvNeXt
from .mono import MonoDepthDecoder
from .posenc import PosEncLearned, PosEncSine
from .reg import Reg2D, Reg3D
from .stagenet import run_stage

REG3D_DOWN_SIZE = (3, 3, 2, 2)  # reference MVS4Net.py:58


class MVS4Net(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        imgs: jnp.ndarray,
        proj_matrices: Dict[str, jnp.ndarray],
        depth_values: jnp.ndarray,
        *,
        train: bool,
        space_axis: str | None = None,
        space_shards: int = 1,
        space_halo: int = 48,
    ) -> Dict[str, Any]:
        """``space_axis``: run the cost-volume pipeline row-sharded over that
        shard_map mesh axis (eval only) — the spatial-parallel path for
        high-res eval (SURVEY.md §5.7). Design: the backbone runs replicated
        over ``space`` (~30% of eval time at the bench shape; replicating it
        makes every source view's features locally available, so the
        homography warp — whose source rows are geometry-dependent and
        unbounded — needs NO halo exchange), while the dominant per-stage
        warp/correlation/regularization/readout shards by OUTPUT rows with a
        ``space_halo`` overlap covering the reg U-Net's receptive field
        (exact overlap-tile inference), and the depth readout rows are
        all-gathered between stages for the next hypothesis window. Stages
        too small to window (coarse levels) run replicated. Results are
        bit-identical to the unsharded forward (tests/test_spatial_sharding).
        """
        cfg = self.cfg
        B, V, H, W, _ = imgs.shape
        dtype = cfg.compute_dtype
        if space_axis is not None and train:
            raise NotImplementedError("spatial sharding is an eval-path feature")

        # ---- feature extraction: views folded into batch --------------------
        # nn.remat: recompute activations in the backward pass instead of
        # keeping every conv output live (the train step OOMs HBM at the DTU
        # recipe shape otherwise; static_argnums=(2,) marks `train`).
        def maybe_remat(cls):
            return nn.remat(cls, static_argnums=(2,)) if cfg.remat else cls

        # CW stage features (config.cw_stage_features rationale): predict —
        # with the SAME single-source eligibility helpers the FPN and the
        # aggregate use — which stages can hand the fused top-down chain's
        # native [N, H, C, Wp] output straight to the fused warp+cor kernel
        spatial_req = space_axis is not None
        cw_stage = [False] * cfg.num_stages
        if (
            cfg.cw_stage_features and not train and not spatial_req
            and cfg.arch_mode == "fpn" and not cfg.asff and not cfg.dcn
            and not cfg.mono and cfg.fuse_warp_cor and cfg.kernel_coords
            and cfg.warp_impl == "mxu_v3"
        ):
            from ..ops.warp_cor import fuse_cor_eligible
            from .fpn import topdown_chain_active

            if topdown_chain_active(H, W, cfg.fpn_base_channel,
                                    cfg.fused_topdown,
                                    cfg.fused_topdown_chain):
                for s in range(1, cfg.num_stages):  # stage 1 = intra, NHWC
                    hs, ws = H >> (3 - s), W >> (3 - s)
                    cs = cfg.fpn_base_channel << (3 - s)
                    bnd = (cfg.warp_band if isinstance(cfg.warp_band, int)
                           else cfg.warp_band[s])
                    cw_stage[s] = fuse_cor_eligible(
                        B, hs, ws, cs, dtype, band=bnd,
                        tile_rows=cfg.warp_tile_rows, fuse_cor=True,
                        group_cor=cfg.group_cor, impl="mxu_v3",
                    )

        # view_groups=V: train-mode BN statistics per view on the folded
        # batch, matching the reference's per-view FPN calls (MVS4Net.py:78-80)
        if cfg.arch_mode == "fpn":
            backbone = maybe_remat(FPN4)(
                cfg.fpn_base_channel, gn=cfg.gn, dcn=cfg.dcn, view_groups=V,
                pack=cfg.pack_conv, fuse_topdown=cfg.fused_topdown,
                fuse_chain=cfg.fused_topdown_chain,
                cw_request=tuple(cw_stage[1:4]), dtype=dtype,
            )
        elif cfg.arch_mode == "fpn_convnext":
            backbone = maybe_remat(FPN4ConvNeXt)(
                cfg.fpn_base_channel, gn=cfg.gn, dcn=cfg.dcn, view_groups=V,
                dtype=dtype,
            )
        elif cfg.arch_mode == "fpn_convnext4":
            backbone = maybe_remat(FPN4ConvNeXt)(
                cfg.fpn_base_channel, gn=cfg.gn, dcn=cfg.dcn, patchify=True,
                view_groups=V, dtype=dtype,
            )
        else:
            raise ValueError(f"unknown arch_mode {cfg.arch_mode!r}")

        folded = imgs.astype(dtype).reshape(B * V, H, W, imgs.shape[-1])
        pyramids = backbone(folded, train)  # 4 x [B*V, h, w, c]
        feats = [
            p.reshape(B, V, *p.shape[1:]) for p in pyramids
        ]  # stage index 0 = coarsest

        if cfg.asff:
            asff_mods = [ASFF(i, cfg.fpn_base_channel, dtype=dtype) for i in range(cfg.num_stages)]

        depth_min = depth_values[:, 0]
        depth_max = depth_values[:, -1]
        depth_interval = (depth_max - depth_min) / depth_values.shape[1]

        outputs: Dict[str, Any] = {}
        prev: Dict[str, Any] = {}
        for s in range(cfg.num_stages):
            if cfg.asff:
                fs = asff_mods[s]
                stage_views = [
                    fs(
                        feats[0][:, v], feats[1][:, v], feats[2][:, v], feats[3][:, v],
                        train=train,
                    )
                    for v in range(V)
                ]
            else:
                stage_views = [feats[s][:, v] for v in range(V)]
            if cw_stage[s]:
                # CW layout [B, h, C, Wp]: logical width from the image dims
                h, w = stage_views[0].shape[1], W >> (3 - s)
            else:
                h, w = stage_views[0].shape[1:3]
            projs = proj_matrices[f"stage{s + 1}"]

            if s == 0:
                if cfg.inverse_depth:
                    hypo = init_inverse_range(depth_values, cfg.ndepths[0], h, w)
                else:
                    hypo = init_range(depth_values, cfg.ndepths[0], h, w)
            else:
                if cfg.inverse_depth:
                    hypo = schedule_inverse_range(
                        jnp.asarray(prev["inverse_min_depth"]),
                        jnp.asarray(prev["inverse_max_depth"]),
                        cfg.ndepths[s], h, w,
                    )
                else:
                    hypo = schedule_range(
                        prev["depth"], cfg.ndepths[s],
                        cfg.depth_inter_r[s] * depth_interval, h, w,
                    )
            hypo = jnp.asarray(hypo, dtype=jnp.float32)

            if cfg.reg_mode == "reg2d":
                # pre-packed cost-volume handoff: the aggregate emits the
                # width-packed arrangement directly from its kernel-native
                # accumulation (one relayout instead of the native->NHWC->
                # packed pair). Gated off under pos-enc (operates on the
                # unpacked per-bin volume).
                from .reg import reg2d_pack_factor

                pack_out = (
                    reg2d_pack_factor(w, cfg.reg_channel, cfg.agg_type,
                                      cfg.pack_conv)
                    if cfg.pos_enc == 0 else 1
                )
                regnet = maybe_remat(Reg2D)(
                    base_channels=cfg.reg_channel, agg_type=cfg.agg_type,
                    depth=cfg.ndepths[s], pack=cfg.pack_conv,
                    prepacked_k=pack_out, d_pack_mids=cfg.d_pack_mids,
                    dtype=dtype,
                    name=f"reg_stage{s + 1}",
                )
            else:
                pack_out = 1
                regnet = maybe_remat(Reg3D)(
                    base_channels=cfg.reg_channel, down_size=REG3D_DOWN_SIZE[s],
                    depth=cfg.ndepths[s], pack=cfg.pack_conv, dtype=dtype,
                    name=f"reg_stage{s + 1}",
                )

            if cfg.pos_enc == 1:
                penc = PosEncSine()
            elif cfg.pos_enc == 2:
                penc = PosEncLearned(cfg.ndepths[s], _stage_in_dim(cfg, s),
                                     name=f"pos_enc_stage{s + 1}")
            else:
                penc = None

            # ---- spatial (row) sharding of the stage pipeline ------------
            halo = space_halo - space_halo % 8
            hs = h // space_shards if space_shards else h
            ws = hs + 2 * halo
            spatial = (
                space_axis is not None
                and space_shards > 1
                and h % (space_shards * 8) == 0
                and ws < h  # coarse stages run replicated instead
            )
            if spatial:
                p = jax.lax.axis_index(space_axis)
                start = jnp.clip(p * hs - halo, 0, h - ws)
                crop = p * hs - start
                stage_hypo = jax.lax.dynamic_slice_in_dim(hypo, start, ws, axis=2)
                stage_views = [
                    jax.lax.dynamic_slice_in_dim(stage_views[0], start, ws, axis=1)
                ] + stage_views[1:]
                # ref pixel rows become window-local: shift the ref view's
                # principal point cy by the window start (exact — the
                # analytic K inverse in core.geometry absorbs it)
                shift = jnp.zeros_like(projs).at[:, 0, 1, 1, 2].add(
                    start.astype(projs.dtype)
                )
                projs = projs - shift
            else:
                stage_hypo = hypo

            def reg_apply(vol, _regnet=regnet, _penc=penc, _hypo=stage_hypo,
                          _d=cfg.ndepths[s]):
                # vol is folded [B*D, h, w, G]; pos-enc operates per-depth-bin
                if _penc is not None:
                    N, hh, ww, cc = vol.shape
                    v5 = vol.reshape(N // _d, _d, hh, ww, cc)
                    vol = _penc(v5, _hypo).reshape(N, hh, ww, cc)
                return _regnet(vol, train)

            out = run_stage(
                stage_views, projs, stage_hypo, reg_apply,
                group_cor=cfg.group_cor,
                group_dim=cfg.group_cor_dim[s],
                split_itv=cfg.depth_inter_r[s],
                attn_temp=cfg.attn_temp,
                attn_fuse_d=cfg.attn_fuse_d,
                inverse_depth=cfg.inverse_depth,
                train=train,
                warp_impl=cfg.warp_impl,
                warp_band=(cfg.warp_band if isinstance(cfg.warp_band, int)
                           else cfg.warp_band[s]),
                warp_tile_rows=cfg.warp_tile_rows,
                warp_xband=cfg.warp_xband,
                warp_tile_cols=cfg.warp_tile_cols,
                fuse_cor=cfg.fuse_warp_cor,
                kernel_coords=cfg.kernel_coords,
                fuse_attn=cfg.fuse_attn,
                features_cw=cw_stage[s],
                pack_out=pack_out,
            )
            if spatial:
                # crop the halo away, reassemble full-H maps across shards
                def reassemble(v):
                    if v.ndim < 3:
                        return v  # train-mode scalar confidence
                    axis = 2 if v.ndim == 4 else 1  # [B,D,h,w] vs [B,h,w]
                    rows = jax.lax.dynamic_slice_in_dim(v, crop, hs, axis=axis)
                    return jax.lax.all_gather(
                        rows, space_axis, axis=axis, tiled=True
                    )

                out = {k: reassemble(v) for k, v in out.items()}
            if cfg.mono and not spatial:
                # reference view features (train-only consumer; under spatial
                # sharding stage_views[0] is a row window — eval never reads it)
                out["mono_feat"] = stage_views[0]
            outputs[f"stage{s + 1}"] = out
            # next-stage windows come from detached predictions
            # (reference MVS4Net.py:116-118 uses .detach())
            prev = {
                k: jax.lax.stop_gradient(out[k])
                for k in ("depth", "inverse_min_depth", "inverse_max_depth")
                if k in out
            }

        if cfg.mono and train:
            mono_feats = [
                outputs[f"stage{s + 1}"]["mono_feat"] for s in range(cfg.num_stages)
            ]
            mono_depths = MonoDepthDecoder(interp=cfg.mono_stg_itrpl, dtype=dtype)(
                mono_feats, depth_values[:, 0], depth_values[:, 1], train=train
            )
            for i, md in enumerate(mono_depths):
                outputs[f"stage{i + 2}"]["mono_depth"] = md

        return outputs


def _stage_in_dim(cfg: ModelConfig, s: int) -> int:
    if cfg.group_cor:
        return cfg.group_cor_dim[s]
    return cfg.fpn_out_channels[s]
