"""Typed configuration for the MVSTER-TPU framework.

The reference drives everything through 40+ argparse flags with dense string
encodings (``train_mvs4.py:18-100``, SURVEY.md §5.6). Here the canonical
source of truth is typed dataclasses; ``parse_*`` helpers keep the reference's
string encodings as a compatibility layer so the shipped recipes translate
1:1 (``--ndepths "8,8,4,4"``, ``--lrepochs "2,3:1.2"``, ``--Nlights "3:7"``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple


def parse_int_list(s: str) -> Tuple[int, ...]:
    """``"8,8,4,4" -> (8, 8, 4, 4)`` (reference: train_mvs4.py:510)."""
    return tuple(int(x) for x in s.split(",") if x)


def parse_float_list(s: str) -> Tuple[float, ...]:
    """``"0.5,0.5,0.5,1" -> (0.5, 0.5, 0.5, 1.0)`` (train_mvs4.py:511)."""
    return tuple(float(x) for x in s.split(",") if x)


def parse_lrepochs(s: str) -> Tuple[Tuple[int, ...], float]:
    """``"6,8,9:2" -> ((6, 8, 9), 2.0)`` — milestone epochs and LR divisor
    (reference: train_mvs4.py:120-121)."""
    milestones, divisor = s.split(":")
    return parse_int_list(milestones), float(divisor)


def parse_nlights(s: str) -> Tuple[int, int]:
    """``"3:7" -> (3, 7)`` — use 3 of 7 lights; negative first element means a
    fixed light index (reference: datasets/blender4.py:25-27,52-66)."""
    use, total = s.split(":")
    return int(use), int(total)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """MVS4net architecture hyperparameters (reference: models/MVS4Net.py:16-67)."""

    arch_mode: str = "fpn"              # fpn | fpn_convnext | fpn_convnext4
    reg_mode: str = "reg2d"             # reg2d | reg3d
    num_stages: int = 4
    fpn_base_channel: int = 8
    reg_channel: int = 8
    ndepths: Tuple[int, ...] = (8, 8, 4, 4)
    depth_inter_r: Tuple[float, ...] = (0.5, 0.5, 0.5, 1.0)
    group_cor: bool = False
    group_cor_dim: Tuple[int, ...] = (8, 8, 4, 4)
    inverse_depth: bool = False
    agg_type: str = "ConvBnReLU3D"      # | _CAM | _DCAM | _PAM | _PDAM suffixes
    dcn: bool = False
    pos_enc: int = 0                    # 0 none | 1 sine | 2 learned (wired, unlike ref)
    mono: bool = False
    mono_stg_itrpl: str = "nearest"     # nearest | bilinear
    asff: bool = False
    attn_temp: float = 2.0
    attn_fuse_d: bool = True
    gn: bool = False                    # GroupNorm instead of BatchNorm in FPN
    dtype: str = "float32"              # compute dtype: float32 | bfloat16
    remat: bool = True                  # rematerialize backbone + reg U-Nets
                                        # (activation memory; the reference's
                                        # analog is eager-mode `del`s)
    warp_impl: str = "mxu_hybrid"       # 'mxu_hybrid' (XLA-scan fwd +
                                        # x-banded Pallas bwd — fastest
                                        # measured, BENCH_NOTES.md round 2)
                                        # | 'mxu' (scan fwd+bwd)
                                        # | 'mxu_v3' (flipped-layout Pallas
                                        # fwd + x-banded Pallas bwd)
                                        # | 'mxu_pallas' (v1 Pallas fwd)
                                        # | 'gather' (XLA gather, exact
                                        # fallback for any geometry)
    warp_band: Any = 16                 # source-row band for the mxu warp:
                                        # one int for all stages, or a
                                        # per-stage tuple (validate each
                                        # stage IN-CASCADE with
                                        # ops.warp_mxu.band_coverage on the
                                        # refined hypotheses — the
                                        # schedule_* windows can exceed the
                                        # initial depth range, so a
                                        # first-stage check is NOT
                                        # conservative; _probe_r5k)
    warp_tile_rows: int = 8             # output rows per mxu warp tile
    warp_xband: int = 192               # source-column band per chunk at
                                        # tile_cols=128 (margin is preserved
                                        # when stages force smaller chunks);
                                        # 0 = full-width contraction
    warp_tile_cols: int = 128           # output cols per mxu warp chunk
    pack_conv: bool = False             # width-packed (space-to-depth) conv
                                        # execution for the small-channel
                                        # FPN-stem/reg2d convs — math-
                                        # identical, ~5-8x faster on TPU
                                        # (ops/packed_conv.py; BENCH_NOTES)
    fused_topdown: bool = False         # fused Pallas kernel for the FPN's
                                        # full-res top-down level, eval +
                                        # train (custom VJP rematerializes
                                        # the unfused chain for backward;
                                        # ops/pallas/topdown_fused.py)
    fused_topdown_chain: bool = True    # with fused_topdown: run ALL levels
                                        # in one chain with the inter-level
                                        # pathway kept in the kernel's
                                        # channels-in-sublanes layout;
                                        # False = per-level fusion (NHWC
                                        # hand-off between levels)
    fuse_warp_cor: bool = True          # eval-only fused warp+group-cor
                                        # Pallas pass under warp_impl=mxu_v3
                                        # (ops/warp_mxu.warp_cor_v3)
    kernel_coords: bool = True          # with fuse_warp_cor: compute the
                                        # warp coordinates + band/chunk plan
                                        # INSIDE the kernel from (rel, hypo)
                                        # — no [B,D,H,W] coord planes
                                        # (ops/warp_mxu.warp_cor_v3_ik;
                                        # measured r5e: 53.08 -> 49.63
                                        # ms/iter at the bench config)
    cw_stage_features: bool = True      # eval: let the fused top-down
                                        # chain hand its CW-native outputs
                                        # [N, H, C, Wp] straight to the
                                        # fused warp+cor kernels (free
                                        # reshapes replace the per-stage
                                        # NHWC transpose copies — r5e
                                        # trace: ~2 ms/iter). Auto-gated:
                                        # only stages where BOTH the chain
                                        # and the fused-cor kernel are
                                        # eligible, and off under train /
                                        # spatial / asff / dcn / mono
    fuse_attn: bool = False             # with fuse_warp_cor + attn_fuse_d:
                                        # run the whole cross-view attention
                                        # accumulation in one Pallas pass
                                        # over the native cor volumes
                                        # (ops/pallas/attn_fuse.py).
                                        # MEASURED NEGATIVE at the bench
                                        # config (50.85 vs 49.57 ms,
                                        # _probe_r5h): the separate pass
                                        # re-reads the 3 per-view volumes
                                        # that XLA's elementwise chain
                                        # consumes in-fusion. Kept opt-in
                                        # for narrow-memory configs
    d_pack_mids: bool = False           # depth-in-channels execution of the
                                        # reg U-Net 3x3x3 mids where it cuts
                                        # paper FLOPs (ops/packed_conv.py
                                        # mid_pack_plan). OPT-IN: measured
                                        # only +0.45 ms/iter at the bench
                                        # config and the changed bf16
                                        # summation order perturbs the
                                        # argmax cascade at outlier pixels
                                        # (_probe_r5e: max depth diff 394 at
                                        # a 410..1046 range, f32 exact)

    @property
    def compute_dtype(self):
        import jax.numpy as jnp

        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.dtype]

    @property
    def fpn_out_channels(self) -> Tuple[int, ...]:
        b = self.fpn_base_channel
        return (8 * b, 4 * b, 2 * b, b)


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """MVS4net_loss weights (reference: models/MVS4Net.py:195-240).

    Note the reference CLI passes ``l1ce_lw`` but the loss reads ``l1ot_lw``
    so the CLI weights silently stay at the (0, 1) default
    (train_mvs4.py:337 vs MVS4Net.py:197). Here the weights are explicit; the
    reference's *effective* training behaviour corresponds to the default.
    """

    stage_lw: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    l1_lw: float = 0.0
    ot_lw: float = 1.0
    ot_iter: int = 3
    ot_eps: float = 1.0
    ot_continuous: bool = False
    inverse_depth: bool = False
    mono: bool = False


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimizer / schedule / loop settings (reference: train_mvs4.py:33-52,118-137)."""

    lr: float = 1e-3
    weight_decay: float = 0.0
    epochs: int = 10
    batch_size: int = 1
    lr_scheduler: str = "MS"            # MS | cos | onecycle | exponent
    lr_milestones: Tuple[int, ...] = (6, 8, 9)   # epochs
    lr_gamma_divisor: float = 2.0
    warmup_iters: int = 500
    warmup_factor: float = 1.0 / 3.0
    seed: int = 1
    summary_freq: int = 50
    save_freq: int = 1
    eval_freq: int = 1


# The de-facto reference recipes (BASELINE.md) expressed as configs.
DTU_MODEL = ModelConfig(
    ndepths=(8, 8, 4, 4),
    depth_inter_r=(0.5, 0.5, 0.5, 1.0),
    group_cor=True,
    group_cor_dim=(8, 8, 4, 4),
    inverse_depth=True,
    mono=True,
    attn_temp=2.0,
)

DTU_LOSS = LossConfig(inverse_depth=True, mono=True)
