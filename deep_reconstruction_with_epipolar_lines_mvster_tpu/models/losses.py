"""Training losses (reference models/MVS4Net.py:195-291).

``mvs4net_loss``: per stage — optional masked L1 on the mono depth (stages
>= 2), the Sinkhorn OT loss between the attention distribution and the GT
bin, and an out-of-range diagnostic ratio; total =
``sum_s stage_lw[s] * (l1_lw * L1 + ot_lw * OT)``.

``blend_loss``: same plus EPE / <=1px / <=3px metrics normalized by the depth
range (BlendedMVS convention, reference Blend_loss MVS4Net.py:243-291).

All reductions are mask-weighted means (no boolean indexing — static shapes
under jit).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp

from ..config import LossConfig
from ..core.sinkhorn import sinkhorn_loss


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    m = mask.astype(jnp.float32)
    return (x.astype(jnp.float32) * m).sum() / jnp.maximum(m.sum(), 1.0)


def mvs4net_loss(
    outputs: Dict[str, Any],
    depth_gt_ms: Dict[str, jnp.ndarray],
    mask_ms: Dict[str, jnp.ndarray],
    cfg: LossConfig,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    total = jnp.zeros((), dtype=jnp.float32)
    aux: Dict[str, jnp.ndarray] = {}
    stage_keys = sorted(k for k in outputs if k.startswith("stage"))
    for s, key in enumerate(stage_keys):
        stage = outputs[key]
        hypo = stage["hypo_depth"]
        attn = stage["attn_weight"]
        mask = mask_ms[key] > 0.5
        gt = depth_gt_ms[key]

        if cfg.mono and s != 0 and "mono_depth" in stage:
            l1 = _masked_mean(jnp.abs(stage["mono_depth"] - gt), mask)
        else:
            l1 = jnp.zeros((), dtype=jnp.float32)

        # out-of-range diagnostic (MVS4Net.py:226-232)
        if cfg.inverse_depth:
            itv = jnp.abs(1.0 / hypo[:, 2] - 1.0 / hypo[:, 1])
            inside = (
                jnp.abs(1.0 / hypo - 1.0 / gt[:, None]) <= itv[:, None]
            ).sum(axis=1)
        else:
            itv = jnp.abs(hypo[:, 2] - hypo[:, 1])
            inside = (jnp.abs(hypo - gt[:, None]) <= itv[:, None]).sum(axis=1)
        out_of_range = (inside == 0).astype(jnp.float32)
        aux[f"s{s}_range_err_ratio"] = _masked_mean(out_of_range, mask)

        ot = sinkhorn_loss(
            gt, hypo, attn, mask,
            iters=cfg.ot_iter, eps=cfg.ot_eps, continuous=cfg.ot_continuous,
        )
        aux[f"s{s}_d_loss"] = l1
        aux[f"s{s}_c_loss"] = ot
        total = total + cfg.stage_lw[s] * (cfg.l1_lw * l1 + cfg.ot_lw * ot)
    return total, aux


def blend_loss(
    outputs: Dict[str, Any],
    depth_gt_ms: Dict[str, jnp.ndarray],
    mask_ms: Dict[str, jnp.ndarray],
    cfg: LossConfig,
    depth_min: jnp.ndarray,  # [B]
    depth_max: jnp.ndarray,  # [B]
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    total, aux = mvs4net_loss(outputs, depth_gt_ms, mask_ms, cfg)
    last = sorted(k for k in outputs if k.startswith("stage"))[-1]
    mask = mask_ms[last] > 0.5
    scale = 128.0 / (depth_max - depth_min)[:, None, None]
    abs_err = jnp.abs(outputs[last]["depth"] * scale - depth_gt_ms[last] * scale)
    aux["epe"] = _masked_mean(abs_err, mask)
    aux["err1"] = _masked_mean((abs_err <= 1.0).astype(jnp.float32), mask) * 100.0
    aux["err3"] = _masked_mean((abs_err <= 3.0).astype(jnp.float32), mask) * 100.0
    return total, aux
