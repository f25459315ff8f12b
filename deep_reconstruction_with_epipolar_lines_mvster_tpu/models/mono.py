"""Auxiliary monocular depth decoder.

Reference ``mono_depth_decoder`` (mvs4net_utils.py:840-882): for stages 1-3,
conv the stage's reference-view features, x2 upsample, concat with the next
stage's features, 3x3 conv to a sigmoid disparity scaled into
[1/d_max, 1/d_min], inverted to a depth map attached to stages 2-4. Used at
train time only (MVS4Net.py:179-181) to regularize the FPN features with an
L1 loss.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..core.geometry import resize_align_corners, upsample_nearest_2x
from .layers import ConvBnReLU


class MonoDepthDecoder(nn.Module):
    """Input: per-stage reference features (coarse->fine), the depth range.

    Returns mono depth maps for stages 2..num_stages (list of ``[B, H, W]``).
    """

    interp: str = "nearest"  # 'nearest' | 'bilinear' (reference mono_stg_itrpl)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        mono_feats: Sequence[jnp.ndarray],  # [B, h_i, w_i, C_i] for each stage
        d_min: jnp.ndarray,                 # [B]
        d_max: jnp.ndarray,                 # [B]
        *,
        train: bool,
    ):
        out = []
        for i in range(len(mono_feats) - 1):
            small = mono_feats[i]
            large = mono_feats[i + 1]
            ch = large.shape[-1]
            small = ConvBnReLU(ch, 3, dtype=self.dtype)(small, train=train)
            if self.interp == "nearest":
                small = upsample_nearest_2x(small)
            else:
                H, W = large.shape[1:3]
                small = resize_align_corners(small, (H, W))
            feat = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype)(
                jnp.concatenate([small, large], axis=-1)
            )
            disp = nn.sigmoid(feat)[..., 0]  # [B, H, W]
            min_disp = (1.0 / d_max)[:, None, None]
            max_disp = (1.0 / d_min)[:, None, None]
            scaled = min_disp + (max_disp - min_disp) * disp
            out.append(1.0 / scaled)
        return out
