"""Building-block layers (flax linen, NHWC / NDHWC).

TPU-first re-design of the reference blocks in ``models/mvs4net_utils.py``:

- ``ConvBnReLU`` — 2D conv + BN/GN + ReLU (``mvs4net_utils.py:231-258``).
- ``ConvBnReLU3D*`` — the cost-volume conv blocks (``:123-202``). The
  reference uses ``nn.Conv3d`` with (1,3,3) kernels, i.e. per-depth-plane 2D
  convs; here the depth axis is folded into the batch so the work runs as
  dense NHWC 2D convolutions on the MXU, with the attention variants
  unfolding only for their cross-depth reductions. BatchNorm statistics over
  ``(B·D, H, W)`` equal the reference's over ``(B, D, H, W)``.

Volumes are ``[B, D, H, W, C]`` throughout.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp
from flax import linen as nn

# torch BatchNorm defaults: momentum 0.1 (=> flax momentum 0.9), eps 1e-5.
BN_MOMENTUM = 0.9
BN_EPS = 1e-5


def _norm(gn: bool, channels: int, group_channel: int = 8, dtype=jnp.float32):
    if gn:
        return nn.GroupNorm(
            num_groups=max(1, channels // group_channel), epsilon=1e-5, dtype=dtype
        )
    return nn.BatchNorm(
        momentum=BN_MOMENTUM, epsilon=BN_EPS, use_bias=True, use_scale=True,
        dtype=dtype,
    )


class ConvBnReLU(nn.Module):
    """2D conv + BatchNorm (or GroupNorm) + optional ReLU.

    Reference ``Conv2d`` wrapper (mvs4net_utils.py:231-258): bias only when
    the norm is GroupNorm (torch uses bias=(not bn)).
    """

    out_channels: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    gn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        x = nn.Conv(
            self.out_channels,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="SAME",
            use_bias=self.gn,
            dtype=self.dtype,
        )(x)
        norm = _norm(self.gn, self.out_channels, dtype=self.dtype)
        if isinstance(norm, nn.BatchNorm):
            x = norm(x, use_running_average=not train)
        else:
            x = norm(x)
        if self.relu:
            x = nn.relu(x)
        return x


def _fold_depth(x):
    """[B, D, H, W, C] -> ([B*D, H, W, C], (B, D))"""
    B, D, H, W, C = x.shape
    return x.reshape(B * D, H, W, C), (B, D)


def _unfold_depth(x, bd):
    B, D = bd
    _, H, W, C = x.shape
    return x.reshape(B, D, H, W, C)


class ConvBnReLU3D(nn.Module):
    """Cost-volume conv block on ``[B, D, H, W, C]``.

    Equivalent of reference ``ConvBnReLU3D`` (mvs4net_utils.py:123-130).
    ``kernel``/``stride`` are (depth, height, width). When the depth kernel
    and stride are 1 (reg2d's stride and boundary convs, (1,3,3)), the depth
    axis is folded into the batch and the conv runs as a dense NHWC 2D conv
    on the MXU; otherwise a true 3D conv is used (reg2d's 3x3x3 mid blocks,
    all of reg3d).
    """

    out_channels: int
    kernel: tuple = (3, 3, 3)
    stride: tuple = (1, 1, 1)
    relu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        kd, kh, kw = self.kernel
        sd, sh, sw = self.stride
        if kd == 1 and sd == 1:
            xf, bd = _fold_depth(x)
            xf = nn.Conv(
                self.out_channels, (kh, kw), strides=(sh, sw), padding="SAME",
                use_bias=False, dtype=self.dtype,
            )(xf)
            xf = nn.BatchNorm(
                momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype
            )(xf, use_running_average=not train)
            if self.relu:
                xf = nn.relu(xf)
            return _unfold_depth(xf, bd)
        x = nn.Conv(
            self.out_channels, (kd, kh, kw), strides=(sd, sh, sw), padding="SAME",
            use_bias=False, dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype
        )(x, use_running_average=not train)
        if self.relu:
            x = nn.relu(x)
        return x


class _AttnConvBase(nn.Module):
    """Shared skeleton of the residual attention conv blocks
    (reference ``ConvBnReLU3D_{CAM,DCAM,PAM,PDAM}``, mvs4net_utils.py:132-202):
    ``relu(bn(attn(conv(x)) + x))`` where attn is variant-specific."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    def _conv(self, x):
        # reference attention variants use a full 3x3x3 Conv3d
        # (mvs4net_utils.py:135,155,175,191)
        return nn.Conv(
            self.out_channels, (3, 3, 3), padding="SAME", use_bias=False,
            dtype=self.dtype,
        )(x)

    def _finish(self, x, inp, train):
        xf, bd = _fold_depth(x + inp)
        xf = nn.BatchNorm(
            momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype
        )(xf, use_running_average=not train)
        return nn.relu(_unfold_depth(xf, bd))


class _MLP(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.channels // 2, dtype=self.dtype)(x)
        x = nn.relu(x)
        return nn.Dense(self.channels, dtype=self.dtype)(x)


class ConvBnReLU3D_CAM(_AttnConvBase):
    """Channel attention: shared MLP on mean/max channel descriptors over
    (D, H, W) (mvs4net_utils.py:132-150)."""

    @nn.compact
    def __call__(self, x, *, train: bool):
        y = self._conv(x)  # [B, D, H, W, C]
        mlp = _MLP(self.out_channels, dtype=self.dtype)
        avg = mlp(y.mean(axis=(1, 2, 3)))           # [B, C]
        mx = mlp(y.max(axis=(1, 2, 3)))             # [B, C]
        attn = nn.sigmoid(avg + mx)[:, None, None, None, :]
        return self._finish(y * attn, x, train)


class ConvBnReLU3D_DCAM(_AttnConvBase):
    """Depth-channel attention: per-depth-slice channel MLP
    (mvs4net_utils.py:152-170)."""

    @nn.compact
    def __call__(self, x, *, train: bool):
        y = self._conv(x)
        mlp = _MLP(self.out_channels, dtype=self.dtype)
        avg = mlp(y.mean(axis=(2, 3)))              # [B, D, C]
        mx = mlp(y.max(axis=(2, 3)))                # [B, D, C]
        attn = nn.sigmoid(avg + mx)[:, :, None, None, :]
        return self._finish(y * attn, x, train)


class ConvBnReLU3D_PAM(_AttnConvBase):
    """Pixel attention: 7x7 conv over the (max, mean) maps reduced across
    channels-and-depth (mvs4net_utils.py:172-186)."""

    @nn.compact
    def __call__(self, x, *, train: bool):
        y = self._conv(x)                            # [B, D, H, W, C]
        mx = y.max(axis=(1, 4))                      # [B, H, W]
        avg = y.mean(axis=(1, 4))
        desc = jnp.stack([mx, avg], axis=-1)         # [B, H, W, 2]
        attn = nn.sigmoid(
            nn.Conv(1, (7, 7), padding="SAME", dtype=self.dtype)(desc)
        )  # [B, H, W, 1]
        return self._finish(y * attn[:, None], x, train)


class ConvBnReLU3D_PDAM(_AttnConvBase):
    """Pixel-depth attention: 3D 7x7x7 conv over the channel-reduced (max,
    mean) volume (mvs4net_utils.py:188-202)."""

    @nn.compact
    def __call__(self, x, *, train: bool):
        y = self._conv(x)
        mx = y.max(axis=4)                           # [B, D, H, W]
        avg = y.mean(axis=4)
        desc = jnp.stack([mx, avg], axis=-1)         # [B, D, H, W, 2]
        attn = nn.sigmoid(
            nn.Conv(1, (7, 7, 7), padding="SAME", dtype=self.dtype)(desc)
        )  # [B, D, H, W, 1]
        return self._finish(y * attn, x, train)


AGG_BLOCKS: dict[str, Callable] = {
    "ConvBnReLU3D": ConvBnReLU3D,
    "ConvBnReLU3D_CAM": ConvBnReLU3D_CAM,
    "ConvBnReLU3D_DCAM": ConvBnReLU3D_DCAM,
    "ConvBnReLU3D_PAM": ConvBnReLU3D_PAM,
    "ConvBnReLU3D_PDAM": ConvBnReLU3D_PDAM,
}


class DeconvBnReLU3D(nn.Module):
    """(1,3,3)-kernel stride-(1,2,2) transposed conv + BN + ReLU on the
    folded depth batch — exact x2 spatial upsample (reference reg2d
    up-path, mvs4net_utils.py:899-912)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        xf, bd = _fold_depth(x)
        xf = nn.ConvTranspose(
            self.out_channels, (3, 3), strides=(2, 2), padding="SAME",
            use_bias=False, dtype=self.dtype,
        )(xf)
        xf = nn.BatchNorm(
            momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype
        )(xf, use_running_average=not train)
        return nn.relu(_unfold_depth(xf, bd))


class DeconvBnReLU3D_true(nn.Module):
    """True 3D transposed conv x2 on (D, H, W) for reg3d's up-path."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        x = nn.ConvTranspose(
            self.out_channels, (3, 3, 3), strides=(2, 2, 2), padding="SAME",
            use_bias=False, dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype
        )(x, use_running_average=not train)
        return nn.relu(x)
