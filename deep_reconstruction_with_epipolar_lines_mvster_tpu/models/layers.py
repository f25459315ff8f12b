"""Building-block layers (flax linen, NHWC).

TPU-first re-design of the reference blocks in ``models/mvs4net_utils.py``:

- ``ConvBnReLU`` — 2D conv + BN/GN + ReLU (``mvs4net_utils.py:231-258``).
- ``ConvBnReLU3D*`` — the cost-volume conv blocks (``:123-202``).

Cost volumes flow in **folded layout** ``[B*D, H, W, C]`` (depth folded into
batch). Rationale: XLA's TPU layout assignment puts the small batch axis in
the 128-lane dimension for small-channel 5-D tensors, padding them ~5x; the
folded 4-D layout keeps ``W``/``C`` minor and dense, and the reference's
(1,3,3) Conv3d kernels are exactly 2D convs over the folded batch
(BatchNorm statistics over ``(B*D, H, W)`` equal the reference's over
``(B, D, H, W)``). Blocks that genuinely mix depth (the 3x3x3 mid blocks,
reg3d) unfold via their static ``depth`` attribute at reduced resolution
only.
"""

from __future__ import annotations

from typing import Callable

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


def _unfold(x, depth):
    """[B*D, H, W, C] -> [B, D, H, W, C]"""
    N, H, W, C = x.shape
    return x.reshape(N // depth, depth, H, W, C)


def _fold(x):
    """[B, D, H, W, C] -> [B*D, H, W, C]"""
    B, D, H, W, C = x.shape
    return x.reshape(B * D, H, W, C)


class ConvBnReLU3D(nn.Module):
    """Cost-volume conv block on folded ``[B*D, H, W, C]``.

    Equivalent of reference ``ConvBnReLU3D`` (mvs4net_utils.py:123-130).
    ``kernel``/``stride`` are (depth, height, width). (1,k,k) kernels run as
    dense NHWC 2D convs on the folded batch; kernels with a depth extent
    unfold via the static ``depth`` attribute and use a true 3D conv.
    """

    out_channels: int
    kernel: tuple = (3, 3, 3)
    stride: tuple = (1, 1, 1)
    relu: bool = True
    depth: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        kd, kh, kw = self.kernel
        sd, sh, sw = self.stride
        if kd == 1 and sd == 1:
            x = nn.Conv(
                self.out_channels, (kh, kw), strides=(sh, sw), padding="SAME",
                use_bias=False, dtype=self.dtype,
            )(x)
        else:
            x = _unfold(x, self.depth)
            x = nn.Conv(
                self.out_channels, (kd, kh, kw), strides=(sd, sh, sw),
                padding="SAME", use_bias=False, dtype=self.dtype,
            )(x)
            x = _fold(x)
        x = nn.BatchNorm(
            momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype
        )(x, use_running_average=not train)
        if self.relu:
            x = nn.relu(x)
        return x


class _AttnConvBase(nn.Module):
    """Shared skeleton of the residual attention conv blocks
    (reference ``ConvBnReLU3D_{CAM,DCAM,PAM,PDAM}``, mvs4net_utils.py:132-202):
    ``relu(bn(attn(conv(x)) + x))``, folded in/out, unfolded internally for
    the 3x3x3 conv and the cross-depth reductions."""

    out_channels: int
    depth: int = 1
    dtype: jnp.dtype = jnp.float32

    def _conv5(self, x5):
        # reference attention variants use a full 3x3x3 Conv3d
        # (mvs4net_utils.py:135,155,175,191)
        return nn.Conv(
            self.out_channels, (3, 3, 3), padding="SAME", use_bias=False,
            dtype=self.dtype,
        )(x5)

    def _finish(self, y5, inp5, train):
        out = _fold(y5 + inp5)
        out = nn.BatchNorm(
            momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype
        )(out, use_running_average=not train)
        return nn.relu(out)


class ConvBnReLU3D_CAM(_AttnConvBase):
    """Channel attention: shared MLP on mean/max channel descriptors over
    (D, H, W) (mvs4net_utils.py:132-150)."""

    @nn.compact
    def __call__(self, x, *, train: bool):
        x5 = _unfold(x, self.depth)
        y = self._conv5(x5)  # [B, D, H, W, C]
        mlp = _MLP(self.out_channels, dtype=self.dtype)
        avg = mlp(y.mean(axis=(1, 2, 3)))           # [B, C]
        mx = mlp(y.max(axis=(1, 2, 3)))             # [B, C]
        attn = nn.sigmoid(avg + mx)[:, None, None, None, :]
        return self._finish(y * attn, x5, train)


class ConvBnReLU3D_DCAM(_AttnConvBase):
    """Depth-channel attention: per-depth-slice channel MLP
    (mvs4net_utils.py:152-170)."""

    @nn.compact
    def __call__(self, x, *, train: bool):
        x5 = _unfold(x, self.depth)
        y = self._conv5(x5)
        mlp = _MLP(self.out_channels, dtype=self.dtype)
        avg = mlp(y.mean(axis=(2, 3)))              # [B, D, C]
        mx = mlp(y.max(axis=(2, 3)))                # [B, D, C]
        attn = nn.sigmoid(avg + mx)[:, :, None, None, :]
        return self._finish(y * attn, x5, train)


class ConvBnReLU3D_PAM(_AttnConvBase):
    """Pixel attention: 7x7 conv over the (max, mean) maps reduced across
    channels-and-depth (mvs4net_utils.py:172-186)."""

    @nn.compact
    def __call__(self, x, *, train: bool):
        x5 = _unfold(x, self.depth)
        y = self._conv5(x5)                          # [B, D, H, W, C]
        mx = y.max(axis=(1, 4))                      # [B, H, W]
        avg = y.mean(axis=(1, 4))
        desc = jnp.stack([mx, avg], axis=-1)         # [B, H, W, 2]
        attn = nn.sigmoid(
            nn.Conv(1, (7, 7), padding="SAME", dtype=self.dtype)(desc)
        )  # [B, H, W, 1]
        return self._finish(y * attn[:, None], x5, train)


class ConvBnReLU3D_PDAM(_AttnConvBase):
    """Pixel-depth attention: 3D 7x7x7 conv over the channel-reduced (max,
    mean) volume (mvs4net_utils.py:188-202)."""

    @nn.compact
    def __call__(self, x, *, train: bool):
        x5 = _unfold(x, self.depth)
        y = self._conv5(x5)
        mx = y.max(axis=4)                           # [B, D, H, W]
        avg = y.mean(axis=4)
        desc = jnp.stack([mx, avg], axis=-1)         # [B, D, H, W, 2]
        attn = nn.sigmoid(
            nn.Conv(1, (7, 7, 7), padding="SAME", dtype=self.dtype)(desc)
        )  # [B, D, H, W, 1]
        return self._finish(y * attn, x5, train)


class _MLP(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.channels // 2, dtype=self.dtype)(x)
        x = nn.relu(x)
        return nn.Dense(self.channels, dtype=self.dtype)(x)


AGG_BLOCKS: dict[str, Callable] = {
    "ConvBnReLU3D": ConvBnReLU3D,
    "ConvBnReLU3D_CAM": ConvBnReLU3D_CAM,
    "ConvBnReLU3D_DCAM": ConvBnReLU3D_DCAM,
    "ConvBnReLU3D_PAM": ConvBnReLU3D_PAM,
    "ConvBnReLU3D_PDAM": ConvBnReLU3D_PDAM,
}


class DeconvBnReLU3D(nn.Module):
    """(1,3,3)-kernel stride-(1,2,2) transposed conv + BN + ReLU on the
    folded batch — exact x2 spatial upsample (reference reg2d up-path,
    mvs4net_utils.py:899-912)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        x = nn.ConvTranspose(
            self.out_channels, (3, 3), strides=(2, 2), padding="SAME",
            use_bias=False, dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype
        )(x, use_running_average=not train)
        return nn.relu(x)


class DeconvBnReLU3D_true(nn.Module):
    """True 3D transposed conv x2 on (D, H, W) for reg3d's up-path
    (operates on unfolded 5-D volumes)."""

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
