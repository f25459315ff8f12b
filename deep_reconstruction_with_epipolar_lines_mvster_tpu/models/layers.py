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

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# torch BatchNorm defaults: momentum 0.1 (=> flax momentum 0.9), eps 1e-5.
BN_MOMENTUM = 0.9
BN_EPS = 1e-5


class TorchBatchNorm(nn.Module):
    """BatchNorm with exact torch ``_BatchNorm`` train semantics.

    Differences from ``nn.BatchNorm`` (both matter for parity with the
    reference, verified in tests/test_torch_parity.py):

    - the running-var update uses the UNBIASED batch variance (torch
      normalizes with the biased one but accumulates ``n/(n-1)`` corrected
      stats; flax accumulates biased),
    - ``groups`` > 1 computes/applies train-mode statistics per contiguous
      batch group. The reference loops its FPN once per view
      (``MVS4Net.py:78-80``), so each view is normalized by its OWN batch
      stats and the running stats receive V sequential momentum updates; this
      module reproduces that on the view-folded ``[B*V, H, W, C]`` layout
      (fold index ``b*V + v``) in one pass — the sequential update has the
      closed form ``m^G r + (1-m) Σ_v m^(G-1-v) s_v``.

    Variable names/collections match ``nn.BatchNorm`` (params scale/bias,
    batch_stats mean/var) so checkpoints and the torch transplant are
    layout-compatible.
    """

    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x, *, use_running_average: bool, groups: int = 1, pack: int = 1
    ):
        """``pack`` > 1: x is width-packed ``[..., Wq, pack*C]``
        (ops/packed_conv.py) — parameters and statistics stay per LOGICAL
        channel C, the pack axis is treated as extra spatial extent."""
        C = x.shape[-1] // pack
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((C,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((C,), jnp.float32)
        )

        # pack split as an extra spatial axis ([..., Wq, pack, C])
        xf = x.astype(jnp.float32).reshape(*x.shape[:-1], pack, C)
        if use_running_average:
            y = (xf - ra_mean.value) * jax.lax.rsqrt(ra_var.value + self.epsilon)
        else:
            G = groups
            N = x.shape[0]
            assert N % G == 0, f"batch {N} not divisible by view groups {G}"
            spatial = xf.shape[1:-1]
            xg = xf.reshape(N // G, G, *spatial, C)
            red = (0,) + tuple(range(2, 2 + len(spatial)))  # all but (group, C)
            mean = xg.mean(axis=red)                         # [G, C]
            var = jnp.square(xg - _gbc(mean, xg.ndim)).mean(axis=red)
            y = (xg - _gbc(mean, xg.ndim)) * jax.lax.rsqrt(
                _gbc(var, xg.ndim) + self.epsilon
            )
            y = y.reshape(xf.shape)
            if not self.is_initializing():
                n = (N // G) * int(np.prod(spatial)) if spatial else N // G
                var_unb = var * (n / max(n - 1, 1))
                m = self.momentum
                w = m ** jnp.arange(G - 1, -1, -1, dtype=jnp.float32)  # [G]
                ra_mean.value = m**G * ra_mean.value + (1 - m) * (
                    w[:, None] * mean
                ).sum(0)
                ra_var.value = m**G * ra_var.value + (1 - m) * (
                    w[:, None] * var_unb
                ).sum(0)
        y = y * scale + bias
        return y.reshape(x.shape).astype(self.dtype)


def _gbc(stat, ndim):
    """Broadcast a [G, C] per-group stat over [B, G, *spatial, C]."""
    return stat[None, :, *(None,) * (ndim - 3), :]


class _PackedConvND(nn.Module):
    """Conv on width-packed activations (ops/packed_conv.py) with the
    parameter tree of ``nn.Conv`` (param "kernel" in the LOGICAL shape
    ``(*kernel_size, Ci, features)``, optional "bias") — instantiated with
    ``name="Conv_0"`` it is checkpoint-interchangeable with the unpacked
    block, only the execution layout differs."""

    features: int
    kernel_size: tuple       # logical spatial extents, width LAST
    strides: tuple
    pads: tuple              # symmetric torch-style pads per spatial dim
    k_in: int
    k_out: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xp):
        from ..ops.packed_conv import packed_conv_w

        Ci = xp.shape[-1] // self.k_in
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel_size, Ci, self.features),
            jnp.float32,
        )
        y = packed_conv_w(
            xp.astype(self.dtype),
            kernel.astype(self.dtype),
            strides=tuple(self.strides),
            pads=tuple(self.pads),
            k_in=self.k_in,
            k_out=self.k_out,
            W=xp.shape[-2] * self.k_in,
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + jnp.tile(bias, self.k_out).astype(self.dtype)
        return y


class _DepthPackedConv3D(nn.Module):
    """Stride-1 3x3x3 conv executed DEPTH-IN-CHANNELS (ops/packed_conv.py
    ``depth_band_kernel``): the folded width-packed activation
    ``[B*D, H, Wq, k_in*C]`` is relaid to ``[B, H, W/kp, kp*D*C]`` and the
    depth taps become a block-banded dense channel contraction — at the
    mid-block depths (D = 4-8) that is 1.3-2.7x paper FLOPs vs the 2-8x
    the width-packed 3-D conv pays (see ``mid_pack_plan``). Parameter tree
    of ``nn.Conv`` (param "kernel" in the LOGICAL shape (3, 3, 3, Ci, Co))
    — checkpoint-interchangeable with the other execution layouts."""

    features: int
    depth: int
    kp: int                  # width-pack factor of the depth-packed layout
    k_in: int                # width-pack factors of the folded in/out
    k_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xp):
        from ..ops.packed_conv import (
            depth_band_kernel,
            pack_w,
            packed_conv_w,
            unpack_w,
        )

        D = self.depth
        Ci = xp.shape[-1] // self.k_in
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, 3, Ci, self.features),
            jnp.float32,
        )
        Kd = depth_band_kernel(kernel, D).astype(self.dtype)

        x = unpack_w(xp, self.k_in)                 # [B*D, H, W, Ci]
        x = _unfold(x, D)                           # [B, D, H, W, Ci]
        x = jnp.transpose(x, (0, 2, 3, 1, 4))       # [B, H, W, D, Ci]
        B_, H_, W_, _, _ = x.shape
        x = x.reshape(B_, H_, W_, D * Ci).astype(self.dtype)
        if self.kp > 1:
            y = packed_conv_w(
                pack_w(x, self.kp), Kd, strides=(1, 1), pads=(1, 1),
                k_in=self.kp, k_out=self.kp, W=W_,
            )
            y = unpack_w(y, self.kp)
        else:
            y = jax.lax.conv_general_dilated(
                x, Kd, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        y = y.reshape(B_, H_, W_, D, self.features)
        y = jnp.transpose(y, (0, 3, 1, 2, 4))       # [B, D, H, W, Co]
        return pack_w(_fold(y), self.k_out)


class _PackedDeconv2x(nn.Module):
    """x2 spatial transposed conv (k=3, s=2, torch p=1/out_p=1) on
    width-packed activations — parameter tree of ``nn.ConvTranspose``
    (param "kernel" ``(3, 3, Ci, features)``). The logical
    ``lhs_dilation`` is materialized by :func:`zero_stuff` (data at even
    indices, length 2L), after which the op is an ordinary stride-1 packed
    conv with symmetric pad 1 — verified equal to the flax layer in
    tests/test_packed_conv.py."""

    features: int
    k_in: int
    k_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xp):
        from ..ops.packed_conv import (
            pack_w,
            packed_conv_w,
            unpack_w,
            zero_stuff,
        )

        Ci = xp.shape[-1] // self.k_in
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, Ci, self.features),
            jnp.float32,
        )
        x = unpack_w(xp, self.k_in)            # [N, H, W, C]
        x = zero_stuff(x.astype(self.dtype), axes=(1, 2))  # [N, 2H, 2W, C]
        W2 = x.shape[-2]
        x = pack_w(x, self.k_out)
        return packed_conv_w(
            x,
            kernel.astype(self.dtype),
            strides=(1, 1),
            pads=(1, 1),
            k_in=self.k_out,
            k_out=self.k_out,
            W=W2,
        )


class _PackedDeconv2x3D(nn.Module):
    """x2 (D, H, W) transposed conv (k=3, s=2, torch p=1/out_p=1) on
    width-packed 5-D volumes — parameter tree of ``nn.ConvTranspose``
    (param "kernel" ``(3, 3, 3, Ci, features)``). Same zero-stuff +
    stride-1 packed conv construction as :class:`_PackedDeconv2x`."""

    features: int
    k_in: int
    k_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xp):
        from ..ops.packed_conv import (
            pack_w,
            packed_conv_w,
            unpack_w,
            zero_stuff,
        )

        Ci = xp.shape[-1] // self.k_in
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, 3, Ci, self.features),
            jnp.float32,
        )
        x = unpack_w(xp, self.k_in)
        x = zero_stuff(x.astype(self.dtype), axes=(1, 2, 3))
        W2 = x.shape[-2]
        x = pack_w(x, self.k_out)
        return packed_conv_w(
            x,
            kernel.astype(self.dtype),
            strides=(1, 1, 1),
            pads=(1, 1, 1),
            k_in=self.k_out,
            k_out=self.k_out,
            W=W2,
        )


def _norm(gn: bool, channels: int, group_channel: int = 8, dtype=jnp.float32):
    if gn:
        return nn.GroupNorm(
            num_groups=max(1, channels // group_channel), epsilon=1e-5, dtype=dtype
        )
    return TorchBatchNorm(
        momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=dtype, name="BatchNorm_0"
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
    view_groups: int = 1
    k_in: int = 1            # width-pack factors (ops/packed_conv.py);
    k_out: int = 1           # 1/1 = ordinary unpacked execution
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        # explicit symmetric k//2 padding, NOT "SAME": identical for stride 1,
        # but at stride 2 XLA SAME pads asymmetrically (lo=k//2-1) while the
        # reference pads k//2 on both sides (mvs4net_utils.py:439 pad=2) —
        # verified numerically, SAME diverges on every stride-2 conv.
        p = self.kernel // 2
        if self.k_in > 1 or self.k_out > 1:
            assert not self.gn, "packed execution supports BatchNorm only"
            x = _PackedConvND(
                self.out_channels, (self.kernel, self.kernel),
                (self.stride, self.stride), (p, p),
                k_in=self.k_in, k_out=self.k_out, use_bias=False,
                dtype=self.dtype, name="Conv_0",
            )(x)
        else:
            x = nn.Conv(
                self.out_channels,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=((p, p), (p, p)),
                use_bias=self.gn,
                dtype=self.dtype,
            )(x)
        norm = _norm(self.gn, self.out_channels, dtype=self.dtype)
        if isinstance(norm, TorchBatchNorm):
            x = norm(
                x, use_running_average=not train, groups=self.view_groups,
                pack=self.k_out,
            )
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
    k_in: int = 1            # width-pack factors (ops/packed_conv.py)
    k_out: int = 1
    d_pack: int = 0          # > 0: execute a stride-1 3x3x3 kernel
                             # depth-in-channels with this width factor
                             # (_DepthPackedConv3D; ops/packed_conv.py
                             # mid_pack_plan picks it)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        kd, kh, kw = self.kernel
        sd, sh, sw = self.stride
        # torch-style symmetric k//2 padding (reference pad=(0,1,1) etc.);
        # XLA SAME differs on stride-2 convs — see ConvBnReLU.
        ph, pw = kh // 2, kw // 2
        packed = self.k_in > 1 or self.k_out > 1
        if (
            self.d_pack and self.depth > 1
            and self.kernel == (3, 3, 3) and (sd, sh, sw) == (1, 1, 1)
        ):
            x = _DepthPackedConv3D(
                self.out_channels, depth=self.depth, kp=self.d_pack,
                k_in=self.k_in, k_out=self.k_out, dtype=self.dtype,
                name="Conv_0",
            )(x)
        elif kd == 1 and sd == 1:
            if packed:
                x = _PackedConvND(
                    self.out_channels, (kh, kw), (sh, sw), (ph, pw),
                    k_in=self.k_in, k_out=self.k_out, dtype=self.dtype,
                    name="Conv_0",
                )(x)
            else:
                x = nn.Conv(
                    self.out_channels, (kh, kw), strides=(sh, sw),
                    padding=((ph, ph), (pw, pw)), use_bias=False,
                    dtype=self.dtype,
                )(x)
        else:
            pd = kd // 2
            x = _unfold(x, self.depth)
            if packed:
                x = _PackedConvND(
                    self.out_channels, (kd, kh, kw), (sd, sh, sw),
                    (pd, ph, pw), k_in=self.k_in, k_out=self.k_out,
                    dtype=self.dtype, name="Conv_0",
                )(x)
            else:
                x = nn.Conv(
                    self.out_channels, (kd, kh, kw), strides=(sd, sh, sw),
                    padding=((pd, pd), (ph, ph), (pw, pw)), use_bias=False,
                    dtype=self.dtype,
                )(x)
            x = _fold(x)
        x = TorchBatchNorm(
            momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype,
            name="BatchNorm_0",
        )(x, use_running_average=not train, pack=self.k_out)
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
        out = TorchBatchNorm(
            momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype,
            name="BatchNorm_0",
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
    k_in: int = 1            # width-pack factors (ops/packed_conv.py)
    k_out: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        # padding (1,2): equals torch ConvTranspose(k=3, s=2, p=1, out_p=1)
        # (reference reg2d up path, mvs4net_utils.py:900-912) up to a spatial
        # kernel flip — exact x2 upsample; verified numerically (flax SAME is
        # a different boundary function).
        if self.k_in > 1 or self.k_out > 1:
            x = _PackedDeconv2x(
                self.out_channels, k_in=self.k_in, k_out=self.k_out,
                dtype=self.dtype, name="ConvTranspose_0",
            )(x)
        else:
            x = nn.ConvTranspose(
                self.out_channels, (3, 3), strides=(2, 2),
                padding=((1, 2), (1, 2)), use_bias=False, dtype=self.dtype,
            )(x)
        x = TorchBatchNorm(
            momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype,
            name="BatchNorm_0",
        )(x, use_running_average=not train, pack=self.k_out)
        return nn.relu(x)


class DeconvBnReLU3D_true(nn.Module):
    """True 3D transposed conv x2 on (D, H, W) for reg3d's up-path
    (operates on unfolded 5-D volumes)."""

    out_channels: int
    k_in: int = 1            # width-pack factors (ops/packed_conv.py)
    k_out: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        if self.k_in > 1 or self.k_out > 1:
            x = _PackedDeconv2x3D(
                self.out_channels, k_in=self.k_in, k_out=self.k_out,
                dtype=self.dtype, name="ConvTranspose_0",
            )(x)
        else:
            x = nn.ConvTranspose(
                self.out_channels, (3, 3, 3), strides=(2, 2, 2),
                padding=((1, 2), (1, 2), (1, 2)), use_bias=False,
                dtype=self.dtype,
            )(x)
        x = TorchBatchNorm(
            momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype,
            name="BatchNorm_0",
        )(x, use_running_average=not train, pack=self.k_out)
        return nn.relu(x)
