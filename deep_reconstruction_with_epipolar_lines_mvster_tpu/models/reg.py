"""Cost-volume regularization U-Nets (flax).

Volumes arrive FOLDED: ``[B*D, H, W, C]`` (see models/layers.py docstring for
why). ``depth`` (the static D of the stage) is only used to unfold for the
genuinely-3D pieces.

- ``Reg2D`` (reference reg2d, mvs4net_utils.py:884-926): spatial-only
  down/upsampling U-Net. Stride and boundary convs are (1,3,3) — dense NHWC
  2D convs on the MXU — while the mid blocks after each downsample are full
  3x3x3 convs selected by ``agg_type`` (the reference default
  ``ConvBnReLU3D`` or its CAM/DCAM/PAM/PDAM attention variants).
- ``Reg3D`` (reference reg3d, mvs4net_utils.py:928-979): true volumetric
  U-Net with ``down_size`` depth control (3/3/2/2 per stage).

Both emit per-hypothesis scores, folded: ``[B*D, H, W]``.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    AGG_BLOCKS,
    ConvBnReLU3D,
    DeconvBnReLU3D,
    DeconvBnReLU3D_true,
    _fold,
    _unfold,
)


def reg2d_pack_factor(W: int, base_channels: int, agg_type: str,
                      pack: bool) -> int:
    """The width-pack factor Reg2D will pick for a logical-width-``W``
    volume (1 when packing is ineligible). Callers that pre-pack the cost
    volume (stagenet ``pack_out``) MUST use this so the handoff factor and
    the U-Net's own choice agree."""
    if not (pack and agg_type == "ConvBnReLU3D" and W % 8 == 0):
        return 1
    from ..ops.packed_conv import pick_pack_levels

    return pick_pack_levels(W, base_channels, 4)[0]


class Reg2D(nn.Module):
    in_channels: int = 8     # kept for doc parity; flax infers from input
    base_channels: int = 8
    agg_type: str = "ConvBnReLU3D"
    depth: int = 1           # static D for the 3x3x3 mid blocks
    pack: bool = False       # width-packed conv execution (math-identical;
                             # ops/packed_conv.py — ~5x faster on TPU at the
                             # full-res stages; plain ConvBnReLU3D mid
                             # blocks only)
    prepacked_k: int = 1     # input arrives ALREADY width-packed by this
                             # factor ([N, H, W/k, k*C] — the aggregate's
                             # pack_out); must equal the k0 this module
                             # would pick for the logical width
    d_pack_mids: bool = False  # opt-in depth-in-channels 3x3x3 mids
                             # (config.ModelConfig.d_pack_mids rationale)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        from ..ops.packed_conv import pack_w, unpack_w

        b = self.base_channels
        mid = AGG_BLOCKS[self.agg_type]
        k133 = dict(kernel=(1, 3, 3))
        s122 = dict(kernel=(1, 3, 3), stride=(1, 2, 2))
        d = self.depth

        W_log = x.shape[-2] * self.prepacked_k
        # 8 | W required by the three stride-2 levels (as for the unpacked
        # U-Net's residual adds); fall back to unpacked execution otherwise
        if (
            (self.pack or self.prepacked_k > 1)
            and self.agg_type == "ConvBnReLU3D"
            and W_log % 8 == 0
        ):
            from ..ops.packed_conv import pick_pack_levels

            k0, k1, k2, k3 = pick_pack_levels(W_log, b, 4)
        else:
            k0 = k1 = k2 = k3 = 1
        if self.prepacked_k > 1 and k0 != self.prepacked_k:
            raise ValueError(
                f"prepacked_k={self.prepacked_k} but Reg2D picks k0={k0} "
                f"for W={W_log} (caller must use models.reg.reg2d_pack_factor)"
            )

        def mk_mid(ch, k, lvl):
            kw = dict(depth=d, dtype=self.dtype)
            if k > 1:  # only plain ConvBnReLU3D has pack attrs (guard above)
                kw.update(k_in=k, k_out=k)
            if (self.d_pack_mids and k0 > 1 and d > 1
                    and self.agg_type == "ConvBnReLU3D"):
                # depth-in-channels execution of the 3x3x3 mid when it has
                # lower paper FLOPs than the width-packed path (D*C fills
                # the MXU lanes at 1.3-2.7x inflation vs 2-8x;
                # ops/packed_conv.py mid_pack_plan)
                from ..ops.packed_conv import mid_pack_plan

                kp = mid_pack_plan(W_log >> lvl, ch, d, k)
                if kp:
                    kw.update(d_pack=kp)
            return mid(ch, **kw)

        xp = x if self.prepacked_k > 1 else pack_w(x, k0)
        conv0 = ConvBnReLU3D(
            b, dtype=self.dtype, k_in=k0, k_out=k0, **k133
        )(xp, train=train)
        conv2 = mk_mid(2 * b, k1, 1)(
            ConvBnReLU3D(
                2 * b, dtype=self.dtype, k_in=k0, k_out=k1, **s122
            )(conv0, train=train),
            train=train,
        )
        conv4 = mk_mid(4 * b, k2, 2)(
            ConvBnReLU3D(
                4 * b, dtype=self.dtype, k_in=k1, k_out=k2, **s122
            )(conv2, train=train),
            train=train,
        )
        x = mk_mid(8 * b, k3, 3)(
            ConvBnReLU3D(
                8 * b, dtype=self.dtype, k_in=k2, k_out=k3, **s122
            )(conv4, train=train),
            train=train,
        )
        x = conv4 + DeconvBnReLU3D(
            4 * b, k_in=k3, k_out=k2, dtype=self.dtype
        )(x, train=train)
        x = conv2 + DeconvBnReLU3D(
            2 * b, k_in=k2, k_out=k1, dtype=self.dtype
        )(x, train=train)
        x = conv0 + DeconvBnReLU3D(
            b, k_in=k1, k_out=k0, dtype=self.dtype
        )(x, train=train)
        # final 1x1 conv to a single score per hypothesis
        # (reference: self.prob = nn.Conv3d(8, 1, 1), mvs4net_utils.py:914)
        if k0 > 1:
            from .layers import _PackedConvND

            score = _PackedConvND(
                1, (1, 1), (1, 1), (0, 0), k_in=k0, k_out=k0, use_bias=True,
                dtype=self.dtype, name="Conv_0",
            )(x)
            score = unpack_w(score, k0)
        else:
            score = nn.Conv(1, (1, 1), padding="VALID", dtype=self.dtype)(x)
        return score[..., 0]  # [B*D, H, W]


class Reg3D(nn.Module):
    base_channels: int = 8
    down_size: int = 3
    depth: int = 1
    pack: bool = False       # width-packed conv execution (ops/packed_conv.py)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        from ..ops.packed_conv import pack_w, unpack_w

        b = self.base_channels
        dt = self.dtype

        nlv = self.down_size + 1
        W = x.shape[-2]
        if self.pack and W % (1 << self.down_size) == 0 and self.depth % (
            1 << self.down_size
        ) == 0:
            from ..ops.packed_conv import pick_pack_levels

            ks = pick_pack_levels(W, b, nlv)
        else:
            ks = [1] * nlv
        ks += [1] * (4 - len(ks))
        k0, k1, k2, k3 = ks[:4]

        x5 = _unfold(pack_w(x, k0), self.depth)
        conv0 = _C3(b, 1, dt, k_in=k0, k_out=k0)(x5, train)
        conv2 = _C3(2 * b, 1, dt, k_in=k1, k_out=k1)(
            _C3(2 * b, 2, dt, k_in=k0, k_out=k1)(conv0, train), train
        )
        if self.down_size == 3:
            conv4 = _C3(4 * b, 1, dt, k_in=k2, k_out=k2)(
                _C3(4 * b, 2, dt, k_in=k1, k_out=k2)(conv2, train), train
            )
            y = _C3(8 * b, 1, dt, k_in=k3, k_out=k3)(
                _C3(8 * b, 2, dt, k_in=k2, k_out=k3)(conv4, train), train
            )
            y = conv4 + DeconvBnReLU3D_true(
                4 * b, k_in=k3, k_out=k2, dtype=dt
            )(y, train=train)
            y = conv2 + DeconvBnReLU3D_true(
                2 * b, k_in=k2, k_out=k1, dtype=dt
            )(y, train=train)
            y = conv0 + DeconvBnReLU3D_true(
                b, k_in=k1, k_out=k0, dtype=dt
            )(y, train=train)
        elif self.down_size == 2:
            y = _C3(4 * b, 1, dt, k_in=k2, k_out=k2)(
                _C3(4 * b, 2, dt, k_in=k1, k_out=k2)(conv2, train), train
            )
            y = conv2 + DeconvBnReLU3D_true(
                2 * b, k_in=k2, k_out=k1, dtype=dt
            )(y, train=train)
            y = conv0 + DeconvBnReLU3D_true(
                b, k_in=k1, k_out=k0, dtype=dt
            )(y, train=train)
        else:
            y = conv0 + DeconvBnReLU3D_true(
                b, k_in=k1, k_out=k0, dtype=dt
            )(conv2, train=train)
        if k0 > 1:
            from .layers import _PackedConvND

            score = _PackedConvND(
                1, (3, 3, 3), (1, 1, 1), (1, 1, 1), k_in=k0, k_out=k0,
                dtype=dt, name="Conv_0",
            )(y)
            score = unpack_w(score, k0)
        else:
            score = nn.Conv(
                1, (3, 3, 3), padding="SAME", use_bias=False, dtype=dt
            )(y)
        return _fold(score)[..., 0]  # [B*D, H, W]


class _C3(nn.Module):
    """3x3x3 conv + BN + ReLU on 5-D volumes (reg3d building block)."""

    out_channels: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    k_in: int = 1            # width-pack factors (ops/packed_conv.py)
    k_out: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        from .layers import BN_EPS, BN_MOMENTUM, TorchBatchNorm, _PackedConvND

        # torch-style symmetric pad=1 (SAME mismatches at stride 2)
        if self.k_in > 1 or self.k_out > 1:
            x = _PackedConvND(
                self.out_channels, (3, 3, 3), (self.stride,) * 3, (1, 1, 1),
                k_in=self.k_in, k_out=self.k_out, dtype=self.dtype,
                name="Conv_0",
            )(x)
        else:
            x = nn.Conv(
                self.out_channels, (3, 3, 3), strides=(self.stride,) * 3,
                padding=((1, 1),) * 3, use_bias=False, dtype=self.dtype,
            )(x)
        x = TorchBatchNorm(
            momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype,
            name="BatchNorm_0",
        )(x, use_running_average=not train, pack=self.k_out)
        return nn.relu(x)
