"""Feature pyramid backbones + ASFF fusion (flax, NHWC).

Reimplements the reference backbones:

- ``FPN4`` (mvs4net_utils.py:426-509): 4-scale FPN, stride-2 5x5 stem convs,
  1x1 laterals into an 8b-channel top-down path with bilinear
  align_corners=True x2 upsampling, per-scale output heads
  (8b, 4b, 2b, b channels at 1/8, 1/4, 1/2, 1/1 resolution).
- ``FPN4_convnext`` / ``FPN4_convnext4`` (mvs4net_utils.py:533-728):
  ConvNeXt-style stages (depthwise 7x7 + LN + pointwise MLP with layer scale).
- ``ASFF`` (mvs4net_utils.py:730-812): adaptive per-stage fusion of all four
  pyramid levels with a learned softmax blend.
- ``DeformConv2d``: DCN v1 (offsets; optional v2 modulation) built on the
  shared grid-sample gather — TPU equivalent of the external CUDA
  ``DeformConvPack`` the reference imports for ``--dcn``
  (mvs4net_utils.py:410-424); transplant-mapped in utils/torch_port.py.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.geometry import grid_sample_2d, resize_align_corners, upsample_nearest_2x
from .layers import BN_EPS, BN_MOMENTUM, ConvBnReLU, TorchBatchNorm


class DeformConv2d(nn.Module):
    """Deformable conv (3x3, stride 1) via 9 bilinear gathers.

    Matches the external CUDA ``DeformConvPack`` the reference's ``--dcn``
    path uses (DCN v1, NA_DCN construction at mvs4net_utils.py:410-424):
    the offset conv (3x3, zero-init, channel layout ``(dy, dx)`` per tap,
    taps row-major) predicts per-tap displacements, each tap is bilinearly
    sampled with zeros outside the image, and the taps contract against the
    3x3 weight — expressed here as a 1x1 conv over the tap-major-stacked
    samples, which is the identical linear map in MXU-friendly form. The
    offset conv starts at zero so the initial function is a plain 3x3 conv.

    ``modulated=True`` adds the DCNv2 sigmoid modulation branch (the
    reference's *unused* hand-rolled ``DeformConv2d``, mvs4net_utils.py:
    274-408, is modulated; its active ``DeformConvPack`` is not).
    """

    out_channels: int
    kernel: int = 3
    modulated: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        k = self.kernel
        n = k * k
        offsets = nn.Conv(
            2 * n, (3, 3), padding="SAME", dtype=self.dtype,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
        )(x)  # [B, H, W, 2n] — (dy, dx) per tap
        if self.modulated:
            modulation = nn.sigmoid(
                nn.Conv(
                    n, (3, 3), padding="SAME", dtype=self.dtype,
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros,
                )(x)
            )  # [B, H, W, n]

        ys = jnp.arange(H, dtype=jnp.float32)
        xs = jnp.arange(W, dtype=jnp.float32)
        gx, gy = jnp.meshgrid(xs, ys, indexing="xy")  # [H, W]

        taps = []
        half = (k - 1) // 2
        t = 0
        for dy in range(-half, half + 1):
            for dx in range(-half, half + 1):
                px = gx[None] + dx + offsets[..., 2 * t + 1]
                py = gy[None] + dy + offsets[..., 2 * t]
                coords = jnp.stack([px, py], axis=-1)  # [B, H, W, 2]
                sampled = grid_sample_2d(x, coords)     # [B, H, W, C]
                if self.modulated:
                    sampled = sampled * modulation[..., t : t + 1]
                taps.append(sampled)
                t += 1
        stacked = jnp.concatenate(taps, axis=-1)  # [B, H, W, n*C] tap-major
        return nn.Conv(
            self.out_channels, (1, 1), use_bias=False, dtype=self.dtype
        )(stacked)


class NADCN(nn.Module):
    """Norm + ReLU + deformable conv head (reference NA_DCN,
    mvs4net_utils.py:410-424)."""

    channels: int
    gn: bool = False
    view_groups: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        if self.gn:
            x = nn.GroupNorm(
                num_groups=max(1, self.channels // 8), epsilon=1e-5, dtype=self.dtype
            )(x)
        else:
            x = TorchBatchNorm(
                momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype,
                name="BatchNorm_0",
            )(x, use_running_average=not train, groups=self.view_groups)
        x = nn.relu(x)
        return DeformConv2d(self.channels, dtype=self.dtype)(x)


class _ConvParams(nn.Module):
    """Parameter holder with ``nn.Conv``'s tree (kernel [+ bias]) for convs
    executed by a fused kernel instead of ``nn.Conv.__call__`` — instantiated
    with the name the conv would auto-receive, so checkpoints and the torch
    transplant see an identical tree."""

    kernel_shape: tuple
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), self.kernel_shape,
            jnp.float32,
        )
        b = (
            self.param(
                "bias", nn.initializers.zeros, (self.kernel_shape[-1],),
                jnp.float32,
            )
            if self.use_bias
            else None
        )
        return k, b


class _TopDown(nn.Module):
    """Shared FPN top-down pathway + output heads + optional DCN heads.

    ``fuse_final``: run the full-resolution level
    ``out4(up2(intra) + inner3(conv0))`` through the fused Pallas kernel
    (ops/pallas/topdown_fused.py) — the unfused chain materializes three
    full-res 64-channel tensors in HBM and dominates eval FPN time. Values
    identical up to f32 accumulation order; differentiable (the kernel's
    custom VJP rematerializes the unfused chain for the backward), so the
    fused forward also serves the train step.
    """

    base: int
    gn: bool
    dcn: bool
    view_groups: int = 1
    fuse_final: bool = False
    fuse_chain: bool = True
    cw_request: tuple = (False, False, False)  # (o2, o3, o4): emit that
                             # output CHANNELS-IN-SUBLANES [N, H, C, Wp]
                             # (zero lane pad) — only honored on the
                             # fully-fused chain branch (callers predict
                             # availability with topdown_chain_active and
                             # gate on eval; see topdown_fused_chain)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, conv0, conv1, conv2, conv3, *, train: bool):
        b = self.base
        final = 8 * b

        from ..ops.pallas.topdown_fused import level_fusable

        def lvl_fusable(skip_t, hh, wh):
            # geometry constraints live with the kernel (single source of
            # truth); final==64 additionally pins the bench-validated shape
            return (
                self.fuse_final
                and final == 64
                and level_fusable(skip_t.shape, (hh, wh), final)
            )

        fz2 = lvl_fusable(conv2, conv3.shape[1], conv3.shape[2])
        fz3 = lvl_fusable(conv1, conv2.shape[1], conv2.shape[2])
        fz4 = lvl_fusable(conv0, conv1.shape[1], conv1.shape[2])

        def mk_inner(name, skip_t, fz):
            if fz:
                return _ConvParams((1, 1, skip_t.shape[-1], final), name=name)
            return nn.Conv(final, (1, 1), use_bias=True, dtype=self.dtype,
                           name=name)

        def mk_out(name, ch, fz):
            if fz:
                return _ConvParams((3, 3, final, ch), use_bias=False,
                                   name=name)
            return nn.Conv(ch, (3, 3), padding="SAME", use_bias=False,
                           dtype=self.dtype, name=name)

        inner1 = mk_inner("Conv_0", conv2, fz2)
        inner2 = mk_inner("Conv_1", conv1, fz3)
        inner3 = mk_inner("Conv_2", conv0, fz4)
        out1 = nn.Conv(8 * b, (1, 1), use_bias=False, dtype=self.dtype,
                       name="Conv_3")
        out2 = mk_out("Conv_4", 4 * b, fz2)
        out3 = mk_out("Conv_5", 2 * b, fz3)
        out4 = mk_out("Conv_6", b, fz4)

        def up2(x):
            H, W = x.shape[1:3]
            return resize_align_corners(x, (2 * H, 2 * W))

        interpret = jax.default_backend() not in ("tpu", "axon")

        def fused_level(intra, skip_t, inner, out, with_u):
            from ..ops.pallas.topdown_fused import topdown_fused_level

            ki, bi = inner()
            ko, _ = out()
            return topdown_fused_level(
                intra.astype(self.dtype), skip_t.astype(self.dtype),
                ki.astype(self.dtype), bi, ko.astype(self.dtype),
                interpret=interpret, with_u=with_u,
            )

        intra = conv3
        o1 = out1(intra)
        if fz2 and fz3 and fz4 and self.fuse_chain:
            # fully-fused cascade: the inter-level pathway stays in the
            # kernel's channels-in-sublanes layout (no transpose copies)
            from ..ops.pallas.topdown_fused import topdown_fused_chain

            def w3(inner, out):
                ki, bi = inner()
                ko, _ = out()
                return (ki.astype(self.dtype), bi, ko.astype(self.dtype))

            o2, o3, o4 = topdown_fused_chain(
                intra.astype(self.dtype),
                (conv2.astype(self.dtype), conv1.astype(self.dtype),
                 conv0.astype(self.dtype)),
                (w3(inner1, out2), w3(inner2, out3), w3(inner3, out4)),
                interpret=interpret,
                o_cw=None if train else self.cw_request,
            )
        else:
            if fz2:
                o2, intra = fused_level(intra, conv2, inner1, out2, True)
            else:
                intra = up2(intra) + inner1(conv2)
                o2 = out2(intra)
            if fz3:
                o3, intra = fused_level(intra, conv1, inner2, out3, True)
            else:
                intra = up2(intra) + inner2(conv1)
                o3 = out3(intra)
            if fz4:
                o4 = fused_level(intra, conv0, inner3, out4, False)
            else:
                intra = up2(intra) + inner3(conv0)
                o4 = out4(intra)

        if self.dcn:
            vg = self.view_groups
            o1 = NADCN(8 * b, gn=self.gn, view_groups=vg, dtype=self.dtype)(o1, train=train)
            o2 = NADCN(4 * b, gn=self.gn, view_groups=vg, dtype=self.dtype)(o2, train=train)
            o3 = NADCN(2 * b, gn=self.gn, view_groups=vg, dtype=self.dtype)(o3, train=train)
            o4 = NADCN(b, gn=self.gn, view_groups=vg, dtype=self.dtype)(o4, train=train)
        # stage1 = coarsest (1/8), stage4 = full res — reference key order
        return (o1, o2, o3, o4)


class FPN4(nn.Module):
    """4-scale FPN backbone (reference FPN4, mvs4net_utils.py:426-509)."""

    base: int = 8
    gn: bool = False
    dcn: bool = False
    # train-mode BN statistics per view group on the view-folded batch
    # (the reference runs the FPN once per view, MVS4Net.py:78-80)
    view_groups: int = 1
    pack: bool = False       # width-packed stem execution (math-identical;
                             # ops/packed_conv.py — the C=8..16 full/half-res
                             # stem convs are ~5x off roofline unpacked).
                             # BatchNorm stems only (gn unsupported).
    fuse_topdown: bool = False  # fused Pallas top-down levels
                             # (ops/pallas/topdown_fused.py; differentiable)
    fuse_chain: bool = True  # chain all fused levels (CW hand-off)
    cw_request: tuple = (False, False, False)  # _TopDown.cw_request
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        from ..ops.packed_conv import pack_w, unpack_w

        b = self.base

        # the level-width halving below assumes 8 | W (the stem's three
        # stride-2 convs; also what the top-down residual adds require of
        # any input this network can process) — fall back to unpacked
        # execution otherwise rather than mis-sizing the factors
        if self.pack and not self.gn and x.shape[2] % 8 == 0:
            from ..ops.packed_conv import pick_pack_levels

            k0, k1, k2, k3 = pick_pack_levels(x.shape[2], b, 4)
        else:
            k0 = k1 = k2 = k3 = 1

        def cbr(ch, k, stride=1, k_in=1, k_out=1):
            return ConvBnReLU(
                ch, k, stride=stride, gn=self.gn, view_groups=self.view_groups,
                k_in=k_in, k_out=k_out, dtype=self.dtype,
            )

        conv0 = cbr(b, 3, k_in=k0, k_out=k0)(pack_w(x, k0), train=train)
        conv0 = cbr(b, 3, k_in=k0, k_out=k0)(conv0, train=train)

        conv1 = cbr(2 * b, 5, stride=2, k_in=k0, k_out=k1)(conv0, train=train)
        conv1 = cbr(2 * b, 3, k_in=k1, k_out=k1)(conv1, train=train)
        conv1 = cbr(2 * b, 3, k_in=k1, k_out=k1)(conv1, train=train)

        conv2 = cbr(4 * b, 5, stride=2, k_in=k1, k_out=k2)(conv1, train=train)
        conv2 = cbr(4 * b, 3, k_in=k2, k_out=k2)(conv2, train=train)
        conv2 = cbr(4 * b, 3, k_in=k2, k_out=k2)(conv2, train=train)

        conv3 = cbr(8 * b, 5, stride=2, k_in=k2, k_out=k3)(conv2, train=train)
        conv3 = cbr(8 * b, 3, k_in=k3, k_out=k3)(conv3, train=train)
        conv3 = cbr(8 * b, 3, k_in=k3, k_out=k3)(conv3, train=train)

        return _TopDown(
            self.base, self.gn, self.dcn, self.view_groups,
            fuse_final=self.fuse_topdown, fuse_chain=self.fuse_chain,
            cw_request=self.cw_request, dtype=self.dtype,
        )(
            unpack_w(conv0, k0), unpack_w(conv1, k1),
            unpack_w(conv2, k2), unpack_w(conv3, k3), train=train,
        )


def topdown_chain_active(H: int, W: int, base: int, fuse_final: bool,
                         fuse_chain: bool) -> bool:
    """Whether FPN4's _TopDown takes the fully-fused chain branch for a
    ``[*, H, W, *]`` folded input — the single source MVS4Net uses to
    predict CW feature availability (must mirror _TopDown's fz logic)."""
    from ..ops.pallas.topdown_fused import level_fusable

    final = 8 * base
    if not (fuse_final and fuse_chain and final == 64):
        return False
    fz2 = level_fusable((0, H // 4, W // 4, 4 * base), (H // 8, W // 8),
                        final)
    fz3 = level_fusable((0, H // 2, W // 2, 2 * base), (H // 4, W // 4),
                        final)
    fz4 = level_fusable((0, H, W, base), (H // 2, W // 2), final)
    return fz2 and fz3 and fz4


class ConvNeXtBlock(nn.Module):
    """Downsampling ConvNeXt block (reference convnext_block,
    mvs4net_utils.py:533-558): depthwise 7x7 stride-2 (dim -> 2*dim), LN,
    pointwise MLP with GELU, learned layer scale. No residual (the stride-2
    variant drops it, see reference ``:557``)."""

    dim: int
    layer_scale_init: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d2 = 2 * self.dim
        # torch pad=3 (reference convnext_block :539); SAME mismatches at stride 2
        x = nn.Conv(
            d2, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
            feature_group_count=self.dim, dtype=self.dtype,
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        x = nn.Dense(4 * self.dim, dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)  # torch nn.GELU() is exact erf
        x = nn.Dense(d2, dtype=self.dtype)(x)
        gamma = self.param(
            "gamma", nn.initializers.constant(self.layer_scale_init), (d2,)
        )
        return x * gamma


class ConvNeXt4Block(nn.Module):
    """Patchify-style ConvNeXt block (reference convnext4_block,
    mvs4net_utils.py:560-586): 2x2 stride-2 conv then depthwise 7x7, with the
    residual from the downsampled input."""

    dim: int
    layer_scale_init: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d2 = 2 * self.dim
        inp = nn.Conv(d2, (2, 2), strides=(2, 2), padding="VALID", dtype=self.dtype)(x)
        x = nn.Conv(
            d2, (7, 7), padding="SAME", feature_group_count=self.dim,
            dtype=self.dtype,
        )(inp)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        x = nn.Dense(4 * self.dim, dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)  # torch nn.GELU() is exact erf
        x = nn.Dense(d2, dtype=self.dtype)(x)
        gamma = self.param(
            "gamma", nn.initializers.constant(self.layer_scale_init), (d2,)
        )
        return inp + x * gamma


class FPN4ConvNeXt(nn.Module):
    """FPN4 with ConvNeXt stages (reference FPN4_convnext / FPN4_convnext4,
    mvs4net_utils.py:588-728); ``patchify`` selects the convnext4 variant."""

    base: int = 8
    gn: bool = False
    dcn: bool = False
    patchify: bool = False
    view_groups: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        b = self.base
        conv0 = ConvBnReLU(
            b, 3, gn=self.gn, view_groups=self.view_groups, dtype=self.dtype
        )(x, train=train)
        conv0 = ConvBnReLU(
            b, 3, gn=self.gn, view_groups=self.view_groups, dtype=self.dtype
        )(conv0, train=train)
        block = ConvNeXt4Block if self.patchify else ConvNeXtBlock
        conv1 = block(b, dtype=self.dtype)(conv0)
        conv2 = block(2 * b, dtype=self.dtype)(conv1)
        conv3 = block(4 * b, dtype=self.dtype)(conv2)
        return _TopDown(
            self.base, self.gn, self.dcn, self.view_groups, dtype=self.dtype
        )(conv0, conv1, conv2, conv3, train=train)


class ASFF(nn.Module):
    """Adaptive scale feature fusion for one pyramid level (reference ASFF,
    mvs4net_utils.py:730-812). ``level`` 0 is the coarsest (stage1)."""

    level: int
    base: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x0, x1, x2, x3, *, train: bool):
        b = self.base
        dims = (8 * b, 4 * b, 2 * b, b)
        inter = dims[self.level]

        def conv(ch, k, s):
            return ConvBnReLU(ch, k, stride=s, dtype=self.dtype)

        def maxpool(x, k):
            return nn.max_pool(x, (k, k), strides=(k, k))

        def up_nearest(x, factor):
            for _ in range(factor.bit_length() - 1):
                x = upsample_nearest_2x(x)
            return x

        lvl = self.level
        if lvl == 0:
            r0 = x0
            r1 = conv(inter, 3, 2)(x1, train=train)
            r2 = conv(inter, 3, 2)(maxpool(x2, 2), train=train)
            r3 = conv(inter, 3, 2)(maxpool(x3, 4), train=train)
        elif lvl == 1:
            r0 = up_nearest(conv(inter, 1, 1)(x0, train=train), 2)
            r1 = x1
            r2 = conv(inter, 3, 2)(x2, train=train)
            r3 = conv(inter, 3, 2)(maxpool(x3, 2), train=train)
        elif lvl == 2:
            r0 = up_nearest(conv(inter, 1, 1)(x0, train=train), 4)
            r1 = up_nearest(conv(inter, 1, 1)(x1, train=train), 2)
            r2 = x2
            r3 = conv(inter, 3, 2)(x3, train=train)
        else:
            r0 = up_nearest(conv(inter, 1, 1)(x0, train=train), 8)
            r1 = up_nearest(conv(inter, 1, 1)(x1, train=train), 4)
            r2 = up_nearest(conv(inter, 1, 1)(x2, train=train), 2)
            r3 = x3

        # reference quirk: weight_level_X = Conv2d(dim, 8, 1, 1, 0) passes the
        # trailing 0 POSITIONALLY into the wrapper's `relu` parameter
        # (mvs4net_utils.py:757-760 with :233-234), so the per-level weight
        # heads are conv+BN with NO ReLU — reproduced (torch-parity-tested)
        ws = [
            ConvBnReLU(8, 1, relu=False, dtype=self.dtype)(r, train=train)
            for r in (r0, r1, r2, r3)
        ]
        w = nn.Conv(4, (1, 1), dtype=self.dtype)(jnp.concatenate(ws, axis=-1))
        w = nn.softmax(w, axis=-1)
        fused = (
            r0 * w[..., 0:1] + r1 * w[..., 1:2] + r2 * w[..., 2:3] + r3 * w[..., 3:4]
        )
        return ConvBnReLU(inter, 3, dtype=self.dtype)(fused, train=train)
