"""Fused FPN top-down level kernel (Pallas TPU).

Computes one top-down level of the FPN (reference ``mvs4net_utils.py:489-509``)

    o = Conv3x3_{64->Co}( up2_align_corners(intra) + Conv1x1_{Cs->64}(skip) )

in ONE pass. The unfused XLA chain materializes three full-resolution
64-channel intermediates in HBM (the upsample, the 1x1 projection and their
sum — ~670 MB each at the stage-4 level of the bench config), making the
top-down pathway bandwidth-bound at ~13 ms. The kernel streams 8-output-row
tiles: DMA a narrow window of `intra` and of the (pre-shifted) skip rows,
build everything in VMEM, write only `o` (~84 MB).

Layout/technique notes (same playbook as ops/pallas/warp_fwd_v3):
- everything lives CHANNELS-IN-SUBLANES (``[C, W]`` per row); the caller
  pre-transposes inputs once in XLA and transposes `o` back.
- the align-corners x2 W-resize is a static banded matrix, applied ONCE
  per row; the 3x3 conv's dx in {-1,0,1} column taps are derived from the
  center result with static +-1 lane rolls (``pltpu.roll``) + border
  masks. (The first version folded the taps into THREE variants of the
  resize matrix — 3x the dominant matmul FLOPs and 3x the skip DMA — and
  measured 13.3 ms at the bench L4 shape; this roll-based form measures
  7.0 ms on chip: _probe_td2.out / BENCH_NOTES rounds 3-4.)
- mode='v4' additionally hoists the W-resize OUT of the kernel into one
  whole-tensor XLA matmul (every half-res row resized exactly once instead
  of once per blended output row — a further ~2.5x cut of the dominant
  matmul), leaving the per-row kernel work as VPU blend + 1x1 skip + rolls
  + the 3x3 output matmul.
- the H-resize taps/fractions are integer/float tables indexed by output
  row (scalar-prefetch), exactly matching core.geometry.resize_align_corners.
- the 1x1 skip projection runs as one matmul per ROW-PAIR with a 2-block
  diagonal LHS so every VMEM sublane slice stays 16-aligned for bf16
  (Cs=8 rows alone would land on 8-sublane offsets).
- conv edge rows (r-1 < 0, r+1 >= H) are zero-masked; the skip arrays are
  pre-padded with one zero row top+bottom so windows never clamp.

Differentiable (round 3): ``topdown_fused_level`` carries a ``custom_vjp``
whose backward re-derives the gradient through the *unfused* XLA chain
(rematerialized — the same trade ``jax.checkpoint`` makes): the fused kernel
only changes f32 accumulation order, so the unfused chain's VJP is the
correct gradient, and the forward pass still skips the three full-res HBM
intermediates. Backward cost equals the unfused fwd+bwd; net train-step win
is the forward's removed HBM traffic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HWIN = 8  # intra source-row window (covers the <=7-row span of 10 out rows)


def _h_tables(H: int, Hh: int):
    """align-corners H-resize: per-output-row source index + fraction."""
    g = np.arange(H, dtype=np.float64)
    p = g * (Hh - 1) / (H - 1)
    idx = np.minimum(np.floor(p).astype(np.int32), Hh - 2)
    frac = (p - idx).astype(np.float32)
    return idx, frac


def _w_matrix(W: int, Wh: int, dtype):
    """W-resize matrix [Wh, W]: MwT[v, w] = Mw[w, v] (align-corners x2
    taps). The 3x3 conv's dx in {-1,0,1} column taps are NOT folded in —
    the kernel derives them from the center result with static +-1 lane
    rolls (pltpu.roll), which cuts the dominant resize matmul 3x."""
    p = np.arange(W, dtype=np.float64) * (Wh - 1) / (W - 1)
    i0 = np.minimum(np.floor(p).astype(np.int64), Wh - 2)
    fr = p - i0
    Mw = np.zeros((W, Wh), np.float32)
    Mw[np.arange(W), i0] = 1.0 - fr
    Mw[np.arange(W), i0 + 1] = fr
    return Mw.T.astype(dtype)


def _kernel(hidx_ref, hfrac_ref, intra_ref, c0_ref, wi_ref, bi_ref, wo_ref,
            mw_ref, out_ref, w_intra, w_c0, u_scr, sem1, sem2,
            *, TR: int, H: int, Hh: int, Wh: int, Ci: int, Cs: int, Co: int,
            w_real: int):
    n = pl.program_id(0)
    t = pl.program_id(1)
    r0 = t * TR
    NROW = TR + 2
    W = out_ref.shape[3]

    # intra window start (rows), aligned by construction (x Ci sublanes)
    h0 = jnp.minimum(hidx_ref[jnp.maximum(r0 - 1, 0)], Hh - HWIN)
    cp1 = pltpu.make_async_copy(
        intra_ref.at[n, pl.ds(pl.multiple_of(h0 * Ci, Ci), HWIN * Ci)],
        w_intra, sem1,
    )
    cp1.start()
    # skip window: rows r0-1 .. r0+TR in padded coords = r0 .. r0+NROW-1
    cp2 = pltpu.make_async_copy(
        c0_ref.at[n, pl.ds(pl.multiple_of(r0 * Cs, TR * Cs), NROW * Cs)],
        w_c0, sem2,
    )
    cp2.start()

    wi_t = wi_ref[:]          # [64, Cs]
    bi = bi_ref[:]            # [Ci, 1]
    zcs = jnp.zeros_like(wi_t)
    bd2 = jnp.concatenate(
        [
            jnp.concatenate([wi_t, zcs], axis=1),
            jnp.concatenate([zcs, wi_t], axis=1),
        ],
        axis=0,
    )                         # [2*Ci, 2*Cs] two-row block diagonal

    cp1.wait()
    cp2.wait()

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    # the dx={0,2} conv-tap variants read column w-1 / w+1 of the center
    # result; out-of-range columns are the 3x3 conv's ZERO pad — in
    # particular they must not carry the 1x1 bias. Masks use the REAL
    # width (lanes >= w_real are 128-alignment padding; they only feed
    # cropped output columns).
    mask_l = (lane >= 1).astype(jnp.float32)
    mask_r = (lane < w_real - 1).astype(jnp.float32)
    mw = mw_ref[:]            # [Whp, W]
    # 1x1 skip projection for all rows, one matmul per row PAIR
    for pair in range(NROW // 2):
        seg = w_c0[pl.ds(2 * pair * Cs, 2 * Cs), :]          # [2Cs, W]
        i3 = jax.lax.dot_general(
            bd2.astype(seg.dtype), seg,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # [2Ci, W]
        for half in range(2):
            row = 2 * pair + half
            g = r0 - 1 + row
            gc = jnp.clip(g, 0, H - 1)
            hi = jnp.minimum(hidx_ref[gc] - h0, HWIN - 2)
            a = hfrac_ref[gc]
            r_lo = w_intra[pl.ds(hi * Ci, Ci), :].astype(jnp.float32)
            r_hi = w_intra[pl.ds((hi + 1) * Ci, Ci), :].astype(jnp.float32)
            blend = (1.0 - a) * r_lo + a * r_hi              # [Ci, Wh]
            up = jax.lax.dot_general(
                blend.astype(mw.dtype), mw,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                # [Ci, W]
            mask = jnp.logical_and(g >= 0, g < H).astype(jnp.float32)
            u = (up + i3[half * Ci : (half + 1) * Ci, :] + bi) * mask
            # dx variants from the center row by static lane rolls;
            # roll(+1)[w] = u[w-1] (dx=0), roll(-1)[w] = u[w+1] (dx=2).
            # Scratch layout interleaves dx WITHIN each row —
            # (row*3 + dx)*Ci — so an output row's nine (dy, dx) taps are
            # one contiguous 9*Ci-sublane slice (single matmul below).
            u_scr[pl.ds((row * 3 + 1) * Ci, Ci), :] = u.astype(
                u_scr.dtype
            )
            u_scr[pl.ds((row * 3 + 0) * Ci, Ci), :] = (
                pltpu.roll(u, 1, 1) * mask_l
            ).astype(u_scr.dtype)
            u_scr[pl.ds((row * 3 + 2) * Ci, Ci), :] = (
                pltpu.roll(u, W - 1, 1) * mask_r  # roll by -1 (must be >=0)
            ).astype(u_scr.dtype)

    # one [Co, 9*Ci] @ [9*Ci, W] matmul per output row (vs 9 M=Co-sublane
    # matmuls — 1/16 MXU fill made the output conv the kernel's bottleneck)
    wk = wo_ref[:]                                           # [Co, 9*Ci]
    for j in range(TR):
        useg = u_scr[pl.ds(3 * j * Ci, 9 * Ci), :]           # rows j..j+2
        out_ref[0, j] = jax.lax.dot_general(
            wk.astype(useg.dtype), useg,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


HWIN2 = 6  # pre-resized intra window (rows hi(r0-1)..hi(r0+TR)+1 span <= 6)


def level_fusable(skip_shape, intra_hw, final: int,
                  tile_rows: int = 8) -> bool:
    """Static eligibility of one fused top-down level — the single source
    of truth for the kernel's geometry constraints (mirrored by the
    launcher asserts): tile_rows | H, H = 2*Hh exactly with Hh >= HWIN2,
    W = 2*Wh exactly, 16-sublane-aligned row-pair 1x1 segments (2*Cs) and
    intra slices (Ci = ``final``)."""
    H, W, Cs = skip_shape[1], skip_shape[2], skip_shape[3]
    hh, wh = intra_hw
    return (
        final % 16 == 0
        and H % tile_rows == 0
        and hh >= HWIN2
        and H == 2 * hh
        and W == 2 * wh
        and (2 * Cs) % 16 == 0
    )


def _kernel_v4(hidx_ref, hfrac_ref, intraw_ref, c0_ref, wi_ref, bi_ref,
               wo_ref, *refs,
               TR: int, H: int, Hh: int, Ci: int, Cs: int, Co: int,
               w_real: int, merged: bool = False, with_u: bool = False,
               u_only: bool = False):
    """v4 slim kernel: identical to ``_kernel`` except the W-resize happened
    OUTSIDE (one large XLA matmul over the whole ``intra`` tensor — each
    half-res row resized exactly once instead of once per blended output row,
    a ~2.5x cut of the dominant matmul) so the per-row work is just the
    H-blend (VPU) + 1x1 skip + bias + dx rolls + the 3x3 output matmul.

    ``merged`` (mode v5): the TR per-row output matmuls run at M=Co (8
    sublanes of 128 — 1/16 MXU fill; ~200 128^3 tile-ops per 8-row tile at
    the L4 shape). Instead, ONE matmul [TR*Co, 3*NROW*Ci] @ [3*NROW*Ci, W]
    whose LHS is ``wo`` block-SHIFTED per output row (row j's 9*Ci taps sit
    at K offset 3*j*Ci; zero elsewhere — built statically by the launcher)
    computes every row at once: ~75 tile-ops for the same math."""
    if u_only:
        u_out_ref, w_intra, w_c0, sem1, sem2 = refs
        out_ref = u_out_ref  # W/shape bookkeeping only; never written to o
        u_scr = None
    elif with_u:
        out_ref, u_out_ref, w_intra, w_c0, u_scr, sem1, sem2 = refs
    else:
        out_ref, w_intra, w_c0, u_scr, sem1, sem2 = refs
        u_out_ref = None
    n = pl.program_id(0)
    t = pl.program_id(1)
    r0 = t * TR
    NROW = TR + 2
    W = out_ref.shape[3]

    h0 = jnp.minimum(hidx_ref[jnp.maximum(r0 - 1, 0)], Hh - HWIN2)
    cp1 = pltpu.make_async_copy(
        intraw_ref.at[n, pl.ds(pl.multiple_of(h0 * Ci, Ci), HWIN2 * Ci)],
        w_intra, sem1,
    )
    cp1.start()
    cp2 = pltpu.make_async_copy(
        c0_ref.at[n, pl.ds(pl.multiple_of(r0 * Cs, TR * Cs), NROW * Cs)],
        w_c0, sem2,
    )
    cp2.start()

    wi_t = wi_ref[:]          # [Ci, Cs]
    bi = bi_ref[:]            # [Ci, 1]
    zcs = jnp.zeros_like(wi_t)
    bd2 = jnp.concatenate(
        [
            jnp.concatenate([wi_t, zcs], axis=1),
            jnp.concatenate([zcs, wi_t], axis=1),
        ],
        axis=0,
    )                         # [2*Ci, 2*Cs]

    cp1.wait()
    cp2.wait()

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    mask_l = (lane >= 1).astype(jnp.float32)
    mask_r = (lane < w_real - 1).astype(jnp.float32)
    for pair in range(NROW // 2):
        seg = w_c0[pl.ds(2 * pair * Cs, 2 * Cs), :]          # [2Cs, W]
        i3 = jax.lax.dot_general(
            bd2.astype(seg.dtype), seg,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # [2Ci, W]
        for half in range(2):
            row = 2 * pair + half
            g = r0 - 1 + row
            gc = jnp.clip(g, 0, H - 1)
            hi = jnp.minimum(hidx_ref[gc] - h0, HWIN2 - 2)
            a = hfrac_ref[gc]
            r_lo = w_intra[pl.ds(hi * Ci, Ci), :].astype(jnp.float32)
            r_hi = w_intra[pl.ds((hi + 1) * Ci, Ci), :].astype(jnp.float32)
            up = (1.0 - a) * r_lo + a * r_hi                 # [Ci, W]
            mask = jnp.logical_and(g >= 0, g < H).astype(jnp.float32)
            u = (up + i3[half * Ci : (half + 1) * Ci, :] + bi) * mask
            u_b = u.astype(out_ref.dtype)
            if (with_u or u_only) and 0 < row <= TR:
                # center rows 1..TR are this tile's output rows r0..r0+TR-1:
                # emit the post-skip pre-conv activation (the next level's
                # half-res input)
                u_out_ref[0, row - 1] = u_b
            if not u_only:
                u_scr[pl.ds((row * 3 + 1) * Ci, Ci), :] = u_b
                u_scr[pl.ds((row * 3 + 0) * Ci, Ci), :] = (
                    pltpu.roll(u, 1, 1) * mask_l
                ).astype(u_scr.dtype)
                u_scr[pl.ds((row * 3 + 2) * Ci, Ci), :] = (
                    pltpu.roll(u, W - 1, 1) * mask_r
                ).astype(u_scr.dtype)

    if u_only:
        return
    wk = wo_ref[:]                 # merged: [TR*Co, 3*NROW*Ci]; else [Co, 9*Ci]
    if merged:
        acc = jax.lax.dot_general(
            wk.astype(u_scr.dtype), u_scr[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # [TR*Co, W]
        for j in range(TR):
            out_ref[0, j] = acc[j * Co : (j + 1) * Co].astype(out_ref.dtype)
    else:
        for j in range(TR):
            useg = u_scr[pl.ds(3 * j * Ci, 9 * Ci), :]
            out_ref[0, j] = jax.lax.dot_general(
                wk.astype(useg.dtype), useg,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(out_ref.dtype)


def _run_kernel_v4(intra, skip, wi, bi, wo, tile_rows=8, interpret=False,
                   merged=False, with_u=False, intra_cw=False, u_cw=False,
                   o_cw=False):
    """v4/v5 launcher: W-resize in XLA (einsum over the whole tensor), then
    the slim blend/conv kernel (``merged``: v5 single block-shifted output
    matmul). ``with_u`` additionally returns the pre-conv sum
    ``up2(intra) + 1x1(skip) + bias`` — the NEXT top-down level's input —
    so the mid levels (L2/L3) can fuse without re-materializing the chain.
    ``intra_cw``/``u_cw``: consume/emit the half-res pathway in the
    channels-in-sublanes ``[N, H, Ci, Wp]`` layout (lane-padded; junk
    columns beyond the logical width) — the chain-fused path passes ``u``
    straight into the next level's pre-resize einsum, skipping the NHWC
    transpose-back XLA otherwise emits as a ~1.15 ms relayout copy at the
    bench L3->L4 hand-off (r4 trace). Bit-compatibility note:
    resize-then-H-blend and H-blend-then-resize are the same linear map;
    only f32->bf16 rounding of the pre-resized rows differs from the v2
    kernel's order."""
    _, H, W, Cs = skip.shape
    if intra_cw:
        N, Hh, Ci, Whp_in = intra.shape
        Wh = W // 2
        assert Whp_in >= Wh and H == 2 * Hh
    else:
        N, Hh, Wh, Ci = intra.shape
        assert (H, W) == (2 * Hh, 2 * Wh)
    Co = wo.shape[-1]
    assert (2 * Cs) % 16 == 0 and Ci % 16 == 0, (Cs, Ci)
    assert H % tile_rows == 0
    dt = intra.dtype

    hidx, hfrac = _h_tables(H, Hh)
    Wp = -(-W // 128) * 128
    mw = _w_matrix(W, Wh, np.float32)                            # [Wh, W]
    if intra_cw:
        # zero rows beyond the logical Wh kill the lane-pad junk columns
        # of the previous level's u
        mw = np.pad(mw, ((0, Whp_in - Wh), (0, Wp - W)))
    else:
        mw = np.pad(mw, ((0, 0), (0, Wp - W)))
    mw = jnp.asarray(mw).astype(dt)

    # pre-resize every half-res row once, directly in channels-in-sublanes
    # layout (the dot_general's natural result order [n, h, c, w] — no
    # relayout): [N, Hh, Wh, Ci] -> [N, Hh, Ci, Wp] -> [N, Hh*Ci, Wp]
    intra_w = jnp.einsum(
        "nhcv,vw->nhcw" if intra_cw else "nhvc,vw->nhcw", intra, mw,
        preferred_element_type=jnp.float32,
    ).astype(dt)
    intraw_t = intra_w.reshape(N, Hh * Ci, Wp)

    sk_t = jnp.swapaxes(skip, 2, 3)  # [N, H, Cs, W]
    sk_pad = jnp.pad(sk_t, ((0, 0), (1, 1), (0, 0), (0, 0)))
    c0 = sk_pad.reshape(N, (H + 2) * Cs, W)
    if Wp != W:
        c0 = jnp.pad(c0, ((0, 0), (0, 0), (0, Wp - W)))

    wi_t = jnp.transpose(wi[0, 0], (1, 0))          # [Ci, Cs]
    wo_t = jnp.transpose(wo, (3, 0, 1, 2)).reshape(Co, 9 * Ci)
    bi_c = bi.reshape(Ci, 1).astype(jnp.float32)

    T = H // tile_rows
    NROW = tile_rows + 2
    if merged:
        # v5: block-shift wo per output row — row j's 9*Ci taps sit at
        # K offset 3*j*Ci of the [3*NROW*Ci]-deep scratch
        K = 3 * NROW * Ci
        wo_t = jnp.concatenate(
            [
                jnp.pad(wo_t, ((0, 0), (3 * j * Ci, K - (3 * j + 9) * Ci)))
                for j in range(tile_rows)
            ],
            axis=0,
        )                                           # [TR*Co, 3*NROW*Ci]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N, T),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),   # intraw_t
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),   # c0
            pl.BlockSpec(
                (Ci, Cs), lambda n, t, *_: (0, 0), memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (Ci, 1), lambda n, t, *_: (0, 0), memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                wo_t.shape, lambda n, t, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_rows, Co, Wp), lambda n, t, *_: (n, t, 0, 0),
            memory_space=pltpu.VMEM,
        ) if not with_u else (
            pl.BlockSpec(
                (1, tile_rows, Co, Wp), lambda n, t, *_: (n, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_rows, Ci, Wp), lambda n, t, *_: (n, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((HWIN2 * Ci, Wp), dt),
            pltpu.VMEM((NROW * Cs, Wp), dt),
            pltpu.VMEM((3 * NROW * Ci, Wp), dt),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out_shape = jax.ShapeDtypeStruct((N, T * tile_rows, Co, Wp), dt)
    if with_u:
        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct((N, T * tile_rows, Ci, Wp), dt),
        )
    out = pl.pallas_call(
        functools.partial(
            _kernel_v4, TR=tile_rows, H=H, Hh=Hh, Ci=Ci, Cs=Cs, Co=Co,
            w_real=W, merged=merged, with_u=with_u,
        ),
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        jnp.asarray(hidx), jnp.asarray(hfrac),
        intraw_t, c0, wi_t.astype(dt), bi_c, wo_t.astype(dt),
    )
    def emit_o(o):
        # o_cw: keep the kernel-native channels-in-sublanes layout
        # [N, H, Co, Wp] for a CW consumer (the fused warp+cor kernel's
        # src_hc is a free reshape of it) — but the lane PAD columns hold
        # junk and warp taps can land there (zeros-padding semantics), so
        # zero them (one fused elementwise; free when Wp == W)
        if o_cw:
            if Wp != W:
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, Wp), 3)
                o = jnp.where(lane < W, o, jnp.zeros((), o.dtype))
            return o
        return jnp.swapaxes(o, 2, 3)[:, :, :W]  # [N, H, W, Co]

    if with_u:
        o, u = out
        return (
            emit_o(o),
            u if u_cw else jnp.swapaxes(u, 2, 3)[:, :, :W],
        )
    return emit_o(out)


def _unfused_chain(intra, skip, wi, bi, wo):
    """The XLA reference computation (models/fpn.py:_TopDown unfused path) —
    used by the custom VJP as the rematerialized backward."""
    from ...core.geometry import resize_align_corners

    H, W = skip.shape[1:3]
    up = resize_align_corners(intra, (H, W))
    i3 = jax.lax.conv_general_dilated(
        skip, wi, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + bi.astype(skip.dtype)
    return jax.lax.conv_general_dilated(
        up + i3, wo, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused(intra, skip, wi, bi, wo, tile_rows, interpret, mode):
    return _dispatch(intra, skip, wi, bi, wo, tile_rows, interpret, mode)


def _dispatch(intra, skip, wi, bi, wo, tile_rows, interpret, mode):
    if mode == "v2":
        return _run_kernel(intra, skip, wi, bi, wo, tile_rows, interpret)
    return _run_kernel_v4(
        intra, skip, wi, bi, wo, tile_rows, interpret, merged=(mode == "v5")
    )


def _fused_fwd(intra, skip, wi, bi, wo, tile_rows, interpret, mode):
    return (
        _dispatch(intra, skip, wi, bi, wo, tile_rows, interpret, mode),
        (intra, skip, wi, bi, wo),
    )


def _fused_bwd(tile_rows, interpret, mode, res, g):
    _, vjp = jax.vjp(_unfused_chain, *res)
    return vjp(g.astype(res[0].dtype))


_fused.defvjp(_fused_fwd, _fused_bwd)


def _unfused_chain_u(intra, skip, wi, bi, wo):
    """Unfused XLA chain that also returns the pre-conv sum (the next
    level's input) — VJP reference for the ``with_u`` fused form."""
    from ...core.geometry import resize_align_corners

    H, W = skip.shape[1:3]
    up = resize_align_corners(intra, (H, W))
    u = up + jax.lax.conv_general_dilated(
        skip, wi, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + bi.astype(skip.dtype)
    o = jax.lax.conv_general_dilated(
        u, wo, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return o, u


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused_u(intra, skip, wi, bi, wo, tile_rows, interpret, mode):
    return _run_kernel_v4(
        intra, skip, wi, bi, wo, tile_rows, interpret,
        merged=(mode == "v5"), with_u=True,
    )


def _fused_u_fwd(intra, skip, wi, bi, wo, tile_rows, interpret, mode):
    return (
        _fused_u(intra, skip, wi, bi, wo, tile_rows, interpret, mode),
        (intra, skip, wi, bi, wo),
    )


def _fused_u_bwd(tile_rows, interpret, mode, res, g):
    _, vjp = jax.vjp(_unfused_chain_u, *res)
    return vjp(tuple(x.astype(res[0].dtype) for x in g))


_fused_u.defvjp(_fused_u_fwd, _fused_u_bwd)


def topdown_fused_level(
    intra: jnp.ndarray,    # [N, Hh, Wh, Ci=64] half-res pathway
    skip: jnp.ndarray,     # [N, H, W, Cs] lateral (conv0/1/2)
    wi: jnp.ndarray,       # [1, 1, Cs, Ci] inner 1x1 kernel
    bi: jnp.ndarray,       # [Ci] inner bias
    wo: jnp.ndarray,       # [3, 3, Ci, Co] out 3x3 kernel
    *,
    tile_rows: int = 8,
    interpret: bool = False,
    mode: str = "v4",
    with_u: bool = False,
) -> jnp.ndarray:          # [N, H, W, Co]  (with_u: also [N, H, W, Ci])
    """Differentiable fused top-down level (see module docstring).

    ``mode='v4'`` (default; measured r4): W-resize hoisted into one XLA
    matmul + slim blend/conv kernel (L4 17.5 unfused -> 5.85 ms).
    ``mode='v5'``: v4 + the TR per-row output matmuls merged into ONE
    block-shifted-weights matmul — measured SLOWER (L4 6.17, L3 2.28 vs
    1.92, _probe_r4b.out): the MXU streams M sublane rows, so the merged
    form's 3.3x zero-padded K outweighs the per-row form's M=Co=8
    underfill. Kept for the negative result. ``mode='v2'``: the round-3
    roll-based all-in-kernel form (6.46 ms at CHAIN=64).

    ``with_u`` (v4/v5 only) also returns the pre-conv sum
    ``up2(intra) + 1x1(skip) + bias`` — the NEXT level's half-res input —
    letting the mid top-down levels (L2/L3) fuse too: the unfused L3 chain
    measures 6.05 ms vs 1.92 fused (_probe_r4a.out).
    """
    if with_u:
        assert mode in ("v4", "v5"), mode
        return _fused_u(intra, skip, wi, bi, wo, tile_rows, interpret, mode)
    return _fused(intra, skip, wi, bi, wo, tile_rows, interpret, mode)


def _unfused_topdown_chain(intra, skips, weights):
    """XLA reference for the chain VJP: the whole top-down cascade
    (models/fpn.py:_TopDown unfused levels, reference
    mvs4net_utils.py:489-509)."""
    from ...core.geometry import resize_align_corners

    outs = []
    cur = intra
    for skip, (wi, bi, wo) in zip(skips, weights):
        H, W = skip.shape[1:3]
        cur = resize_align_corners(cur, (H, W)) + jax.lax.conv_general_dilated(
            skip, wi, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bi.astype(skip.dtype)
        outs.append(
            jax.lax.conv_general_dilated(
                cur, wo, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        )
    return tuple(outs)


def _chain_impl(intra, skips, weights, tile_rows, interpret, o_cw=None):
    o_cw = o_cw or (False,) * len(skips)
    outs = []
    cur, cw = intra, False
    for i, (skip, (wi, bi, wo)) in enumerate(zip(skips, weights)):
        if i == len(skips) - 1:
            outs.append(_run_kernel_v4(
                cur, skip, wi, bi, wo, tile_rows, interpret, intra_cw=cw,
                o_cw=o_cw[i],
            ))
        else:
            o, cur = _run_kernel_v4(
                cur, skip, wi, bi, wo, tile_rows, interpret,
                with_u=True, intra_cw=cw, u_cw=True, o_cw=o_cw[i],
            )
            cw = True
            outs.append(o)
    return tuple(outs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_chain(intra, skips, weights, tile_rows, interpret):
    return _chain_impl(intra, skips, weights, tile_rows, interpret)


def _fused_chain_fwd(intra, skips, weights, tile_rows, interpret):
    return (
        _chain_impl(intra, skips, weights, tile_rows, interpret),
        (intra, skips, weights),
    )


def _fused_chain_bwd(tile_rows, interpret, res, g):
    """Analytic chain backward: re-derive each level's pre-conv sum ``u``
    with the FUSED kernels, then run per-op vjps whose (unused) forward
    values DCE away. The previous implementation vjp'd the whole UNFUSED
    cascade, re-materializing three full-res 64-channel XLA intermediates
    per level — ~50 ms of the 510 ms train step (r4g trace: 6 ms relayout
    copies + 5 ms conv-grad fusions per tensor)."""
    from ...core.geometry import resize_align_corners

    intra, skips, weights = res
    dt = intra.dtype
    g = tuple(x.astype(dt) for x in g)

    us = []
    cur = intra
    for skip, (wi, bi, wo) in zip(skips, weights):
        _, cur = _run_kernel_v4(cur, skip, wi, bi, wo, tile_rows,
                                interpret, with_u=True)
        us.append(cur)

    def conv3(u_, wo_):
        return jax.lax.conv_general_dilated(
            u_, wo_, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def pre(prev_, skip_, wi_, bi_, hw):
        return resize_align_corners(prev_, hw) + jax.lax.conv_general_dilated(
            skip_, wi_, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bi_.astype(skip_.dtype)

    d_skips = [None] * len(skips)
    d_weights = [None] * len(weights)
    g_u = None
    for lvl in reversed(range(len(skips))):
        skip = skips[lvl]
        wi, bi, wo = weights[lvl]
        u = us[lvl]
        prev = intra if lvl == 0 else us[lvl - 1]
        hw = skip.shape[1:3]
        _, vjp1 = jax.vjp(conv3, u, wo)
        du, dwo = vjp1(g[lvl])
        if g_u is not None:
            du = du + g_u
        _, vjp2 = jax.vjp(
            functools.partial(pre, hw=hw), prev, skip, wi, bi
        )
        g_u, dskip, dwi, dbi = vjp2(du)
        d_skips[lvl] = dskip
        d_weights[lvl] = (dwi, dbi, dwo)
    return g_u, tuple(d_skips), tuple(d_weights)


_fused_chain.defvjp(_fused_chain_fwd, _fused_chain_bwd)


def topdown_fused_chain(
    intra: jnp.ndarray,              # [N, Hh, Wh, 64] coarsest pathway
    skips: tuple,                    # (conv2, conv1, conv0) finest-last
    weights: tuple,                  # ((wi, bi, wo),) per level
    *,
    tile_rows: int = 8,
    interpret: bool = False,
    o_cw=None,
) -> tuple:                          # (o2, o3, o4)
    """Differentiable fully-fused FPN top-down cascade: every level runs
    the v4 kernel, and the inter-level pathway tensor ``u`` stays in the
    kernel's channels-in-sublanes layout end to end (no NHWC transpose
    copies between levels). Backward is ANALYTIC: the ``u``'s are
    re-derived with the fused kernels (u-only variant) and gradients flow
    through per-op vjps — no unfused-cascade rematerialization (see
    ``_fused_chain_bwd``).

    ``o_cw``: per-level booleans requesting CHANNELS-IN-SUBLANES outputs
    ``[N, H, Co, Wp]`` (lane-padded with zeros) for CW consumers (the
    fused warp+cor kernels). EVAL-ONLY: the CW path bypasses the
    custom-VJP wrapper, so differentiating it autodiffs straight into the
    Pallas kernels (an error) — callers gate on ``not train``."""
    if o_cw and any(o_cw):
        return _chain_impl(intra, tuple(skips), tuple(weights), tile_rows,
                           interpret, o_cw=tuple(o_cw))
    return _fused_chain(intra, tuple(skips), tuple(weights), tile_rows,
                        interpret)


def _run_kernel(
    intra: jnp.ndarray,
    skip: jnp.ndarray,
    wi: jnp.ndarray,
    bi: jnp.ndarray,
    wo: jnp.ndarray,
    tile_rows: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    N, Hh, Wh, Ci = intra.shape
    _, H, W, Cs = skip.shape
    Co = wo.shape[-1]
    # sublane-slice alignment: row-pair 1x1 segments (2*Cs) and intra row
    # slices (Ci) must be 16-sublane multiples for 16-bit dtypes
    assert (2 * Cs) % 16 == 0 and Ci % 16 == 0, (Cs, Ci)
    assert H % tile_rows == 0 and (H, W) == (2 * Hh, 2 * Wh)
    dt = intra.dtype

    hidx, hfrac = _h_tables(H, Hh)
    # Mosaic requires manual HBM DMA slices to have 128-aligned lane
    # extents: zero-pad both widths up (padded intra columns carry zero
    # resize weight; padded skip/output columns are cropped below).
    Wp = -(-W // 128) * 128
    Whp = -(-Wh // 128) * 128
    mw = _w_matrix(W, Wh, np.float32)                            # [Wh, W]
    mw = np.pad(mw, ((0, Whp - Wh), (0, Wp - W)))
    mw = jnp.asarray(mw).astype(dt)                              # [Whp, Wp]

    # channels -> sublanes; merge (row, channel)
    intra_t = jnp.swapaxes(intra, 2, 3).reshape(N, Hh * Ci, Wh)
    if Whp != Wh:
        intra_t = jnp.pad(intra_t, ((0, 0), (0, 0), (0, Whp - Wh)))
    # skip: one zero row top+bottom, channels to sublanes (no dx shifts —
    # the kernel derives the conv's column taps with lane rolls):
    # [N, (H+2)*Cs, Wp]
    sk_t = jnp.swapaxes(skip, 2, 3)  # [N, H, Cs, W]
    sk_pad = jnp.pad(sk_t, ((0, 0), (1, 1), (0, 0), (0, 0)))
    c0 = sk_pad.reshape(N, (H + 2) * Cs, W)
    if Wp != W:
        c0 = jnp.pad(c0, ((0, 0), (0, 0), (0, Wp - W)))

    wi_t = jnp.transpose(wi[0, 0], (1, 0))          # [Ci, Cs]
    # [Co, 9*Ci], (dy, dx) outer-to-inner — matches the u_scr interleave
    wo_t = jnp.transpose(wo, (3, 0, 1, 2)).reshape(Co, 9 * Ci)
    bi_c = bi.reshape(Ci, 1).astype(jnp.float32)

    T = H // tile_rows
    NROW = tile_rows + 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N, T),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),   # intra_t
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),   # c0
            pl.BlockSpec(
                (Ci, Cs), lambda n, t, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),                                                  # wi_t
            pl.BlockSpec(
                (Ci, 1), lambda n, t, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),                                                  # bi
            pl.BlockSpec(
                (Co, 9 * Ci), lambda n, t, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),                                                  # wo_t
            pl.BlockSpec(
                (Whp, Wp), lambda n, t, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),                                                  # mw
        ],
        out_specs=pl.BlockSpec(
            (1, tile_rows, Co, Wp), lambda n, t, *_: (n, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((HWIN * Ci, Whp), dt),
            pltpu.VMEM((NROW * Cs, Wp), dt),
            pltpu.VMEM((3 * NROW * Ci, Wp), dt),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, TR=tile_rows, H=H, Hh=Hh, Wh=Wh, Ci=Ci, Cs=Cs, Co=Co,
            w_real=W,
        ),
        out_shape=jax.ShapeDtypeStruct((N, T * tile_rows, Co, Wp), dt),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        jnp.asarray(hidx), jnp.asarray(hfrac),
        intra_t, c0, wi_t.astype(dt), bi_c, wo_t.astype(dt), mw,
    )
    return jnp.swapaxes(out, 2, 3)[:, :, :W]  # [N, H, W, Co]
