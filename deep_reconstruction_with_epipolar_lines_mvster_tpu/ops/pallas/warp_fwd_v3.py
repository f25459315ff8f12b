"""Pallas TPU forward warp kernel, v3 ("flipped" layout).

Same banded-interpolation math as ``ops/warp_mxu`` (reference hot op
``mvs4net_utils.py:21-67``), redesigned around the two failure modes
measured in the v1 kernel (BENCH_NOTES.md "Pallas tile-kernel experiment"):

1. **No cross-lane relayouts.** v1 moved the per-row x coordinates from
   lanes to sublanes to build ``wx[P, Ws]`` — a full-vector transpose per
   row. v3 computes the TRANSPOSED weight matrix ``wxT[Ws, W]`` instead:
   the coordinate row stays a lane vector, broadcast against a sublane
   iota. Zero shuffles.
2. **Full-M matmul, no N=C fold.** v1's final ``(wy*z) @ fold`` matmul had
   N = C = 8 output lanes (1/16 MXU). v3 contracts the OTHER way:

       rt  = src_hc[b, y0*C : (y0+band)*C, :]      [band*C, Ws]  (DMA)
       zt  = rt @ wxT                              [band*C, W]   (MXU)
       out = sum_k (wyT * zt)[k*C:(k+1)*C, :]      [C, W]        (VPU)

   With the default band=16 and C=8 the M dim is exactly 128 sublanes.
   The k-sum is ``band`` static sublane slices — no matmul, no gather.

The source is pre-transposed once per view to ``[B, Hs*C, Ws]`` (the
(row, channel) axes merged into SUBLANES), so the band slice is a
sublane-dim DMA whose start ``y0*C`` only needs 16-sublane (bf16)
alignment — ``align_y = 2`` rows for C=8, 1 otherwise — instead of v1's
128-lane alignment that doubled the band. Output blocks are
``[TR, C, W]`` (row index leading, so the per-row store is a cheap
leading-dim dynamic index); the caller transposes back to ``[..., W, C]``
in XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(starts_ref, x_ref, y_ref, src_hc_ref, out_ref, rt_vmem, sem,
            *, band: int, tile_rows: int, channels: int, align_y: int):
    b = pl.program_id(0)
    n = pl.program_id(1)
    C = channels
    y0 = pl.multiple_of(starts_ref[b, n], align_y)
    start = pl.multiple_of(y0 * C, align_y * C)

    cp = pltpu.make_async_copy(
        src_hc_ref.at[b, pl.ds(start, band * C)], rt_vmem, sem
    )
    cp.start()

    Ws = src_hc_ref.shape[2]
    W = x_ref.shape[3]
    y0f = y0.astype(jnp.float32)

    # sublane iotas shared across rows
    # Mosaic only supports integer iota; cast to f32 after.
    js = jax.lax.broadcasted_iota(jnp.int32, (Ws, W), 0).astype(jnp.float32)
    kidx = (
        jax.lax.broadcasted_iota(jnp.int32, (band * C, W), 0) // C
    ).astype(jnp.float32)                                           # k index

    cp.wait()
    rt = rt_vmem[:]  # [band*C, Ws]

    def row(r, _):
        x = x_ref[0, 0, r]                                          # [W] lanes
        y = y_ref[0, 0, r]
        wxT = jnp.maximum(0.0, 1.0 - jnp.abs(x[None, :] - js))      # [Ws, W]
        zt = jax.lax.dot_general(
            rt, wxT.astype(rt.dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                           # [band*C, W]
        wyT = jnp.maximum(0.0, 1.0 - jnp.abs(y[None, :] - (y0f + kidx)))
        prod = wyT * zt
        acc = prod[0:C, :]
        for k in range(1, band):
            acc = acc + prod[k * C : (k + 1) * C, :]
        out_ref[0, 0, r] = acc.astype(out_ref.dtype)                # [C, W]
        return 0

    jax.lax.fori_loop(0, tile_rows, row, 0, unroll=True)


def _kernel_xchunk(starts_ref, xstarts_ref, x_ref, y_ref, src_hc_ref, out_ref,
                   rt_vmem, sem, *, band: int, tile_rows: int, channels: int,
                   align_y: int, xwin: int, chunk: int):
    """Column-chunked variant: the j-contraction runs over a 128-lane-aligned
    ``xwin``-column window per ``chunk``-column output block instead of the
    full source width — the per-chunk window start comes from the prefetched
    ``xstarts`` plan and is provably 128-aligned, so the rt lane slice is
    legal. Cuts matmul FLOPs ~(Ws / xwin)x on wide stages."""
    b = pl.program_id(0)
    n = pl.program_id(1)
    C = channels
    y0 = pl.multiple_of(starts_ref[b, n], align_y)
    start = pl.multiple_of(y0 * C, align_y * C)

    cp = pltpu.make_async_copy(
        src_hc_ref.at[b, pl.ds(start, band * C)], rt_vmem, sem
    )
    cp.start()

    W = x_ref.shape[3]
    G = W // chunk
    y0f = y0.astype(jnp.float32)

    js = jax.lax.broadcasted_iota(jnp.int32, (xwin, chunk), 0).astype(
        jnp.float32
    )
    kidx = (
        jax.lax.broadcasted_iota(jnp.int32, (band * C, chunk), 0) // C
    ).astype(jnp.float32)

    cp.wait()

    def row(r, _):
        for g in range(G):
            x0 = pl.multiple_of(xstarts_ref[b, n, g], 128)
            x = x_ref[0, 0, r, g * chunk : (g + 1) * chunk]         # [chunk]
            y = y_ref[0, 0, r, g * chunk : (g + 1) * chunk]
            wxT = jnp.maximum(
                0.0,
                1.0 - jnp.abs(x[None, :] - (x0.astype(jnp.float32) + js)),
            )                                                       # [xwin, chunk]
            rt = rt_vmem[:, pl.ds(x0, xwin)]                        # [bC, xwin]
            zt = jax.lax.dot_general(
                rt, wxT.astype(rt.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                       # [bC, chunk]
            wyT = jnp.maximum(
                0.0, 1.0 - jnp.abs(y[None, :] - (y0f + kidx))
            )
            prod = wyT * zt
            acc = prod[0:C, :]
            for k in range(1, band):
                acc = acc + prod[k * C : (k + 1) * C, :]
            out_ref[0, 0, r, :, g * chunk : (g + 1) * chunk] = acc.astype(
                out_ref.dtype
            )
        return 0

    jax.lax.fori_loop(0, tile_rows, row, 0, unroll=True)


def _group_mean(prod, C, G):
    """[C, W] f32 -> [G, W]: per-group channel means (the group correlation
    readout, reference mvs4net_utils.py:1066-1069). Value-level sublane
    slices — any granularity is legal on values (vs refs)."""
    cpg = C // G
    rows = []
    for gi in range(G):
        s = prod[gi * cpg]
        for j in range(1, cpg):
            s = s + prod[gi * cpg + j]
        rows.append((s / cpg)[None, :])
    return jnp.concatenate(rows, axis=0)


def _kernel_cor(starts_ref, x_ref, y_ref, src_hc_ref, ref_r, out_ref,
                rt_vmem, sem, *, band: int, tile_rows: int, channels: int,
                align_y: int, groups: int):
    """Full-width kernel + fused group-correlation epilogue: emits
    ``[TR, G, W]`` correlation against the (pre-transposed) reference rows
    instead of the ``[TR, C, W]`` warped features — the warped volume never
    round-trips HBM (eval-only path)."""
    b = pl.program_id(0)
    n = pl.program_id(1)
    C = channels
    y0 = pl.multiple_of(starts_ref[b, n], align_y)
    start = pl.multiple_of(y0 * C, align_y * C)

    cp = pltpu.make_async_copy(
        src_hc_ref.at[b, pl.ds(start, band * C)], rt_vmem, sem
    )
    cp.start()

    Ws = src_hc_ref.shape[2]
    W = x_ref.shape[3]
    y0f = y0.astype(jnp.float32)
    js = jax.lax.broadcasted_iota(jnp.int32, (Ws, W), 0).astype(jnp.float32)
    kidx = (
        jax.lax.broadcasted_iota(jnp.int32, (band * C, W), 0) // C
    ).astype(jnp.float32)

    cp.wait()
    rt = rt_vmem[:]

    def row(r, _):
        x = x_ref[0, 0, r]
        y = y_ref[0, 0, r]
        wxT = jnp.maximum(0.0, 1.0 - jnp.abs(x[None, :] - js))
        zt = jax.lax.dot_general(
            rt, wxT.astype(rt.dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        wyT = jnp.maximum(0.0, 1.0 - jnp.abs(y[None, :] - (y0f + kidx)))
        prod = wyT * zt
        acc = prod[0:C, :]
        for k in range(1, band):
            acc = acc + prod[k * C : (k + 1) * C, :]
        refr = ref_r[0, 0, pl.ds(r * C, C), :].astype(jnp.float32)
        out_ref[0, 0, r] = _group_mean(acc * refr, C, groups).astype(
            out_ref.dtype
        )
        return 0

    jax.lax.fori_loop(0, tile_rows, row, 0, unroll=True)


def _kernel_xchunk_cor(starts_ref, xstarts_ref, x_ref, y_ref, src_hc_ref,
                       ref_r, out_ref, rt_vmem, sem, *, band: int,
                       tile_rows: int, channels: int, align_y: int,
                       xwin: int, chunk: int, groups: int):
    """Column-chunked kernel + fused group-correlation epilogue."""
    b = pl.program_id(0)
    n = pl.program_id(1)
    C = channels
    y0 = pl.multiple_of(starts_ref[b, n], align_y)
    start = pl.multiple_of(y0 * C, align_y * C)

    cp = pltpu.make_async_copy(
        src_hc_ref.at[b, pl.ds(start, band * C)], rt_vmem, sem
    )
    cp.start()

    W = x_ref.shape[3]
    G = W // chunk
    y0f = y0.astype(jnp.float32)
    js = jax.lax.broadcasted_iota(jnp.int32, (xwin, chunk), 0).astype(
        jnp.float32
    )
    kidx = (
        jax.lax.broadcasted_iota(jnp.int32, (band * C, chunk), 0) // C
    ).astype(jnp.float32)

    cp.wait()

    def row(r, _):
        for g in range(G):
            x0 = pl.multiple_of(xstarts_ref[b, n, g], 128)
            x = x_ref[0, 0, r, g * chunk : (g + 1) * chunk]
            y = y_ref[0, 0, r, g * chunk : (g + 1) * chunk]
            wxT = jnp.maximum(
                0.0,
                1.0 - jnp.abs(x[None, :] - (x0.astype(jnp.float32) + js)),
            )
            rt = rt_vmem[:, pl.ds(x0, xwin)]
            zt = jax.lax.dot_general(
                rt, wxT.astype(rt.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            wyT = jnp.maximum(
                0.0, 1.0 - jnp.abs(y[None, :] - (y0f + kidx))
            )
            prod = wyT * zt
            acc = prod[0:C, :]
            for k in range(1, band):
                acc = acc + prod[k * C : (k + 1) * C, :]
            refr = ref_r[
                0, 0, pl.ds(r * C, C), g * chunk : (g + 1) * chunk
            ].astype(jnp.float32)
            out_ref[0, 0, r, :, g * chunk : (g + 1) * chunk] = _group_mean(
                acc * refr, C, groups
            ).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, tile_rows, row, 0, unroll=True)


def _tile_coords_ik(rel_ref, b, tile_idx, hypo, TR, W):
    """In-kernel plane-sweep coordinates for one row tile (the VPU half of
    core.geometry.warp_coords_xy): lift the tile's (u, v) pixel grid to the
    per-pixel depth hypotheses and perspective-divide with the reference's
    z==0 guard. ``rel_ref`` holds the first three rows of the relative
    projection, flattened ``[B, 12]`` (scalar prefetch); ``hypo`` is the
    tile's ``[TR, W]`` depth-value rows. ~20 VPU ops per pixel — removes
    the per-view XLA coords fusion AND its two [B, D, H, W] f32 HBM planes
    (~0.9 ms/view at the bench stage 4, r4 trace)."""
    v0 = (tile_idx * TR).astype(jnp.float32)
    u = jax.lax.broadcasted_iota(jnp.int32, (TR, W), 1).astype(jnp.float32)
    v = v0 + jax.lax.broadcasted_iota(jnp.int32, (TR, W), 0).astype(
        jnp.float32
    )
    m = [rel_ref[b, i] for i in range(12)]
    xn = (m[0] * u + m[1] * v + m[2]) * hypo + m[3]
    yn = (m[4] * u + m[5] * v + m[6]) * hypo + m[7]
    z = (m[8] * u + m[9] * v + m[10]) * hypo + m[11]
    z = jnp.where(z == 0.0, 1e-9, z)
    return xn / z, yn / z


def _band_start_ik(ys, *, Hs, band0, band, align_y):
    """In-kernel y-band start: EXACTLY the ``_v3_plan`` arithmetic
    (floor(min)-1, clip at the unwidened band, align down, clip at the
    widened band)."""
    y0 = jnp.floor(jnp.min(ys)).astype(jnp.int32) - 1
    y0 = jnp.clip(y0, 0, max(Hs - band0, 0))
    y0 = (y0 // align_y) * align_y
    y0 = jnp.clip(y0, 0, max((Hs - band) // align_y * align_y, 0))
    return pl.multiple_of(y0, align_y)


def _kernel_cor_ik(rel_ref, hypo_ref, src_hc_ref, ref_r, out_ref,
                   rt_vmem, sem, *, band: int, band0: int, tile_rows: int,
                   channels: int, align_y: int, groups: int, T_tiles: int,
                   Hs: int):
    """Full-width fused warp+group-cor with IN-KERNEL coordinates and band
    plan (no xg/yg/starts inputs — see _tile_coords_ik)."""
    b = pl.program_id(0)
    n = pl.program_id(1)
    C = channels
    W = hypo_ref.shape[2]
    hypo = hypo_ref[0]                                           # [TR, W]
    xs, ys = _tile_coords_ik(rel_ref, b, n % T_tiles, hypo, tile_rows, W)
    y0 = _band_start_ik(ys, Hs=Hs, band0=band0, band=band, align_y=align_y)
    start = pl.multiple_of(y0 * C, align_y * C)

    cp = pltpu.make_async_copy(
        src_hc_ref.at[b, pl.ds(start, band * C)], rt_vmem, sem
    )
    cp.start()

    Ws = src_hc_ref.shape[2]
    y0f = y0.astype(jnp.float32)
    js = jax.lax.broadcasted_iota(jnp.int32, (Ws, W), 0).astype(jnp.float32)
    kidx = (
        jax.lax.broadcasted_iota(jnp.int32, (band * C, W), 0) // C
    ).astype(jnp.float32)

    cp.wait()
    rt = rt_vmem[:]

    # static Python loop: xs/ys are computed VALUES (not refs) — Mosaic has
    # no dynamic vector slice, so the row index must be trace-time constant
    for r in range(tile_rows):
        x = xs[r]
        y = ys[r]
        wxT = jnp.maximum(0.0, 1.0 - jnp.abs(x[None, :] - js))
        zt = jax.lax.dot_general(
            rt, wxT.astype(rt.dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        wyT = jnp.maximum(0.0, 1.0 - jnp.abs(y[None, :] - (y0f + kidx)))
        prod = wyT * zt
        acc = prod[0:C, :]
        for k in range(1, band):
            acc = acc + prod[k * C : (k + 1) * C, :]
        refr = ref_r[0, 0, r * C : (r + 1) * C, :W].astype(jnp.float32)
        out_ref[0, 0, r] = _group_mean(acc * refr, C, groups).astype(
            out_ref.dtype
        )


def _kernel_xchunk_cor_ik(rel_ref, hypo_ref, src_hc_ref, ref_r, out_ref,
                          rt_vmem, sem, *, band: int, band0: int,
                          tile_rows: int, channels: int, align_y: int,
                          xwin: int, chunk: int, groups: int, T_tiles: int,
                          Hs: int):
    """Column-chunked fused warp+group-cor with IN-KERNEL coordinates and
    band/chunk plan."""
    b = pl.program_id(0)
    n = pl.program_id(1)
    C = channels
    W = hypo_ref.shape[2]
    G = W // chunk
    Ws_pad = src_hc_ref.shape[2]
    hypo = hypo_ref[0]
    xs, ys = _tile_coords_ik(rel_ref, b, n % T_tiles, hypo, tile_rows, W)
    y0 = _band_start_ik(ys, Hs=Hs, band0=band0, band=band, align_y=align_y)
    start = pl.multiple_of(y0 * C, align_y * C)

    cp = pltpu.make_async_copy(
        src_hc_ref.at[b, pl.ds(start, band * C)], rt_vmem, sem
    )
    cp.start()

    y0f = y0.astype(jnp.float32)
    js = jax.lax.broadcasted_iota(jnp.int32, (xwin, chunk), 0).astype(
        jnp.float32
    )
    kidx = (
        jax.lax.broadcasted_iota(jnp.int32, (band * C, chunk), 0) // C
    ).astype(jnp.float32)

    cp.wait()

    xmax0 = max((Ws_pad - xwin) // chunk * chunk, 0)

    # per-chunk column-window starts (the _v3_plan kw arithmetic) from the
    # chunk's x min over ALL tile rows — row-independent, computed once
    x0s = []
    for g in range(G):
        minx = jnp.min(xs[:, g * chunk : (g + 1) * chunk])
        x0 = (jnp.floor(minx).astype(jnp.int32) - 1) // chunk * chunk
        x0s.append(pl.multiple_of(jnp.clip(x0, 0, xmax0), chunk))

    # static Python loops: xs/ys are computed VALUES (not refs) — Mosaic has
    # no dynamic vector slice, so the row index must be trace-time constant
    for r in range(tile_rows):
        for g in range(G):
            x0 = x0s[g]
            x = xs[r, g * chunk : (g + 1) * chunk]
            y = ys[r, g * chunk : (g + 1) * chunk]
            wxT = jnp.maximum(
                0.0,
                1.0 - jnp.abs(x[None, :] - (x0.astype(jnp.float32) + js)),
            )
            rt = rt_vmem[:, pl.ds(x0, xwin)]
            zt = jax.lax.dot_general(
                rt, wxT.astype(rt.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            wyT = jnp.maximum(
                0.0, 1.0 - jnp.abs(y[None, :] - (y0f + kidx))
            )
            prod = wyT * zt
            acc = prod[0:C, :]
            for k in range(1, band):
                acc = acc + prod[k * C : (k + 1) * C, :]
            refr = ref_r[
                0, 0, r * C : (r + 1) * C, g * chunk : (g + 1) * chunk
            ].astype(jnp.float32)
            out_ref[0, 0, r, :, g * chunk : (g + 1) * chunk] = _group_mean(
                acc * refr, C, groups
            ).astype(out_ref.dtype)


def warp_cor_tiles_pallas_v3_ik(
    src: jnp.ndarray,        # [B, Hs, Ws(128-padded), C]
    rel12: jnp.ndarray,      # [B, 12] f32 — rows 0..2 of rel_proj, flat
    hypo: jnp.ndarray,       # [B, D, H, W] f32 depth hypotheses
    ref: jnp.ndarray,        # [B, H, W, C]
    *,
    band: int,               # alignment-widened band (as _v3_plan)
    band0: int,              # pre-widen band (the plan's first clip)
    align_y: int,
    groups: int,
    tile_rows: int,
    xwin: int = 0,           # 0 = full-width contraction
    chunk: int = 128,
    interpret: bool = False,
    cw: bool = False,        # src/ref arrive CHANNELS-IN-SUBLANES
                             # ([B, H, C, Wp], zero lane pad) — the fused
                             # top-down kernels' native output; src_hc and
                             # ref_t become FREE reshapes (no NHWC
                             # transposes)
) -> jnp.ndarray:            # [B, N, TR, groups, W] kernel-native
    """Fused warp + group-correlation with coordinates, y-band and column
    plan ALL computed in-kernel from (rel12, hypo) — no [B, D, H, W]
    coordinate planes, no XLA plan reductions."""
    _, D, H, W = hypo.shape
    TR = tile_rows
    N = D * (H // TR)
    T_tiles = H // TR
    hypo_r = hypo.reshape(hypo.shape[0], N * TR, W).astype(jnp.float32)
    if cw:
        B, Hs, C, Ws = src.shape
        src_hc = src.reshape(B, Hs * C, Ws)
        Wr = ref.shape[3]
        ref_t = ref.reshape(B, T_tiles, TR * C, Wr)
    else:
        B, Hs, Ws, C = src.shape
        src_hc = jnp.swapaxes(src, 2, 3).reshape(B, Hs * C, Ws)
        Wr = W
        ref_t = jnp.swapaxes(ref, 2, 3).reshape(B, T_tiles, TR * C, W)

    in_specs = [
        pl.BlockSpec(
            (1, TR, W), lambda b, n, *_: (b, n, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        pl.BlockSpec(
            (1, 1, TR * C, Wr),
            lambda b, n, *_: (b, n % T_tiles, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, N),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, TR, groups, W),
            lambda b, n, *_: (b, n, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((band * C, Ws), src.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    if xwin:
        kern = functools.partial(
            _kernel_xchunk_cor_ik, band=band, band0=band0, tile_rows=TR,
            channels=C, align_y=align_y, xwin=xwin, chunk=chunk,
            groups=groups, T_tiles=T_tiles, Hs=Hs,
        )
    else:
        kern = functools.partial(
            _kernel_cor_ik, band=band, band0=band0, tile_rows=TR,
            channels=C, align_y=align_y, groups=groups, T_tiles=T_tiles,
            Hs=Hs,
        )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, N, TR, groups, W), src.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(rel12.astype(jnp.float32), hypo_r, src_hc, ref_t)


def warp_tiles_pallas_v3(
    src: jnp.ndarray,       # [B, Hs, Ws, C]
    xcoords: jnp.ndarray,   # [B, N, TR, W] f32
    ycoords: jnp.ndarray,   # [B, N, TR, W] f32
    starts: jnp.ndarray,    # [B, N] int32, aligned to align_y rows
    *,
    band: int,
    align_y: int = 1,
    xstarts: jnp.ndarray | None = None,  # [B, N, G] int32, 128-aligned
    xwin: int = 0,
    chunk: int = 128,
    ref: jnp.ndarray | None = None,      # [B, H, W, C]: fuse group-cor
    groups: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:  # [B, N, TR, C, W]; with ref: [B, N, TR, groups, W]
    B, Hs, Ws, C = src.shape
    _, N, TR, W = xcoords.shape
    # merge (row, channel) into sublanes: [B, Hs*C, Ws]
    src_hc = jnp.swapaxes(src, 2, 3)  # [B, Hs, C, Ws]
    src_hc = src_hc.reshape(B, Hs * C, Ws)

    chunked = xstarts is not None
    nsp = 2 if chunked else 1
    cor = ref is not None

    def idx4(b, n, *_):
        return (b, n, 0, 0)

    def idx5(b, n, *_):
        return (b, n, 0, 0, 0)

    in_specs = [
        pl.BlockSpec((1, 1, TR, W), idx4, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, TR, W), idx4, memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
    ]
    inputs = [xcoords, ycoords, src_hc]
    Co = C
    if cor:
        # the reference rows for output tile t = n % T, channels in
        # sublanes: [B, T, TR*C, W] (T = H // TR; grid index n = d*T + t)
        H = ref.shape[1]
        T_tiles = H // TR
        ref_t = jnp.swapaxes(ref, 2, 3).reshape(B, T_tiles, TR * C, W)
        in_specs.append(
            pl.BlockSpec(
                (1, 1, TR * C, W),
                lambda b, n, *_: (b, n % T_tiles, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        inputs.append(ref_t)
        Co = groups

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=nsp,
        grid=(B, N),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, TR, Co, W), idx5, memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((band * C, Ws), src.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    if chunked and cor:
        kern = functools.partial(
            _kernel_xchunk_cor, band=band, tile_rows=TR, channels=C,
            align_y=align_y, xwin=xwin, chunk=chunk, groups=groups,
        )
        scalars = (starts, xstarts)
    elif chunked:
        kern = functools.partial(
            _kernel_xchunk, band=band, tile_rows=TR, channels=C,
            align_y=align_y, xwin=xwin, chunk=chunk,
        )
        scalars = (starts, xstarts)
    elif cor:
        kern = functools.partial(
            _kernel_cor, band=band, tile_rows=TR, channels=C,
            align_y=align_y, groups=groups,
        )
        scalars = (starts,)
    else:
        kern = functools.partial(
            _kernel, band=band, tile_rows=TR, channels=C, align_y=align_y
        )
        scalars = (starts,)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, N, TR, Co, W), src.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*scalars, *inputs)
