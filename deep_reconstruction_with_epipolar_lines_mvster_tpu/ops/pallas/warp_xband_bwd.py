"""Pallas TPU kernel: x-banded homography-warp BACKWARD (dL/dsrc).

The VJP of the banded interpolation matmul is itself banded:

  dsrc[x, (y, c)] += sum_p  wx[p, x] * wy[p, (y, c)] * g[p, c]

so per (row tile, column chunk) the contribution is one MXU matmul

  dwin = wx^T @ (wy * (g @ fold^T))        [xband, band*C]

accumulated over the tile's rows in a VMEM f32 scratch, then applied to an
HBM ``dsrc_t [B, Ws, Hs*C]`` accumulator with an explicit DMA
read-modify-write. TPU Pallas grid cells execute SEQUENTIALLY on a core, so
the RMW is race-free: each chunk waits for its write before the next
chunk's read (windows of neighbouring chunks/tiles overlap). The
accumulator is a zero-initialized f32 input aliased to the output
(``input_output_aliases``), cast back to the source dtype by the caller.

Gradient flows to ``src`` only — coordinates are stop-gradient, like the
reference's detached homographies (``mvs4net_utils.py:21-67``) and the XLA
scan backward (``ops/warp_mxu._warp_one_bwd``).

Scatter-free by construction: the reference's ``grid_sample`` backward is a
scatter-add, which XLA lowers catastrophically on TPU (~2.2 s/view at the
DTU stage-4 shape — BENCH_NOTES.md); here every write is a contiguous
2-D window.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(ystarts_ref, xstarts_ref, x_ref, y_ref, g_ref, dsrc_ref, out_ref,
            win_vmem, acc_vmem, sem_r, sem_w, *, band: int, xband: int,
            tile_rows: int, tile_cols: int, channels: int, align_y: int):
    b = pl.program_id(0)
    n = pl.program_id(1)
    C = channels
    TC = tile_cols
    G = x_ref.shape[3] // TC
    y0 = pl.multiple_of(ystarts_ref[b, n], align_y)
    ystart = pl.multiple_of(y0 * C, align_y * C)
    y0f = y0.astype(jnp.float32)

    # NOTE r4 negative: running these matmuls with bf16 factors (f32
    # accumulation) measured 514 vs 503 ms/step — the per-row matmuls are
    # overhead-bound, not stream-rate-bound; keep exact f32 factors.
    jrow = jax.lax.broadcasted_iota(jnp.int32, (band * C, C), 0)
    ccol = jax.lax.broadcasted_iota(jnp.int32, (band * C, C), 1)
    foldT = (ccol == jrow % C).astype(jnp.float32).T  # [C, band*C] as 2-D
    kidx = (
        jax.lax.broadcasted_iota(jnp.int32, (TC, band * C), 1) // C
    ).astype(jnp.float32)
    js = jax.lax.broadcasted_iota(jnp.int32, (TC, xband), 1).astype(jnp.float32)

    for g in range(G):
        x0 = pl.multiple_of(xstarts_ref[b, n, g], 8)
        x0f = xstarts_ref[b, n, g].astype(jnp.float32)

        acc_vmem[...] = jnp.zeros_like(acc_vmem)
        for r in range(tile_rows):
            x = jnp.transpose(
                x_ref[0, 0, pl.ds(r, 1), pl.ds(g * TC, TC)], (1, 0)
            )  # [TC, 1]
            y = jnp.transpose(
                y_ref[0, 0, pl.ds(r, 1), pl.ds(g * TC, TC)], (1, 0)
            )
            gr = g_ref[0, 0, r, pl.ds(g * TC, TC)]  # [TC, C]
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(x - (x0f + js)))
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(y - (y0f + kidx)))
            gexp = jnp.dot(
                gr.astype(jnp.float32), foldT, preferred_element_type=jnp.float32
            )  # [TC, band*C]
            acc_vmem[...] += jax.lax.dot_general(
                wx, wy * gexp, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [xband, band*C]

        # HBM read-modify-write ON THE OUTPUT ref (sequential grid + per-chunk
        # wait => safe; reading the aliased INPUT ref does not observe prior
        # grid cells' writes in interpret mode). dsrc_ref only provides the
        # zero init through the alias.
        rd = pltpu.make_async_copy(
            out_ref.at[b, pl.ds(x0, xband), pl.ds(ystart, band * C)],
            win_vmem, sem_r,
        )
        rd.start()
        rd.wait()
        win_vmem[...] += acc_vmem[...]
        wr = pltpu.make_async_copy(
            win_vmem,
            out_ref.at[b, pl.ds(x0, xband), pl.ds(ystart, band * C)],
            sem_w,
        )
        wr.start()
        wr.wait()


def _kernel_v2(ystarts_ref, xstarts_ref, x_ref, y_ref, g_ref, dsrc_ref,
               out_ref, acc_vmem, win_vmem, sem_r, sem_w, *, band: int,
               xband: int, tile_rows: int, tile_cols: int, channels: int,
               align_y: int):
    """v2: accumulate ALL column chunks of a tile into one FULL-WIDTH VMEM
    scratch and apply ONE read-modify-write per grid cell. The v1 kernel
    issued 2*G serialized DMAs per cell (rd.wait -> add -> wr.wait per
    chunk); at the DTU stage-4 shape that is 10 round-trip-latency-bound
    DMAs x 1536 cells per view (r4g trace: bwd ~17.7 ms/view while its
    matmul FLOPs account for <half). Inner per-row compute keeps the v1
    form: merging (row, col) into one sublane axis via reshape is a
    lane->sublane relayout Mosaic refuses to lower (measured r4;
    negative)."""
    b = pl.program_id(0)
    n = pl.program_id(1)
    C = channels
    TC = tile_cols
    G = x_ref.shape[3] // TC
    y0 = pl.multiple_of(ystarts_ref[b, n], align_y)
    ystart = pl.multiple_of(y0 * C, align_y * C)
    y0f = y0.astype(jnp.float32)

    jrow = jax.lax.broadcasted_iota(jnp.int32, (band * C, C), 0)
    ccol = jax.lax.broadcasted_iota(jnp.int32, (band * C, C), 1)
    foldT = (ccol == jrow % C).astype(jnp.float32).T  # [C, band*C]
    kidx = (
        jax.lax.broadcasted_iota(jnp.int32, (TC, band * C), 1) // C
    ).astype(jnp.float32)
    js = jax.lax.broadcasted_iota(jnp.int32, (TC, xband), 1).astype(
        jnp.float32
    )

    acc_vmem[...] = jnp.zeros_like(acc_vmem)
    for g in range(G):
        x0 = pl.multiple_of(xstarts_ref[b, n, g], 8)
        x0f = xstarts_ref[b, n, g].astype(jnp.float32)
        for r in range(tile_rows):
            x = jnp.transpose(
                x_ref[0, 0, pl.ds(r, 1), pl.ds(g * TC, TC)], (1, 0)
            )  # [TC, 1]
            y = jnp.transpose(
                y_ref[0, 0, pl.ds(r, 1), pl.ds(g * TC, TC)], (1, 0)
            )
            gr = g_ref[0, 0, r, pl.ds(g * TC, TC)]  # [TC, C]
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(x - (x0f + js)))
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(y - (y0f + kidx)))
            gexp = jnp.dot(
                gr.astype(jnp.float32), foldT,
                preferred_element_type=jnp.float32,
            )
            contrib = jax.lax.dot_general(
                wx, wy * gexp, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [xband, band*C]
            cur = acc_vmem[pl.ds(x0, xband), :]
            acc_vmem[pl.ds(x0, xband), :] = cur + contrib

    rd = pltpu.make_async_copy(
        out_ref.at[b, :, pl.ds(ystart, band * C)], win_vmem, sem_r
    )
    rd.start()
    rd.wait()
    win_vmem[...] += acc_vmem[...]
    wr = pltpu.make_async_copy(
        win_vmem, out_ref.at[b, :, pl.ds(ystart, band * C)], sem_w
    )
    wr.start()
    wr.wait()


def _kernel_v3(ystarts_ref, xstarts_ref, x_ref, y_ref, g_ref, dsrc_ref,
               out_ref, wx_vmem, wyg_vmem, win_vmem, sem_r, sem_w, *,
               band: int, xband: int, tile_rows: int, tile_cols: int,
               channels: int, align_y: int):
    """v3: merge the tile's rows into ONE matmul per column chunk.

    v1 contracts per row — K = tile_cols (only 32/64 at the narrow train
    stages), so the MXU streams 8 underfilled matmuls per chunk plus 8
    accumulate adds; the r4g trace shows the s2/s3 backwards running far
    off the matmul roofline while s4 (K=128) is near it. v3 stages the
    per-row weight factors into ``[TR*TC, .]`` VMEM scratches (static
    sublane-offset stores — the direct [TR,TC]->[TR*TC,1] reshape is a
    lane->sublane relayout Mosaic refuses) and contracts all P = TR*TC
    rows at once. The deep-K matmul streams at full rate, which also
    makes bf16 factors (``factor_dtype``) profitable — the r4 bf16
    negative was measured on the overhead-bound per-row form."""
    b = pl.program_id(0)
    n = pl.program_id(1)
    C = channels
    TC = tile_cols
    TR = tile_rows
    G = x_ref.shape[3] // TC
    y0 = pl.multiple_of(ystarts_ref[b, n], align_y)
    ystart = pl.multiple_of(y0 * C, align_y * C)
    y0f = y0.astype(jnp.float32)

    jrow = jax.lax.broadcasted_iota(jnp.int32, (band * C, C), 0)
    ccol = jax.lax.broadcasted_iota(jnp.int32, (band * C, C), 1)
    foldT = (ccol == jrow % C).astype(jnp.float32).T  # [C, band*C]
    kidx = (
        jax.lax.broadcasted_iota(jnp.int32, (TC, band * C), 1) // C
    ).astype(jnp.float32)
    js = jax.lax.broadcasted_iota(jnp.int32, (TC, xband), 1).astype(
        jnp.float32
    )

    for g in range(G):
        x0 = pl.multiple_of(xstarts_ref[b, n, g], 8)
        x0f = xstarts_ref[b, n, g].astype(jnp.float32)

        for r in range(TR):
            x = jnp.transpose(
                x_ref[0, 0, pl.ds(r, 1), pl.ds(g * TC, TC)], (1, 0)
            )  # [TC, 1]
            y = jnp.transpose(
                y_ref[0, 0, pl.ds(r, 1), pl.ds(g * TC, TC)], (1, 0)
            )
            gr = g_ref[0, 0, r, pl.ds(g * TC, TC)]  # [TC, C]
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(x - (x0f + js)))
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(y - (y0f + kidx)))
            gexp = jnp.dot(
                gr.astype(jnp.float32), foldT,
                preferred_element_type=jnp.float32,
            )
            wx_vmem[pl.ds(r * TC, TC), :] = wx.astype(wx_vmem.dtype)
            wyg_vmem[pl.ds(r * TC, TC), :] = (wy * gexp).astype(
                wyg_vmem.dtype
            )

        contrib = jax.lax.dot_general(
            wx_vmem[...], wyg_vmem[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [xband, band*C]

        rd = pltpu.make_async_copy(
            out_ref.at[b, pl.ds(x0, xband), pl.ds(ystart, band * C)],
            win_vmem, sem_r,
        )
        rd.start()
        rd.wait()
        win_vmem[...] += contrib
        wr = pltpu.make_async_copy(
            win_vmem,
            out_ref.at[b, pl.ds(x0, xband), pl.ds(ystart, band * C)],
            sem_w,
        )
        wr.start()
        wr.wait()


def _kernel_v4(ystarts_ref, xstarts_ref, x_ref, y_ref, g_ref, out_ref,
               wx_vmem, wyg_vmem, acc_vmem, sem_w, *, band: int, xband: int,
               tile_rows: int, tile_cols: int, channels: int, align_y: int):
    """v4: merged-row matmul (v3) + the WHOLE per-view ``dsrc`` accumulated
    in one VMEM scratch, flushed to HBM once per batch element.

    v1/v3 issue 2·G serialized read-modify-write DMAs per grid cell (rd.wait
    -> add -> wr.wait); at the narrow train stages those round-trips, not
    the matmuls, dominate (r4g trace: s2 8 ms/view for 1/16 of s4's FLOPs).
    The full transposed accumulator ``[Ws, Hs*C]`` f32 is small enough for
    VMEM at every DTU stage (s4 10.5 MB, s3 5.2, s2 2.6 — caller gates on
    it fitting), so v4 zeroes it at n==0, adds each chunk's contribution
    with aligned VMEM dynamic slices (the same 128-lane/8-sublane window
    starts the HBM RMW used), and DMAs the block out at the last grid cell
    of the batch element. Zero HBM traffic until the single flush."""
    b = pl.program_id(0)
    n = pl.program_id(1)
    N = pl.num_programs(1)
    C = channels
    TC = tile_cols
    TR = tile_rows
    G = x_ref.shape[3] // TC
    y0 = pl.multiple_of(ystarts_ref[b, n], align_y)
    ystart = pl.multiple_of(y0 * C, align_y * C)
    y0f = y0.astype(jnp.float32)

    jrow = jax.lax.broadcasted_iota(jnp.int32, (band * C, C), 0)
    ccol = jax.lax.broadcasted_iota(jnp.int32, (band * C, C), 1)
    foldT = (ccol == jrow % C).astype(jnp.float32).T  # [C, band*C]
    kidx = (
        jax.lax.broadcasted_iota(jnp.int32, (TC, band * C), 1) // C
    ).astype(jnp.float32)
    js = jax.lax.broadcasted_iota(jnp.int32, (TC, xband), 1).astype(
        jnp.float32
    )

    @pl.when(n == 0)
    def _zero():
        acc_vmem[...] = jnp.zeros_like(acc_vmem)

    for g in range(G):
        x0 = pl.multiple_of(xstarts_ref[b, n, g], 8)
        x0f = xstarts_ref[b, n, g].astype(jnp.float32)

        for r in range(TR):
            x = jnp.transpose(
                x_ref[0, 0, pl.ds(r, 1), pl.ds(g * TC, TC)], (1, 0)
            )  # [TC, 1]
            y = jnp.transpose(
                y_ref[0, 0, pl.ds(r, 1), pl.ds(g * TC, TC)], (1, 0)
            )
            gr = g_ref[0, 0, r, pl.ds(g * TC, TC)]  # [TC, C]
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(x - (x0f + js)))
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(y - (y0f + kidx)))
            gexp = jnp.dot(
                gr.astype(jnp.float32), foldT,
                preferred_element_type=jnp.float32,
            )
            wx_vmem[pl.ds(r * TC, TC), :] = wx.astype(wx_vmem.dtype)
            wyg_vmem[pl.ds(r * TC, TC), :] = (wy * gexp).astype(
                wyg_vmem.dtype
            )

        contrib = jax.lax.dot_general(
            wx_vmem[...], wyg_vmem[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [xband, band*C]
        cur = acc_vmem[pl.ds(x0, xband), pl.ds(ystart, band * C)]
        acc_vmem[pl.ds(x0, xband), pl.ds(ystart, band * C)] = cur + contrib

    @pl.when(n == N - 1)
    def _flush():
        wr = pltpu.make_async_copy(acc_vmem, out_ref.at[b], sem_w)
        wr.start()
        wr.wait()


def _kernel_v4_ik(rel_ref, hypo_ref, g_ref, out_ref, wx_vmem, wyg_vmem,
                  acc_vmem, sem_w, *, band: int, band0: int, xband: int,
                  tile_rows: int, tile_cols: int, channels: int,
                  align_y: int, T_tiles: int, Hs: int, Ws: int):
    """v4 with IN-KERNEL coordinates and window plan: the tile's warp
    coordinates are recomputed from (rel12 scalar-prefetch, depth-hypo
    block) exactly like the ik forward (ops/pallas/warp_fwd_v3
    ``_tile_coords_ik``), and the y-band / per-chunk x-window starts are
    derived in-kernel with the ``_xband_tile_plan`` arithmetic. Removes
    the two per-view ``[B, D, H, W]`` f32 coordinate-plane residuals AND
    the XLA plan reductions from the backward (r4g train trace:
    coords/plan fusions ~25 ms/step); the only residual the VJP needs is
    the stage's shared depth-hypothesis volume."""
    from .warp_fwd_v3 import _band_start_ik, _tile_coords_ik

    b = pl.program_id(0)
    n = pl.program_id(1)
    N = pl.num_programs(1)
    C = channels
    TC = tile_cols
    TR = tile_rows
    W = hypo_ref.shape[2]
    G = W // TC
    xs, ys = _tile_coords_ik(rel_ref, b, n % T_tiles, hypo_ref[0], TR, W)
    y0 = _band_start_ik(ys, Hs=Hs, band0=band0, band=band, align_y=align_y)
    ystart = pl.multiple_of(y0 * C, align_y * C)
    y0f = y0.astype(jnp.float32)

    jrow = jax.lax.broadcasted_iota(jnp.int32, (band * C, C), 0)
    ccol = jax.lax.broadcasted_iota(jnp.int32, (band * C, C), 1)
    foldT = (ccol == jrow % C).astype(jnp.float32).T  # [C, band*C]
    kidx = (
        jax.lax.broadcasted_iota(jnp.int32, (TC, band * C), 1) // C
    ).astype(jnp.float32)
    js = jax.lax.broadcasted_iota(jnp.int32, (TC, xband), 1).astype(
        jnp.float32
    )

    @pl.when(n == 0)
    def _zero():
        acc_vmem[...] = jnp.zeros_like(acc_vmem)

    xmax0 = max((Ws - xband) // 8 * 8, 0)
    for g in range(G):
        xmin = jnp.min(xs[:, g * TC : (g + 1) * TC])
        x0i = (jnp.floor(xmin).astype(jnp.int32) - 1) // 8 * 8
        x0 = pl.multiple_of(jnp.clip(x0i, 0, xmax0), 8)
        x0f = x0.astype(jnp.float32)

        for r in range(TR):
            x = jnp.transpose(xs[r : r + 1, g * TC : (g + 1) * TC], (1, 0))
            y = jnp.transpose(ys[r : r + 1, g * TC : (g + 1) * TC], (1, 0))
            gr = g_ref[0, 0, r, pl.ds(g * TC, TC)]  # [TC, C]
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(x - (x0f + js)))
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(y - (y0f + kidx)))
            gexp = jnp.dot(
                gr.astype(jnp.float32), foldT,
                preferred_element_type=jnp.float32,
            )
            wx_vmem[pl.ds(r * TC, TC), :] = wx.astype(wx_vmem.dtype)
            wyg_vmem[pl.ds(r * TC, TC), :] = (wy * gexp).astype(
                wyg_vmem.dtype
            )

        contrib = jax.lax.dot_general(
            wx_vmem[...], wyg_vmem[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [xband, band*C]
        cur = acc_vmem[pl.ds(x0, xband), pl.ds(ystart, band * C)]
        acc_vmem[pl.ds(x0, xband), pl.ds(ystart, band * C)] = cur + contrib

    @pl.when(n == N - 1)
    def _flush():
        wr = pltpu.make_async_copy(acc_vmem, out_ref.at[b], sem_w)
        wr.start()
        wr.wait()


def warp_tiles_pallas_xband_bwd_ik(
    g: jnp.ndarray,         # [B, N, TR, W, C] f32/bf16 cotangent
    rel12: jnp.ndarray,     # [B, 12] f32 — rows 0..2 of rel_proj, flat
    hypo: jnp.ndarray,      # [B, D, H, W] f32 depth hypotheses
    src_shape,              # (B, Hs, Ws, C)
    *,
    band: int,              # alignment-widened band
    band0: int,             # pre-widen band (the plan's first clip)
    xband: int,             # alignment-widened x window
    tile_rows: int,
    tile_cols: int,
    align_y: int = 1,
    interpret: bool = False,
    factor_dtype=jnp.float32,
) -> jnp.ndarray:           # [B, Hs, Ws, C] f32
    """v4 backward with in-kernel coordinates — see ``_kernel_v4_ik``."""
    B, Hs, Ws, C = src_shape
    _, D, H, W = hypo.shape
    TR = tile_rows
    N = D * (H // TR)
    T_tiles = H // TR
    hypo_r = hypo.reshape(B, N * TR, W).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, N),
        in_specs=[
            pl.BlockSpec(
                (1, TR, W), lambda b, n, rel: (b, n, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, TR, W, C), lambda b, n, rel: (b, n, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[
            pltpu.VMEM((TR * tile_cols, xband), factor_dtype),
            pltpu.VMEM((TR * tile_cols, band * C), factor_dtype),
            pltpu.VMEM((Ws, Hs * C), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    dsrc_t = pl.pallas_call(
        functools.partial(
            _kernel_v4_ik, band=band, band0=band0, xband=xband,
            tile_rows=TR, tile_cols=tile_cols, channels=C, align_y=align_y,
            T_tiles=T_tiles, Hs=Hs, Ws=Ws,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Ws, Hs * C), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(rel12.astype(jnp.float32), hypo_r, g)
    return jnp.swapaxes(dsrc_t.reshape(B, Ws, Hs, C), 1, 2)


def warp_tiles_pallas_xband_bwd(
    g: jnp.ndarray,         # [B, N, TR, W, C] f32/bf16 cotangent
    xcoords: jnp.ndarray,   # [B, N, TR, W] f32
    ycoords: jnp.ndarray,   # [B, N, TR, W] f32
    ystarts: jnp.ndarray,   # [B, N] int32, aligned
    xstarts: jnp.ndarray,   # [B, N, G] int32, aligned
    src_shape,              # (B, Hs, Ws, C)
    *,
    band: int,
    xband: int,
    tile_cols: int,
    align_y: int = 1,
    interpret: bool = False,
    mode: str = "v1",
    factor_dtype=jnp.float32,
) -> jnp.ndarray:           # [B, Hs, Ws, C] f32
    B, Hs, Ws, C = src_shape
    _, N, TR, W = xcoords.shape

    if mode == "v4":
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, N),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, TR, W), lambda b, n, ys, xs: (b, n, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, TR, W), lambda b, n, ys, xs: (b, n, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, TR, W, C), lambda b, n, ys, xs: (b, n, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            scratch_shapes=[
                pltpu.VMEM((TR * tile_cols, xband), factor_dtype),
                pltpu.VMEM((TR * tile_cols, band * C), factor_dtype),
                pltpu.VMEM((Ws, Hs * C), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )
        dsrc_t = pl.pallas_call(
            functools.partial(
                _kernel_v4, band=band, xband=xband, tile_rows=TR,
                tile_cols=tile_cols, channels=C, align_y=align_y,
            ),
            out_shape=jax.ShapeDtypeStruct((B, Ws, Hs * C), jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(ystarts, xstarts, xcoords, ycoords, g)
        return jnp.swapaxes(dsrc_t.reshape(B, Ws, Hs, C), 1, 2)

    dsrc0 = jnp.zeros((B, Ws, Hs * C), jnp.float32)

    v2 = mode == "v2"
    if mode == "v3":
        scratch = [
            pltpu.VMEM((TR * tile_cols, xband), factor_dtype),
            pltpu.VMEM((TR * tile_cols, band * C), factor_dtype),
            pltpu.VMEM((xband, band * C), jnp.float32),
        ]
    else:
        scratch = [
            pltpu.VMEM((Ws if v2 else xband, band * C), jnp.float32),
            pltpu.VMEM((Ws if v2 else xband, band * C), jnp.float32),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, N),
        in_specs=[
            pl.BlockSpec(
                (1, 1, TR, W), lambda b, n, ys, xs: (b, n, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, TR, W), lambda b, n, ys, xs: (b, n, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, TR, W, C), lambda b, n, ys, xs: (b, n, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # dsrc in/out
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=scratch + [
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    kern = {"v1": _kernel, "v2": _kernel_v2, "v3": _kernel_v3}[mode]
    dsrc_t = pl.pallas_call(
        functools.partial(
            kern, band=band, xband=xband, tile_rows=TR,
            tile_cols=tile_cols, channels=C, align_y=align_y,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Ws, Hs * C), jnp.float32),
        grid_spec=grid_spec,
        input_output_aliases={5: 0},  # dsrc0 (6th operand incl. 2 prefetch)
        interpret=interpret,
    )(ystarts, xstarts, xcoords, ycoords, g, dsrc0)
    return jnp.swapaxes(dsrc_t.reshape(B, Ws, Hs, C), 1, 2)
