"""Pallas TPU kernel: x-banded (column-chunked) homography warp, forward.

Second-generation kernel (v1 = ``warp_kernel.py``, kept for comparison).
Same banded-interpolation-matmul math as ``ops/warp_mxu`` but with the
j-contraction cut from the full source width ``Ws`` to a per-chunk column
band ``xband`` — the x-span of a ``tile_rows x tile_cols`` output block
along its epipolar segment is ~``tile_cols``, not ``Ws``:

  per grid cell (b, n = row tile), per column chunk g (static G unroll):
    DMA   win  <- src_t[b, x0_g : x0_g+xband, y0*C : y0*C+band*C]
                  (src pre-transposed to [B, Ws, Hs*C]: the window lands
                  [xband, band*C] — already in matmul layout, no reshapes)
    per output row r (static TR unroll):
      VPU   wx   = relu(1 - |x_p - (x0_g + iota_j)|)      [TC, xband]
      MXU   z    = wx @ win                                [TC, band*C]
      VPU   wy   = relu(1 - |y_p - (y0 + iota_k)|)        [TC, band*C]
      MXU   out  = (wy * z) @ fold                         [TC, C]

FLOPs per pixel drop from ``Ws * band*C`` to ``xband * band*C`` (~3-4x at
the full-res stage, where Ws=640 and xband≈208) and the weight matrices
never touch HBM. All G window DMAs are issued before the first wait so the
copies overlap the first chunks' compute.

Alignment: the window's lane start ``y0*C`` must be 128-aligned (y0 to
``128//C`` rows — the band is widened accordingly by the caller) and the
sublane start ``x0`` to 8 columns (xband widened by the caller). Widening a
band only adds zero-weight taps, so results are unchanged.

Zeros padding: out-of-range taps get zero weight (ops/warp_mxu docstring);
x taps outside the chunk window would silently lose their contribution,
which is why callers must validate ``band_coverage(..., xband=...) == 0``
for their geometry (ops/warp_mxu.band_coverage).

The backward lives in ``warp_xband_bwd.py`` (same banding, HBM
read-modify-write accumulation over the sequential TPU grid).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(ystarts_ref, xstarts_ref, x_ref, y_ref, src_t_ref, out_ref,
            win_vmem, sems, *, band: int, xband: int, tile_rows: int,
            tile_cols: int, channels: int, align_y: int,
            fold_mode: str = "matmul"):
    b = pl.program_id(0)
    n = pl.program_id(1)
    C = channels
    TC = tile_cols
    G = x_ref.shape[3] // TC
    y0 = pl.multiple_of(ystarts_ref[b, n], align_y)
    ystart = pl.multiple_of(y0 * C, align_y * C)

    # issue every chunk's window DMA up front (overlap copy with compute)
    copies = []
    for g in range(G):
        x0 = pl.multiple_of(xstarts_ref[b, n, g], 8)
        cp = pltpu.make_async_copy(
            src_t_ref.at[b, pl.ds(x0, xband), pl.ds(ystart, band * C)],
            win_vmem.at[g],
            sems.at[g],
        )
        cp.start()
        copies.append(cp)

    y0f = y0.astype(jnp.float32)
    # fixed 0/1 fold matrix: (k, c) merged axis -> c
    jrow = jax.lax.broadcasted_iota(jnp.int32, (band * C, C), 0)
    ccol = jax.lax.broadcasted_iota(jnp.int32, (band * C, C), 1)
    fold = (jrow % C == ccol).astype(jnp.float32)
    # per-lane source-row index of the merged (k, c) axis
    kidx = (
        jax.lax.broadcasted_iota(jnp.int32, (TC, band * C), 1) // C
    ).astype(jnp.float32)
    js = jax.lax.broadcasted_iota(jnp.int32, (TC, xband), 1).astype(jnp.float32)

    for g in range(G):
        copies[g].wait()
        win = win_vmem[g]  # [xband, band*C]
        x0f = xstarts_ref[b, n, g].astype(jnp.float32)
        for r in range(tile_rows):
            x = jnp.transpose(
                x_ref[0, 0, pl.ds(r, 1), pl.ds(g * TC, TC)], (1, 0)
            )  # [TC, 1]
            y = jnp.transpose(
                y_ref[0, 0, pl.ds(r, 1), pl.ds(g * TC, TC)], (1, 0)
            )
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(x - (x0f + js)))
            z = jnp.dot(
                wx.astype(win.dtype), win, preferred_element_type=jnp.float32
            )  # [TC, band*C]
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(y - (y0f + kidx)))
            zz = wy * z
            if fold_mode == "slices":
                # (k, c)->c reduction as `band` static lane-slice adds: the
                # fold matmul's N=C=8 output lanes run the MXU at 1/16
                out = zz[:, 0:C]
                for k in range(1, band):
                    out = out + zz[:, k * C : (k + 1) * C]
            else:
                out = jnp.dot(zz, fold, preferred_element_type=jnp.float32)
            out_ref[0, 0, r, pl.ds(g * TC, TC)] = out.astype(out_ref.dtype)


def warp_tiles_pallas_xband(
    src: jnp.ndarray,       # [B, Hs, Ws, C]
    xcoords: jnp.ndarray,   # [B, N, TR, W] f32
    ycoords: jnp.ndarray,   # [B, N, TR, W] f32
    ystarts: jnp.ndarray,   # [B, N] int32, pre-aligned to ``align_y`` rows
    xstarts: jnp.ndarray,   # [B, N, G] int32, pre-aligned to 8 columns
    *,
    band: int,
    xband: int,
    tile_cols: int,
    align_y: int = 1,
    interpret: bool = False,
    fold_mode: str = "matmul",
) -> jnp.ndarray:           # [B, N, TR, W, C]
    B, Hs, Ws, C = src.shape
    _, N, TR, W = xcoords.shape
    G = W // tile_cols
    src_t = jnp.swapaxes(src, 1, 2).reshape(B, Ws, Hs * C)

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
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, TR, W, C), lambda b, n, ys, xs: (b, n, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((G, xband, band * C), src.dtype),
            pltpu.SemaphoreType.DMA((G,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _kernel, band=band, xband=xband, tile_rows=TR,
            tile_cols=tile_cols, channels=C, align_y=align_y,
        ),
        out_shape=jax.ShapeDtypeStruct((B, N, TR, W, C), src.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(ystarts, xstarts, xcoords, ycoords, src_t)
