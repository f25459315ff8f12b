"""Pallas TPU kernel for the banded-matmul homography warp (forward).

Same math as ``ops/warp_mxu`` (bilinear sampling as a banded interpolation
matmul — see that module's docstring) but with the interpolation weight
matrices built **in VMEM** instead of materialized in HBM per tile, and the
source-row band DMA'd directly from HBM:

  per grid cell (b, tile):
    DMA   band   <- src_t[b, :, y0:y0+BAND, :]   (src pre-transposed to
                                                  [B, Ws, Hs, C] so the band
                                                  is [Ws, BAND, C]-contiguous)
    per output row r of the tile:
      VPU   wx   =  relu(1 - |x_p - iota_j|)        [W, Ws]
      VPU   wy   =  relu(1 - |y_p - (y0 + iota_k)|) [W, BAND]
      MXU   z    =  wx @ band.reshape(Ws, BAND*C)   [W, BAND*C]
      VPU   out  =  sum_k wy * z                    [W, C]

Mosaic has no dynamic vector gather (probed), which is why the dense banded
formulation is used at all. Coordinate blocks are shaped ``[1,1,TR,W]`` and
outputs ``[1,1,TR,W,C]`` to satisfy the TPU (8,128) block-tiling rule. The
backward stays on the XLA scan path (contiguous dynamic-update-slice adds —
see ops/warp_mxu._warp_one_bwd).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(starts_ref, x_ref, y_ref, src_t_ref, out_ref, band_vmem, sem,
            *, band: int, tile_rows: int, channels: int, align: int):
    b = pl.program_id(0)
    n = pl.program_id(1)
    y0 = pl.multiple_of(starts_ref[b, n], align)
    C = channels

    # src_t is pre-merged to [B, Ws, Hs*C]; the band slice lands 2-D.
    # start is provably 128-lane aligned: y0 is a multiple of align=128//C.
    start = pl.multiple_of(y0 * C, align * C)
    cp = pltpu.make_async_copy(
        src_t_ref.at[b, :, pl.ds(start, band * C)], band_vmem, sem
    )
    cp.start()

    Ws = src_t_ref.shape[1]
    W = x_ref.shape[3]
    y0f = y0.astype(jnp.float32)

    cp.wait()
    rows2d = band_vmem[:]  # [Ws, band*C]

    # fixed 0/1 matrix folding the (k, c) axis back to c: S[k*C+c, c'] = c==c'
    jrow = jax.lax.broadcasted_iota(jnp.int32, (band * C, C), 0)
    ccol = jax.lax.broadcasted_iota(jnp.int32, (band * C, C), 1)
    fold = (jrow % C == ccol).astype(jnp.float32)

    # per-lane depth-row index of the merged (k, c) axis, for wy expansion
    kidx = (
        jax.lax.broadcasted_iota(jnp.int32, (W, band * C), 1) // C
    ).astype(jnp.float32)

    def row(i, _):
        x = jnp.transpose(x_ref[0, 0, pl.ds(i, 1), :], (1, 0))  # [W, 1]
        y = jnp.transpose(y_ref[0, 0, pl.ds(i, 1), :], (1, 0))
        js = jax.lax.broadcasted_iota(jnp.int32, (W, Ws), 1).astype(jnp.float32)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(x - js))
        z = jnp.dot(
            wx.astype(rows2d.dtype), rows2d, preferred_element_type=jnp.float32
        )  # [W, band*C]
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(y - (y0f + kidx)))
        out = jnp.dot(wy * z, fold, preferred_element_type=jnp.float32)
        out_ref[0, 0, i] = out.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, tile_rows, row, 0)


def warp_tiles_pallas(
    src: jnp.ndarray,       # [B, Hs, Ws, C]
    xcoords: jnp.ndarray,   # [B, N, TR, W] f32
    ycoords: jnp.ndarray,   # [B, N, TR, W] f32
    starts: jnp.ndarray,    # [B, N] int32, pre-aligned to ``align`` rows
    *,
    band: int,
    align: int = 1,
    interpret: bool = False,
) -> jnp.ndarray:           # [B, N, TR, W, C]
    B, Hs, Ws, C = src.shape
    _, N, TR, W = xcoords.shape
    src_t = jnp.swapaxes(src, 1, 2).reshape(B, Ws, Hs * C)  # merged (row, ch)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, N),
        in_specs=[
            pl.BlockSpec(
                (1, 1, TR, W), lambda b, n, starts: (b, n, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, TR, W), lambda b, n, starts: (b, n, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # src_t in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, 1, TR, W, C), lambda b, n, starts: (b, n, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((Ws, band * C), src.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _kernel, band=band, tile_rows=TR, channels=C, align=align
        ),
        out_shape=jax.ShapeDtypeStruct((B, N, TR, W, C), src.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, xcoords, ycoords, src_t)
