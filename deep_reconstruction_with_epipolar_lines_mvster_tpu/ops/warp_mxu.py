"""MXU-native homography warp: bilinear sampling as banded interpolation
matmuls — no gather, no scatter.

Why: XLA's TPU lowering of the per-pixel gather in the naive warp costs
~240 ms forward and ~2.2 s backward (scatter-add) per source view at the
DTU stage-4 shape — the train step is gather-bound. Bilinear sampling has
1-pixel support, so it IS a (very sparse) linear operator; on TPU the fast
way to apply it is to *densify locally*:

  out[p, c] = sum_k  Wy[p, k] * ( sum_j Wx[p, j] * band[k, j, c] )

with ``Wx[p, j] = relu(1 - |x_p - j|)`` over the full source width and
``Wy[p, k] = relu(1 - |y_p - (y0 + k)|)`` over a K-row source band around the
tile's epipolar rows. Both weight matrices come from ``broadcasted_iota``
comparisons (VPU), the j-contraction is a dense MXU matmul, and out-of-range
coordinates get zero weight — which reproduces ``grid_sample``'s
zeros-padding semantics exactly (tap at -0.5 ⇒ 0.5 * src[0], matching the
OOB-tap-is-zero rule).

The row tiles stream through a ``lax.scan``: forward stacks per-tile
outputs; the custom-VJP backward re-builds the tile weights and accumulates
``dL/dsrc`` with contiguous ``dynamic_update_slice`` adds into the scan
carry (in-place in the XLA while loop) — no scatter.

Band coverage: K must cover the tile's source-row span. For MVS plane-sweep
geometry the span per TR output rows is TR·(local y-scale) + epipolar tilt
across the tile — small for real rigs. Rows falling outside the band lose
their contribution (they get zero weight); ``band_coverage`` measures the
violation fraction so callers/tests can size K (the default is generous).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.geometry import warp_coords


def _tile_sample(
    src: jnp.ndarray,        # [Hs, Ws, C]
    coords: jnp.ndarray,     # [P, 2] pixel (x, y) for this tile
    y_start: jnp.ndarray,    # scalar int32
    band: int,
) -> jnp.ndarray:            # [P, C]
    Hs, Ws, C = src.shape
    P = coords.shape[0]
    x = coords[:, 0]
    y = coords[:, 1]

    js = jax.lax.broadcasted_iota(jnp.float32, (P, Ws), 1)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] - js))          # [P, Ws]
    ks = jax.lax.broadcasted_iota(jnp.float32, (P, band), 1)
    wy = jnp.maximum(
        0.0, 1.0 - jnp.abs(y[:, None] - (y_start.astype(jnp.float32) + ks))
    )                                                              # [P, K]

    rows = jax.lax.dynamic_slice(
        src, (y_start, 0, 0), (band, Ws, C)
    )                                                              # [K, Ws, C]
    z = jax.lax.dot_general(
        wx.astype(src.dtype),
        rows.transpose(1, 0, 2).reshape(Ws, band * C),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(P, band, C)                                          # [P, K, C]
    return (wy[:, :, None].astype(jnp.float32) * z).sum(axis=1).astype(src.dtype)


def _save(src, coords):
    """custom-VJP residual pack: store the warp coordinates as two separate
    ``[..., H, W]`` planes instead of the ``[..., 2]`` array. A residual whose
    minor dimension is 2 lands in the lane axis of the saved buffer and XLA
    pads lanes to 128 — a 64x HBM inflation that OOM'd the v3 train step at
    the DTU recipe shape (34.8 GiB of padded residuals, `_probe_r3c.py`)."""
    return src, coords[..., 0], coords[..., 1]


def _load(res):
    src, cx, cy = res
    return src, jnp.stack((cx, cy), axis=-1)


def _tile_starts(coords_y: jnp.ndarray, band: int, src_h: int) -> jnp.ndarray:
    """Per-tile band start rows: floor(min y) - 1, clamped so the K-row slice
    stays in range. coords_y: [T, P]."""
    y0 = jnp.floor(coords_y.min(axis=1)).astype(jnp.int32) - 1
    return jnp.clip(y0, 0, max(src_h - band, 0))


# ------------------------------------------------- x-banded (chunked) path ---
#
# The full-width formulation above contracts over all Ws source columns per
# output pixel (Ws*K*C FLOPs/pixel). But along an epipolar segment the source
# x span of a (tile_rows x tile_cols) output block is ~tile_cols * local
# x-scale — a narrow column band. Chunking each row tile into G = W/tile_cols
# column blocks with a per-block [band, xband, C] source window cuts the
# contraction from Ws to xband (~3-5x on the full-res stage) while keeping
# everything dense: the G chunk slices are unrolled (static G, dynamic
# starts — contiguous dynamic_slice, not gather) and the G matmuls run as one
# batched dot_general per scan iteration, which also amortizes the scan
# overhead over G-fold more work.


def _block_sample(
    src: jnp.ndarray,       # [Hs, Ws, C]
    coords_g: jnp.ndarray,  # [G, P, 2] pixel (x, y); P = tile_rows*tile_cols
    y0: jnp.ndarray,        # scalar int32 — shared row-band start
    x0g: jnp.ndarray,       # [G] int32 — per-chunk column-band starts
    band: int,
    xband: int,
) -> jnp.ndarray:           # [G, P, C]
    Hs, Ws, C = src.shape
    G, P, _ = coords_g.shape
    rows = jax.lax.dynamic_slice(src, (y0, 0, 0), (band, Ws, C))
    blocks = jnp.stack([
        jax.lax.dynamic_slice(rows, (0, x0g[j], 0), (band, xband, C))
        for j in range(G)
    ])                                                             # [G, K, Bx, C]
    x = coords_g[..., 0]
    y = coords_g[..., 1]
    js = jax.lax.broadcasted_iota(jnp.float32, (G, P, xband), 2)
    wx = jnp.maximum(
        0.0, 1.0 - jnp.abs(x[..., None] - (x0g[:, None, None].astype(jnp.float32) + js))
    )                                                              # [G, P, Bx]
    ks = jax.lax.broadcasted_iota(jnp.float32, (G, P, band), 2)
    wy = jnp.maximum(
        0.0, 1.0 - jnp.abs(y[..., None] - (y0.astype(jnp.float32) + ks))
    )                                                              # [G, P, K]
    z = jax.lax.dot_general(
        wx.astype(src.dtype),
        blocks.transpose(0, 2, 1, 3).reshape(G, xband, band * C),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(G, P, band, C)
    return (wy[..., None].astype(jnp.float32) * z).sum(axis=2).astype(src.dtype)


def _split_blocks(coords, tile_rows, tile_cols):
    """[D, H, W, 2] -> [D*T, G, P, 2] with T=H/tile_rows, G=W/tile_cols,
    P=tile_rows*tile_cols (row-tile major so each scan step is one row tile
    with its G column chunks)."""
    D, H, W, _ = coords.shape
    T, G = H // tile_rows, W // tile_cols
    c = coords.reshape(D, T, tile_rows, G, tile_cols, 2)
    c = c.transpose(0, 1, 3, 2, 4, 5)
    return c.reshape(D * T, G, tile_rows * tile_cols, 2)


def _merge_blocks(out, D, H, W, tile_rows, tile_cols, C):
    """[D*T, G, P, C] -> [D, H, W, C] (inverse of _split_blocks)."""
    T, G = H // tile_rows, W // tile_cols
    o = out.reshape(D, T, G, tile_rows, tile_cols, C)
    o = o.transpose(0, 1, 3, 2, 4, 5)
    return o.reshape(D, H, W, C)


def _chunk_starts(coords_x, xband, src_w):
    """Per-chunk column-band starts: floor(min x) - 1, clamped.
    coords_x: [N, G, P]."""
    x0 = jnp.floor(coords_x.min(axis=-1)).astype(jnp.int32) - 1
    return jnp.clip(x0, 0, max(src_w - xband, 0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _warp_one_banded(src, coords, band, tile_rows, xband, tile_cols):
    return _warp_one_banded_fwd(src, coords, band, tile_rows, xband, tile_cols)[0]


def _warp_one_banded_fwd(src, coords, band, tile_rows, xband, tile_cols):
    D, H, W, _ = coords.shape
    Hs, Ws, C = src.shape
    blocks = _split_blocks(coords, tile_rows, tile_cols)   # [N, G, P, 2]
    ystarts = _tile_starts(
        blocks[..., 1].reshape(blocks.shape[0], -1), band, Hs
    )                                                      # [N]
    xstarts = _chunk_starts(blocks[..., 0], xband, Ws)     # [N, G]

    def body(_, xs):
        bc, y0, x0g = xs
        return None, _block_sample(src, bc, y0, x0g, band, xband)

    _, out = jax.lax.scan(body, None, (blocks, ystarts, xstarts))
    return _merge_blocks(out, D, H, W, tile_rows, tile_cols, C), _save(src, coords)


def _warp_one_banded_bwd(band, tile_rows, xband, tile_cols, res, g):
    src, coords = _load(res)
    D, H, W, _ = coords.shape
    Hs, Ws, C = src.shape
    blocks = _split_blocks(coords, tile_rows, tile_cols)
    N, G, P, _ = blocks.shape
    ystarts = _tile_starts(blocks[..., 1].reshape(N, -1), band, Hs)
    xstarts = _chunk_starts(blocks[..., 0], xband, Ws)
    T = H // tile_rows
    g_blocks = g.reshape(D, T, tile_rows, G, tile_cols, C)
    g_blocks = g_blocks.transpose(0, 1, 3, 2, 4, 5).reshape(N, G, P, C)

    def body(dsrc, xs):
        bc, y0, x0g, gt = xs
        x = bc[..., 0]
        y = bc[..., 1]
        js = jax.lax.broadcasted_iota(jnp.float32, (G, P, xband), 2)
        wx = jnp.maximum(
            0.0,
            1.0 - jnp.abs(x[..., None] - (x0g[:, None, None].astype(jnp.float32) + js)),
        )
        ks = jax.lax.broadcasted_iota(jnp.float32, (G, P, band), 2)
        wy = jnp.maximum(
            0.0, 1.0 - jnp.abs(y[..., None] - (y0.astype(jnp.float32) + ks))
        )
        # d blocks[g, k, j, c] = sum_p wx[g, p, j] * wy[g, p, k] * g[g, p, c]
        wyg = (wy[..., None] * gt.astype(jnp.float32)[:, :, None, :]).reshape(
            G, P, band * C
        )
        dblocks = jax.lax.dot_general(
            wx, wyg, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [G, Bx, band*C]
        dblocks = dblocks.reshape(G, xband, band, C).transpose(0, 2, 1, 3)
        # chunk x-ranges may overlap: accumulate sequentially into the row band
        drows = jnp.zeros((band, Ws, C), dtype=jnp.float32)
        for j in range(G):
            cur = jax.lax.dynamic_slice(drows, (0, x0g[j], 0), (band, xband, C))
            drows = jax.lax.dynamic_update_slice(
                drows, cur + dblocks[j], (0, x0g[j], 0)
            )
        cur = jax.lax.dynamic_slice(dsrc, (y0, 0, 0), (band, Ws, C))
        dsrc = jax.lax.dynamic_update_slice(dsrc, cur + drows, (y0, 0, 0))
        return dsrc, None

    dsrc0 = jnp.zeros((Hs, Ws, C), dtype=jnp.float32)
    dsrc, _ = jax.lax.scan(body, dsrc0, (blocks, ystarts, xstarts, g_blocks))
    return dsrc.astype(src.dtype), None  # coords are stop-gradient


_warp_one_banded.defvjp(_warp_one_banded_fwd, _warp_one_banded_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _warp_one(src, coords, band, tile_rows):
    return _warp_one_fwd(src, coords, band, tile_rows)[0]


def _split_tiles(coords, tile_rows):
    D, H, W, _ = coords.shape
    T = H // tile_rows
    return coords.reshape(D * T, tile_rows * W, 2)


def _warp_one_fwd(src, coords, band, tile_rows):
    """src [Hs, Ws, C]; coords [D, H, W, 2] -> warped [D, H, W, C]."""
    D, H, W, _ = coords.shape
    Hs, Ws, C = src.shape
    tiles = _split_tiles(coords, tile_rows)            # [N, P, 2]
    starts = _tile_starts(tiles[..., 1], band, Hs)     # [N]

    def body(_, xs):
        tile_coords, y0 = xs
        return None, _tile_sample(src, tile_coords, y0, band)

    _, out = jax.lax.scan(body, None, (tiles, starts))
    out = out.reshape(D, H // tile_rows, tile_rows, W, C).reshape(D, H, W, C)
    return out, _save(src, coords)


def _warp_one_bwd(band, tile_rows, res, g):
    src, coords = _load(res)
    D, H, W, _ = coords.shape
    Hs, Ws, C = src.shape
    tiles = _split_tiles(coords, tile_rows)
    starts = _tile_starts(tiles[..., 1], band, Hs)
    g_tiles = g.reshape(D, H // tile_rows, tile_rows, W, C).reshape(
        D * (H // tile_rows), tile_rows * W, C
    )

    def body(dsrc, xs):
        tile_coords, y0, gt = xs
        P = tile_coords.shape[0]
        x = tile_coords[:, 0]
        y = tile_coords[:, 1]
        js = jax.lax.broadcasted_iota(jnp.float32, (P, Ws), 1)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] - js))
        ks = jax.lax.broadcasted_iota(jnp.float32, (P, band), 1)
        wy = jnp.maximum(
            0.0, 1.0 - jnp.abs(y[:, None] - (y0.astype(jnp.float32) + ks))
        )
        # d rows[k, j, c] = sum_p wx[p, j] * wy[p, k] * g[p, c]
        wyg = (wy[:, :, None] * gt.astype(jnp.float32)[:, None, :]).reshape(
            P, band * C
        )
        drows = jax.lax.dot_general(
            wx.astype(jnp.float32), wyg,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Ws, band*C]
        drows = drows.reshape(Ws, band, C).transpose(1, 0, 2)
        cur = jax.lax.dynamic_slice(dsrc, (y0, 0, 0), (band, Ws, C))
        dsrc = jax.lax.dynamic_update_slice(
            dsrc, cur + drows.astype(dsrc.dtype), (y0, 0, 0)
        )
        return dsrc, None

    dsrc0 = jnp.zeros_like(src, dtype=jnp.float32)
    dsrc, _ = jax.lax.scan(body, dsrc0, (tiles, starts, g_tiles))
    return dsrc.astype(src.dtype), None  # coords are stop-gradient


_warp_one.defvjp(_warp_one_fwd, _warp_one_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _warp_batched_pallas_xband(src, coords, band, tile_rows, xband, tile_cols):
    return _warp_batched_pallas_xband_fwd(
        src, coords, band, tile_rows, xband, tile_cols
    )[0]


def _xband_tile_plan(coords, band, tile_rows, xband, tile_cols, Hs, Ws, C):
    """Shared fwd/bwd geometry for the x-banded Pallas kernels: row-tile
    coord grids and the ALIGNED window starts/sizes.

    Alignment (widening only ADDS zero-weight taps, so results are
    unchanged): row starts aligned down to ``align_y = 128 // C`` (the
    window's VMEM lane start is ``y0*C``) with the band widened by one
    align; column starts aligned down to 8 sublanes with ``xband`` widened
    by 8."""
    B, D, H, W, _ = coords.shape
    align_y, band_al, xband_al = _xband_align(band, xband, C)

    tiles = jax.vmap(lambda c: _split_tiles(c, tile_rows))(coords)  # [B,N,P,2]
    ystarts = jax.vmap(lambda t: _tile_starts(t[..., 1], band, Hs))(tiles)
    ystarts = (ystarts // align_y) * align_y
    ystarts = jnp.clip(
        ystarts, 0, max(((Hs - band_al) // align_y) * align_y, 0)
    )
    N = tiles.shape[1]
    xg = tiles[..., 0].reshape(B, N, tile_rows, W)
    yg = tiles[..., 1].reshape(B, N, tile_rows, W)
    G = W // tile_cols
    xmin = xg.reshape(B, N, tile_rows, G, tile_cols).min(axis=(2, 4))  # [B,N,G]
    xstarts = (jnp.floor(xmin).astype(jnp.int32) - 1) // 8 * 8
    xstarts = jnp.clip(xstarts, 0, max((Ws - xband_al) // 8 * 8, 0))
    return (
        xg, yg, ystarts.astype(jnp.int32), xstarts.astype(jnp.int32),
        band_al, xband_al, align_y,
    )


def _warp_batched_pallas_xband_fwd(src, coords, band, tile_rows, xband, tile_cols):
    """Forward through the x-banded Pallas kernel (ops/pallas/warp_xband_kernel)."""
    from .pallas.warp_xband_kernel import warp_tiles_pallas_xband

    B, Hs, Ws, C = src.shape
    _, D, H, W, _ = coords.shape
    xg, yg, ystarts, xstarts, band_al, xband_al, align_y = _xband_tile_plan(
        coords, band, tile_rows, xband, tile_cols, Hs, Ws, C
    )
    interpret = jax.default_backend() not in ("tpu", "axon")
    out = warp_tiles_pallas_xband(
        src, xg, yg, ystarts, xstarts,
        band=band_al, xband=xband_al, tile_cols=tile_cols, align_y=align_y,
        interpret=interpret,
    )
    return out.reshape(B, D, H, W, C), _save(src, coords)


# Backward-kernel selector (module-level: the bwd runs inside custom_vjp
# rules whose nondiff args are already saturated with geometry; jit captures
# the value at trace time). v1 = per-row matmuls + per-chunk HBM RMW;
# v3 = merged-row big-K matmul per chunk; v4 = merged-row matmul + the WHOLE
# per-view dsrc accumulated in VMEM, one HBM flush per batch element
# (ops/pallas/warp_xband_bwd). "auto" picks v4 when its VMEM accumulator
# fits (every DTU stage; measured r5c: DTU train step 513 -> 433 ms/step,
# loss identical), else v1. factor_dtype bfloat16 halves the merged-matmul
# cost at ~2^-9 relative weight error (measured neutral at the DTU recipe).
# ik=True: the v4 backward computes coordinates + window plan in-kernel
# (default; measured r5e at the DTU recipe: 425 -> 422 ms/step, loss
# identical, and the per-view coordinate-plane residuals disappear)
_BWD_KERNEL = {"mode": "auto", "factor_dtype": jnp.float32, "ik": True}

# VMEM budget for the v4 accumulator + factor scratches, leaving ~1.5 MB
# of the 16 MB core VMEM for the double-buffered coordinate/cotangent
# blocks (~0.6 MB at the DTU stage-4 geometry). DTU s4 needs 12.94 MiB
# (acc [768, 512*8] f32 + factors) and MUST stay inside the budget — it is
# the stage where v4 wins most (17.7 -> ~12 ms/view, _probe_r5c: full
# train step 513 -> 433 ms with v4 at every stage).
_V4_VMEM_BUDGET = 14 * 1024 * 1024


def set_bwd_kernel(mode: str = "auto", factor_dtype=jnp.float32,
                   ik: bool | None = None) -> None:
    """``ik=True`` additionally routes the hybrid path's v4 backward
    through the in-kernel-coordinates variant (``_warp_hybrid_ik``) —
    no coordinate-plane residuals, plan computed in-kernel."""
    _BWD_KERNEL["mode"] = mode
    _BWD_KERNEL["factor_dtype"] = factor_dtype
    if ik is not None:
        _BWD_KERNEL["ik"] = ik


def _resolve_bwd_mode(src_shape, band_al, xband_al, tile_rows, tile_cols):
    """'auto' -> v4 when the full-view f32 accumulator [Ws, Hs*C] plus the
    merged-row factor scratches fit the VMEM budget, else v1."""
    mode = _BWD_KERNEL["mode"]
    if mode != "auto":
        return mode
    B, Hs, Ws, C = src_shape
    fsize = jnp.dtype(_BWD_KERNEL["factor_dtype"]).itemsize
    need = (
        Ws * Hs * C * 4
        + tile_rows * tile_cols * (xband_al + band_al * C) * fsize
    )
    return "v4" if need <= _V4_VMEM_BUDGET else "v1"


def _warp_batched_pallas_xband_bwd(band, tile_rows, xband, tile_cols, res, g):
    """dL/dsrc through the x-banded Pallas backward kernel (HBM RMW
    accumulation over the sequential grid — ops/pallas/warp_xband_bwd)."""
    from .pallas.warp_xband_bwd import warp_tiles_pallas_xband_bwd

    src, coords = _load(res)
    B, Hs, Ws, C = src.shape
    _, D, H, W, _ = coords.shape
    xg, yg, ystarts, xstarts, band_al, xband_al, align_y = _xband_tile_plan(
        coords, band, tile_rows, xband, tile_cols, Hs, Ws, C
    )
    T = H // tile_rows
    g_blocks = g.reshape(B, D * T, tile_rows, W, C)
    interpret = jax.default_backend() not in ("tpu", "axon")
    dsrc = warp_tiles_pallas_xband_bwd(
        g_blocks, xg, yg, ystarts, xstarts, (B, Hs, Ws, C),
        band=band_al, xband=xband_al, tile_cols=tile_cols, align_y=align_y,
        interpret=interpret,
        mode=_resolve_bwd_mode(src.shape, band_al, xband_al,
                               tile_rows, tile_cols),
        factor_dtype=_BWD_KERNEL["factor_dtype"],
    )
    return dsrc.astype(src.dtype), None


_warp_batched_pallas_xband.defvjp(
    _warp_batched_pallas_xband_fwd, _warp_batched_pallas_xband_bwd
)


def _v3_align_y(C: int, dtype) -> int:
    """Sublane-DMA alignment of the v3 kernel's band start (rows): y0*C must
    be a multiple of the sublane tile (16 for bf16/f16, 8 for f32)."""
    import math

    st = 16 if jnp.dtype(dtype).itemsize == 2 else 8
    return st // math.gcd(C, st)


# --- single-source v3 launch-plan geometry -------------------------------
# These constants/formulas are consumed BOTH by the host-side plan
# (_v3_plan, below) and by the in-kernel-coords twins (warp_cor_v3_ik and
# ops/pallas/warp_fwd_v3._band_start_ik / the chunk-start loops), whose
# correctness contract is bit-identical window arithmetic. Never tweak one
# side without the other — hence one definition.

V3_CHUNK = 128          # column-chunk width (output lanes per chunk)
V3_XWIN_MARGIN = 130    # window slack: 127 alignment + 3-tap span


def _v3_band_k(band: int, align_y: int) -> int:
    """Alignment-widened band: flooring the start never drops coverage."""
    return band + (align_y if align_y > 1 else 0)


def _v3_xwin(xband: int) -> int:
    """128-lane-aligned source-window width for the chunked kernels."""
    return -(-(xband + V3_XWIN_MARGIN) // V3_CHUNK) * V3_CHUNK if xband else 0


def _v3_pad_width(src):
    """Zero-pad the source width to the 128-lane tiling Mosaic requires of
    the band DMA. Exact: padded columns carry zeros, and taps landing on
    them reproduce the warp's zeros-padding semantics."""
    Ws = src.shape[2]
    Ws_pad = -(-Ws // 128) * 128
    if Ws_pad != Ws:
        src = jnp.pad(src, ((0, 0), (0, 0), (0, Ws_pad - Ws), (0, 0)))
    return src, Ws_pad


def _xband_align(band: int, xband: int, C: int):
    """Backward-kernel window alignment (shared by _xband_tile_plan, the
    in-kernel-coords bwd, and homo_warp_mxu's eligibility checks): row
    starts align to ``align_y = 128 // C`` lanes, columns to 8 sublanes,
    with each window widened by one alignment."""
    align_y = max(1, 128 // C)
    band_al = -(-band // align_y) * align_y + align_y
    xband_al = -(-(xband + 8) // 8) * 8
    return align_y, band_al, xband_al


def _v3_plan(src, cx, cy, band, tile_rows, xband):
    """Shared launch plan for the v3 forward kernels (plain warp and fused
    warp+cor): 128-lane source width pad, alignment-widened band, aligned
    per-tile row starts, per-chunk column-window starts. ``cx``/``cy`` are
    separate ``[B, D, H, W]`` coordinate planes (never the stacked
    ``[..., 2]`` form, whose interleaved materialization + de-interleave
    measured ~0.7 ms/view at the bench stage 4)."""
    B, Hs, Ws, C = src.shape
    _, D, H, W = cx.shape
    align_y = _v3_align_y(C, src.dtype)
    src_k, Ws_pad = _v3_pad_width(src)
    # widen the band by the alignment so flooring the start never drops
    # coverage at the far edge; (band + align_y)*C stays a 16-sublane
    # multiple by construction
    band_k = _v3_band_k(band, align_y)
    N = D * (H // tile_rows)
    yt = cy.reshape(B, N, tile_rows * W)
    starts = jax.vmap(lambda t: _tile_starts(t, band, Hs))(yt)
    starts = (starts // align_y) * align_y
    starts = jnp.clip(starts, 0, max((Hs - band_k) // align_y * align_y, 0))
    xg = cx.reshape(B, N, tile_rows, W)
    yg = cy.reshape(B, N, tile_rows, W)

    # column-chunked variant on wide stages: 128-lane-aligned source
    # windows of xwin = roundup(xband+130, 128) columns per 128-col chunk
    chunk = V3_CHUNK
    xwin = _v3_xwin(xband)
    kw = {}
    if xwin and Ws_pad >= xwin and W % chunk == 0:
        G = W // chunk
        xmin = xg.reshape(B, N, tile_rows, G, chunk).min(axis=(2, 4))
        x0 = ((jnp.floor(xmin).astype(jnp.int32) - 1) // chunk) * chunk
        x0 = jnp.clip(x0, 0, max((Ws_pad - xwin) // chunk * chunk, 0))
        kw = dict(xstarts=x0.astype(jnp.int32), xwin=xwin, chunk=chunk)
    return src_k, xg, yg, starts.astype(jnp.int32), band_k, align_y, kw


def _warp_batched_pallas_v3_fwd(src, coords, band, tile_rows, xband, tile_cols):
    """Forward through the v3 flipped-layout Pallas kernel
    (ops/pallas/warp_fwd_v3). Band starts are aligned DOWN by up to
    align_y-1 rows (band kept at its configured width, which is sized with
    ~5 rows of slack over real MVS tile spans — band_coverage remains the
    validation hook). Wide sources additionally use the column-chunked
    kernel: 128-lane-aligned source windows of ``xwin = roundup(xband+130,
    128)`` columns per 128-column output chunk cut the j-contraction FLOPs
    ~(Ws/xwin)x."""
    from .pallas.warp_fwd_v3 import warp_tiles_pallas_v3

    B, Hs, Ws, C = src.shape
    _, D, H, W, _ = coords.shape
    src_k, xg, yg, starts, band_k, align_y, kw = _v3_plan(
        src, coords[..., 0], coords[..., 1], band, tile_rows, xband
    )
    interpret = jax.default_backend() not in ("tpu", "axon")
    out = warp_tiles_pallas_v3(
        src_k, xg, yg, starts,
        band=band_k, align_y=align_y, interpret=interpret, **kw,
    )  # [B, N, TR, C, W]
    T = H // tile_rows
    out = out.reshape(B, D, T, tile_rows, C, W).transpose(0, 1, 2, 3, 5, 4)
    return out.reshape(B, D, H, W, C), _save(src, coords)


def v3_fwd_eligible(src_shape, W: int, band: int, dtype,
                    v3_min_w: int = 256) -> bool:
    """Static eligibility of the v3 FORWARD kernel (shared by the plain warp
    and the fused warp+group-cor path): the aligned band must fit the
    source, its sublane-merged (k, c) extent must tile, and output rows
    must be wide enough to fill lanes."""
    Hs, _, C = src_shape[-3:]
    ay = _v3_align_y(C, dtype)
    band_k = band + (ay if ay > 1 else 0)
    sub_tile = 16 if jnp.dtype(dtype).itemsize == 2 else 8
    return (band_k * C) % sub_tile == 0 and W >= v3_min_w and band_k <= Hs


def warp_cor_v3(src, ref, cx, cy, band, tile_rows, xband,
                groups, native=False):
    """Warp + group-correlation in ONE v3 kernel pass (eval-only; no VJP):
    ``[B,Hs,Ws,C] x [B,H,W,C] -> [B,D,H,W,G]``. The kernel's epilogue
    multiplies the warped rows by the pre-transposed reference rows and
    emits per-group channel means — the warped volume (the largest
    per-view tensor, 84 MB at the bench stage 4) never round-trips HBM.
    Same eligibility/plan as the v3 forward; caller must pre-check with
    the same conditions ``homo_warp_mxu`` uses (see
    ``warp_cor.epipolar_aggregate``).

    ``native=True`` returns the KERNEL-native layout ``[B, D, T, TR, G, W]``
    (a free reshape of the pallas output) instead of ``[B, D, H, W, G]`` —
    the NHWC transpose costs ~4.5 ms/view at the bench stage 4 (relayout
    copy + packed reshape + reduce in a forced layout, r4f trace); the
    caller accumulates attention natively and relayouts ONCE.

    ``cx``/``cy``: separate ``[B, D, H, W]`` coordinate planes
    (core.geometry.warp_coords_xy) — never the stacked ``[..., 2]`` form,
    whose interleaved materialization + de-interleave measured ~0.7 ms/view
    at the bench stage 4."""
    from .pallas.warp_fwd_v3 import warp_tiles_pallas_v3

    B, Hs, Ws, C = src.shape
    _, D, H, W = cx.shape
    src_k, xg, yg, starts, band_k, align_y, kw = _v3_plan(
        src, cx, cy, band, tile_rows, xband
    )
    interpret = jax.default_backend() not in ("tpu", "axon")
    out = warp_tiles_pallas_v3(
        src_k, xg, yg, starts,
        band=band_k, align_y=align_y, ref=ref.astype(src.dtype),
        groups=groups, interpret=interpret, **kw,
    )  # [B, N, TR, G, W]
    T = H // tile_rows
    out = out.reshape(B, D, T, tile_rows, groups, W)
    if native:
        return out
    out = out.transpose(0, 1, 2, 3, 5, 4)
    return out.reshape(B, D, H, W, groups)


def warp_cor_v3_ik(src, ref, rel_proj, depth_hypo, band, tile_rows, xband,
                   groups, cw=False):
    """``warp_cor_v3`` with coordinates + band/chunk plan computed INSIDE
    the kernel from (rel_proj, depth_hypo)
    (ops/pallas/warp_fwd_v3.warp_cor_tiles_pallas_v3_ik): no per-view
    [B, D, H, W] coordinate planes in HBM and no XLA plan reductions
    (~0.9 ms/view of coords fusions at the bench stage 4, r4 trace).
    Returns the KERNEL-NATIVE layout ``[B, D, T, TR, G, W]`` (the fused
    accumulation path's input). Same eligibility as ``warp_cor_v3``;
    values equal up to f32 rounding of the coordinate arithmetic (the
    bilinear weights are continuous in the coordinates).

    ``cw``: ``src``/``ref`` arrive CHANNELS-IN-SUBLANES ``[B, H, C, Wp]``
    with ZERO lane padding to a 128 multiple — the fused top-down chain's
    native output (models/fpn.py cw_request). The kernel operands then
    come from free reshapes instead of per-view NHWC transposes."""
    from .pallas.warp_fwd_v3 import warp_cor_tiles_pallas_v3_ik

    _, D, H, W = depth_hypo.shape
    if cw:
        B, Hs, C, Ws_pad = src.shape
        assert Ws_pad % 128 == 0, src.shape
        src_k = src
    else:
        B, Hs, Ws, C = src.shape
        src_k, Ws_pad = _v3_pad_width(src)
    align_y = _v3_align_y(C, src.dtype)
    band_k = _v3_band_k(band, align_y)
    chunk = V3_CHUNK
    xwin = _v3_xwin(xband)
    if not (xwin and Ws_pad >= xwin and W % chunk == 0):
        xwin = 0
    rel12 = rel_proj[:, :3, :].reshape(B, 12)
    interpret = jax.default_backend() not in ("tpu", "axon")
    out = warp_cor_tiles_pallas_v3_ik(
        src_k, rel12, depth_hypo, ref.astype(src.dtype),
        band=band_k, band0=band, align_y=align_y, groups=groups,
        tile_rows=tile_rows, xwin=xwin, chunk=chunk, interpret=interpret,
        cw=cw,
    )  # [B, N, TR, G, W]
    T = H // tile_rows
    return out.reshape(B, D, T, tile_rows, groups, W)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _warp_v3(src, coords, band, tile_rows, xband, tile_cols):
    """v3 Pallas forward (flipped layout, ops/pallas/warp_fwd_v3) +
    x-banded Pallas backward — full-Pallas warp."""
    return _warp_batched_pallas_v3_fwd(
        src, coords, band, tile_rows, xband, tile_cols
    )[0]


_warp_v3.defvjp(_warp_batched_pallas_v3_fwd, _warp_batched_pallas_xband_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _warp_hybrid(src, coords, band, tile_rows, xband, tile_cols):
    """Measured-fastest combination on v5e (BENCH_NOTES.md round 2): XLA
    scan FORWARD (the full-width banded matmul XLA schedules better than the
    hand-written kernels) + x-banded Pallas BACKWARD (2.2x the scan backward
    at stage 4, 7.4x at stage 3 — the scan backward's sequential
    dynamic-update-slice accumulation is its bottleneck, which the kernel's
    sequential-grid HBM RMW avoids while also cutting the contraction from
    Ws to xband)."""
    return _warp_hybrid_fwd(src, coords, band, tile_rows, xband, tile_cols)[0]


def _warp_hybrid_fwd(src, coords, band, tile_rows, xband, tile_cols):
    out = jax.vmap(lambda s, c: _warp_one_fwd(s, c, band, tile_rows)[0])(
        src, coords
    )
    return out, _save(src, coords)


_warp_hybrid.defvjp(_warp_hybrid_fwd, _warp_batched_pallas_xband_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _warp_hybrid_ik(src, rel_proj, depth_values, band, tile_rows, xband,
                    tile_cols):
    """``_warp_hybrid`` with the BACKWARD's coordinates and window plan
    computed inside the kernel from ``(rel_proj, depth_values)``
    (ops/pallas/warp_xband_bwd._kernel_v4_ik). The VJP residuals shrink
    from two per-view ``[B, D, H, W]`` f32 coordinate planes to the
    stage's SHARED depth-hypothesis volume (one buffer across all source
    views — XLA CSEs the identical residual), and the backward loses the
    XLA plan-reduction fusions (~25 ms/step at the DTU recipe, r4g
    trace). Coordinates recomputed in-kernel differ from the XLA einsum
    by f32 rounding; the bilinear weights are continuous in them."""
    return _warp_hybrid_ik_fwd(
        src, rel_proj, depth_values, band, tile_rows, xband, tile_cols
    )[0]


def _warp_hybrid_ik_fwd(src, rel_proj, depth_values, band, tile_rows,
                        xband, tile_cols):
    coords = warp_coords(rel_proj, depth_values)
    out = jax.vmap(lambda s, c: _warp_one_fwd(s, c, band, tile_rows)[0])(
        src, coords
    )
    return out, (src, rel_proj, depth_values)


def _warp_hybrid_ik_bwd(band, tile_rows, xband, tile_cols, res, g):
    from .pallas.warp_xband_bwd import warp_tiles_pallas_xband_bwd_ik

    src, rel_proj, depth_values = res
    B, Hs, Ws, C = src.shape
    _, D, H, W = depth_values.shape
    align_y, band_al, xband_al = _xband_align(band, xband, C)
    T = H // tile_rows
    g_blocks = g.reshape(B, D * T, tile_rows, W, C)
    rel12 = rel_proj[:, :3, :].reshape(B, 12)
    interpret = jax.default_backend() not in ("tpu", "axon")
    dsrc = warp_tiles_pallas_xband_bwd_ik(
        g_blocks, rel12, depth_values, (B, Hs, Ws, C),
        band=band_al, band0=band, xband=xband_al, tile_rows=tile_rows,
        tile_cols=tile_cols, align_y=align_y, interpret=interpret,
        factor_dtype=_BWD_KERNEL["factor_dtype"],
    )
    return dsrc.astype(src.dtype), None, None


_warp_hybrid_ik.defvjp(_warp_hybrid_ik_fwd, _warp_hybrid_ik_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _warp_batched_pallas(src, coords, band, tile_rows):
    return _warp_batched_pallas_fwd(src, coords, band, tile_rows)[0]


def _warp_batched_pallas_fwd(src, coords, band, tile_rows):
    """Forward through the Pallas tile kernel (ops/pallas/warp_kernel);
    interpret mode off-TPU so the same code path is testable on CPU.

    Band starts are aligned down to multiples of ``A = 128 // C`` rows (the
    lane tiling of the merged (row, channel) axis the kernel DMAs from) and
    the band widened by A rows — a wider band only adds correctly-weighted
    rows, so the result is unchanged."""
    from .pallas.warp_kernel import warp_tiles_pallas

    B, Hs, Ws, C = src.shape
    _, D, H, W, _ = coords.shape
    align = max(1, 128 // C)
    band_al = -(-band // align) * align + align
    tiles = jax.vmap(lambda c: _split_tiles(c, tile_rows))(coords)  # [B,N,P,2]
    starts = jax.vmap(lambda t: _tile_starts(t[..., 1], band, Hs))(tiles)
    starts = (starts // align) * align
    starts = jnp.clip(starts, 0, max(((Hs - band_al) // align) * align, 0))
    N = tiles.shape[1]
    xg = tiles[..., 0].reshape(B, N, tile_rows, W)
    yg = tiles[..., 1].reshape(B, N, tile_rows, W)
    interpret = jax.default_backend() not in ("tpu", "axon")
    out = warp_tiles_pallas(
        src, xg, yg, starts.astype(jnp.int32), band=band_al,
        align=align, interpret=interpret,
    )  # [B, N, TR, W, C]
    out = out.reshape(B, D, H, W, C)
    return out, _save(src, coords)


def _warp_batched_pallas_bwd(band, tile_rows, res, g):
    src, coords = _load(res)
    dsrc = jax.vmap(
        lambda s, c, gg: _warp_one_bwd(band, tile_rows, _save(s, c), gg)[0]
    )(src, coords, g)
    return dsrc, None


_warp_batched_pallas.defvjp(_warp_batched_pallas_fwd, _warp_batched_pallas_bwd)


def homo_warp_mxu(
    src_fea: jnp.ndarray,     # [B, Hs, Ws, C]
    rel_proj: jnp.ndarray,    # [B, 4, 4]
    depth_values: jnp.ndarray,  # [B, D, H, W]
    *,
    band: int = 16,
    tile_rows: int = 8,
    xband: int = 0,
    tile_cols: int = 128,
    use_pallas: bool = False,
    hybrid: bool = False,
    v3: bool = False,
    v3_min_w: int = 256,
) -> jnp.ndarray:
    """Gather-free bilinear homography warp: ``[B,Hs,Ws,C] -> [B,D,H,W,C]``.

    Drop-in replacement for the gather formulation in ``core.geometry``
    (same zeros-padding / align_corners semantics) built entirely from
    matmuls and contiguous slices. ``band`` bounds the per-tile source-row
    span and ``xband`` the per-column-chunk source-column span (see module
    docstring; validate with :func:`band_coverage`). ``xband=0`` disables
    column chunking (full-width contraction). ``use_pallas`` runs the
    forward through a Pallas tile kernel (weights built in VMEM — no
    per-tile HBM weight traffic); ``hybrid`` keeps the XLA scan forward but
    routes the backward through the x-banded Pallas kernel — the fastest
    measured fwd+bwd combination on v5e (BENCH_NOTES.md round 2). Stages
    whose width/height don't fit the kernels fall back to the scan path.
    """
    coords = warp_coords(rel_proj, depth_values)  # [B, D, H, W, 2], stop-grad
    Hs, Ws_, C = src_fea.shape[1], src_fea.shape[2], src_fea.shape[-1]
    W_ = depth_values.shape[-1]

    # per-stage effective chunking for the Pallas BACKWARD plan: keep the
    # configured x margin (xband - tile_cols) when the stage width forces
    # smaller chunks (shared by the v3 and hybrid branches)
    tc = next((t for t in (tile_cols, 128, 64, 32, 16) if W_ % t == 0), 0)
    xb = max(xband - tile_cols + tc, tc + 16) if tc and xband else 0
    align, band_al, xb_al = _xband_align(band, xb, C)
    if not xb:
        xb_al = 0
    bwd_ok = tc and xb_al <= Ws_ and band_al <= Hs and Hs % align == 0

    if v3 and xband:
        # v3 fwd eligibility (shared helper); bwd = x-banded Pallas
        if v3_fwd_eligible(src_fea.shape, W_, band, src_fea.dtype,
                           v3_min_w) and bwd_ok:
            return _warp_v3(src_fea, coords, band, tile_rows, xb, tc)
        # ineligible: fall through to the hybrid/scan paths
        v3 = False
        hybrid = True
    if hybrid and xband and bwd_ok:
        if (
            _BWD_KERNEL["ik"]
            and _resolve_bwd_mode(src_fea.shape, band_al, xb_al,
                                  tile_rows, tc) == "v4"
        ):
            # in-kernel-coords backward: residuals are (src, rel, hypo)
            # instead of two [B, D, H, W] coordinate planes
            return _warp_hybrid_ik(
                src_fea, rel_proj, depth_values, band, tile_rows, xb, tc
            )
        return _warp_hybrid(src_fea, coords, band, tile_rows, xb, tc)
        # (stages too narrow for the kernel use the scan fwd+bwd below)
    if use_pallas:
        xband_al = -(-(xband + 8) // 8) * 8 if xband else 0
        if (
            xband
            and band_al <= Hs and Hs % align == 0
            and W_ % tile_cols == 0
            and xband_al <= Ws_
        ):
            return _warp_batched_pallas_xband(
                src_fea, coords, band, tile_rows, xband, tile_cols
            )
        if band_al <= Hs and Hs % align == 0:
            return _warp_batched_pallas(src_fea, coords, band, tile_rows)
        # shapes too small for the aligned-band kernel: scan fallback
    W, Ws = depth_values.shape[-1], src_fea.shape[2]
    if xband and xband < Ws and W % tile_cols == 0:
        return jax.vmap(
            lambda s, c: _warp_one_banded(s, c, band, tile_rows, xband, tile_cols)
        )(src_fea, coords)
    return jax.vmap(lambda s, c: _warp_one(s, c, band, tile_rows))(
        src_fea, coords
    )


def band_coverage(
    rel_proj: jnp.ndarray,
    depth_values: jnp.ndarray,
    src_h: int,
    *,
    band: int = 16,
    tile_rows: int = 8,
    src_w: int = 0,
    xband: int = 0,
    tile_cols: int = 128,
) -> jnp.ndarray:
    """Fraction of pixels whose bilinear taps fall outside the banded source
    window (should be 0 for correctly-sized bands). Checks the K-row y band;
    when ``xband``/``src_w`` are given also checks the per-chunk column band.
    Ignores taps that are fully out of the source image (zeros padding)."""
    coords = warp_coords(rel_proj, depth_values)

    def axis_violation(vals, starts, width, limit):
        tap0 = jnp.floor(vals).astype(jnp.int32)
        tap1 = tap0 + 1
        in_band = lambda t: (t >= starts) & (t <= starts + width - 1)
        covered0 = (tap0 < 0) | in_band(tap0)
        covered1 = (tap1 >= limit) | in_band(tap1)
        relevant = (vals > -1.0) & (vals < limit)
        return relevant & ~(covered0 & covered1)

    def one(c):
        tiles = _split_tiles(c, tile_rows)[..., 1]  # [N, P] y coords
        starts = _tile_starts(tiles, band, src_h)[:, None]  # [N, 1] int32
        viol = axis_violation(tiles, starts, band, src_h).mean()
        if xband and src_w and c.shape[2] % tile_cols == 0:
            blocks = _split_blocks(c, tile_rows, tile_cols)
            xs = _chunk_starts(blocks[..., 0], xband, src_w)[..., None]
            viol = jnp.maximum(
                viol, axis_violation(blocks[..., 0], xs, xband, src_w).mean()
            )
        return viol

    return jax.vmap(one)(coords).max()
