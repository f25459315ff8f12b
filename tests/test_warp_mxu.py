"""MXU (gather-free) warp vs the gather reference path: values + gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep_reconstruction_with_epipolar_lines_mvster_tpu.core.geometry import (
    grid_sample_2d,
    relative_projection,
    warp_coords,
)
from deep_reconstruction_with_epipolar_lines_mvster_tpu.ops.warp_mxu import (
    band_coverage,
    homo_warp_mxu,
)


def _setup(B=2, D=4, H=32, W=64, seed=0, baseline=6.0, tilt=0.02):
    """Cameras with a mostly-horizontal baseline and slight rotation (tilted
    epipolar lines) — the realistic MVS case the band must cover."""
    rng = np.random.default_rng(seed)
    f = 0.9 * W
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], dtype=np.float32)
    E_ref = np.eye(4, dtype=np.float32)
    c, s = np.cos(tilt), np.sin(tilt)
    E_src = np.eye(4, dtype=np.float32)
    E_src[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=np.float32)
    E_src[0, 3] = baseline
    E_src[1, 3] = 0.3 * baseline

    def stack(E):
        st = np.zeros((2, 4, 4), dtype=np.float32)
        st[0] = E
        st[1, :3, :3] = K
        return np.broadcast_to(st, (B, 2, 4, 4)).copy()

    rel = relative_projection(jnp.asarray(stack(E_src)), jnp.asarray(stack(E_ref)))
    # spatially-smooth per-pixel hypotheses (like the real schedulers):
    # per-plane base depths plus a gentle spatial ramp
    planes = np.linspace(40.0, 90.0, D, dtype=np.float32)
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    ramp = (0.02 * xx + 0.01 * yy).astype(np.float32)
    depth = jnp.asarray(
        np.broadcast_to(
            planes[None, :, None, None] * (1.0 + ramp)[None, None], (B, D, H, W)
        ).copy()
    )
    src = jnp.asarray(rng.standard_normal((B, H, W, 8)).astype(np.float32))
    return src, rel, depth


@pytest.mark.parametrize("tile_rows,band", [(8, 16), (4, 16), (8, 32)])
def test_matches_gather_path(tile_rows, band):
    src, rel, depth = _setup()
    cov = float(band_coverage(rel, depth, src.shape[1], band=band,
                              tile_rows=tile_rows))
    assert cov == 0.0, f"band too small for this geometry: {cov}"

    ref = grid_sample_2d(src, warp_coords(rel, depth))
    got = homo_warp_mxu(src, rel, depth, band=band, tile_rows=tile_rows)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("tile_cols,xband", [(32, 48), (16, 32)])
def test_banded_matches_gather_path(tile_cols, xband):
    """x-banded (column-chunked) warp vs the gather reference."""
    src, rel, depth = _setup()
    cov = float(band_coverage(
        rel, depth, src.shape[1], band=16, tile_rows=8,
        src_w=src.shape[2], xband=xband, tile_cols=tile_cols,
    ))
    assert cov == 0.0, f"x band too small for this geometry: {cov}"
    ref = grid_sample_2d(src, warp_coords(rel, depth))
    got = homo_warp_mxu(
        src, rel, depth, band=16, tile_rows=8, xband=xband, tile_cols=tile_cols
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_banded_gradients_match_gather_path():
    src, rel, depth = _setup(B=1, H=16, W=64)

    def loss_gather(s):
        w = grid_sample_2d(s, warp_coords(rel, depth))
        return (w * w + 0.3 * w).sum()

    def loss_banded(s):
        w = homo_warp_mxu(
            s, rel, depth, band=16, tile_rows=4, xband=48, tile_cols=32
        )
        return (w * w + 0.3 * w).sum()

    g_ref = jax.grad(loss_gather)(src)
    g_got = jax.grad(loss_banded)(src)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), atol=1e-3,
                               rtol=1e-4)


def test_banded_zeros_padding_out_of_range():
    """x-banded path must reproduce grid_sample's zeros padding when samples
    leave the source image (and overlapping chunk windows in the backward
    must accumulate, not overwrite)."""
    src, rel, depth = _setup(B=1, H=32, W=64, baseline=40.0)
    ref = np.asarray(grid_sample_2d(src, warp_coords(rel, depth)))
    got = np.asarray(homo_warp_mxu(
        src, rel, depth, band=32, tile_rows=8, xband=48, tile_cols=32
    ))
    np.testing.assert_allclose(got, ref, atol=2e-5)
    assert (np.abs(ref) < 1e-6).mean() > 0.1  # the scene does go OOB


def test_pallas_kernel_matches_scan_path():
    """Pallas tile kernel (interpret mode on CPU) vs the XLA scan forward,
    values + gradients."""
    src, rel, depth = _setup(B=2, H=32, W=64)
    ref = homo_warp_mxu(src, rel, depth, band=16, tile_rows=8)
    got = homo_warp_mxu(src, rel, depth, band=16, tile_rows=8, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    g_ref = jax.grad(
        lambda s: (homo_warp_mxu(s, rel, depth, band=16, tile_rows=8) ** 2).sum()
    )(src)
    g_got = jax.grad(
        lambda s: (
            homo_warp_mxu(s, rel, depth, band=16, tile_rows=8, use_pallas=True) ** 2
        ).sum()
    )(src)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), atol=1e-3,
                               rtol=1e-4)


def test_gradients_match_gather_path():
    src, rel, depth = _setup(B=1, H=16, W=64)

    def loss_gather(s):
        w = grid_sample_2d(s, warp_coords(rel, depth))
        return (w * w + 0.3 * w).sum()

    def loss_mxu(s):
        w = homo_warp_mxu(s, rel, depth, band=16, tile_rows=4)
        return (w * w + 0.3 * w).sum()

    g_ref = jax.grad(loss_gather)(src)
    g_got = jax.grad(loss_mxu)(src)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), atol=1e-3,
                               rtol=1e-4)


def test_zeros_padding_out_of_range():
    """Large baseline pushes many samples out of the source image: both paths
    must agree on the zero-padded region."""
    src, rel, depth = _setup(B=1, H=32, W=64, baseline=40.0)
    cov = float(band_coverage(rel, depth, 32, band=32, tile_rows=8))
    assert cov == 0.0
    ref = np.asarray(grid_sample_2d(src, warp_coords(rel, depth)))
    got = np.asarray(homo_warp_mxu(src, rel, depth, band=32, tile_rows=8))
    np.testing.assert_allclose(got, ref, atol=2e-5)
    assert (np.abs(ref) < 1e-6).mean() > 0.1  # the scene does go OOB


@pytest.mark.slow  # 62 s; per-kernel parity tests stay fast (r5 re-tier)
def test_model_outputs_match_across_warp_impls():
    """Full MVS4Net forward with warp_impl='mxu' vs 'gather': identical
    params => near-identical depth maps."""
    import dataclasses

    from deep_reconstruction_with_epipolar_lines_mvster_tpu.config import ModelConfig
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.models import MVS4Net
    from test_model import make_inputs

    cfg_g = ModelConfig(
        group_cor=True, group_cor_dim=(8, 8, 4, 4), inverse_depth=True,
        warp_impl="gather",
    )
    cfg_m = dataclasses.replace(cfg_g, warp_impl="mxu")
    imgs, projs, dv = make_inputs(V=3, H=64, W=64)
    model_g, model_m = MVS4Net(cfg_g), MVS4Net(cfg_m)
    variables = model_g.init(jax.random.PRNGKey(0), imgs, projs, dv, train=False)
    out_g = model_g.apply(variables, imgs, projs, dv, train=False)
    out_m = model_m.apply(variables, imgs, projs, dv, train=False)
    for s in (1, 2, 3, 4):
        a = np.asarray(out_g[f"stage{s}"]["depth"])
        b = np.asarray(out_m[f"stage{s}"]["depth"])
        # tiny numeric differences can flip argmax ties on isolated pixels
        agree = np.isclose(a, b, rtol=1e-4, atol=1e-2).mean()
        assert agree > 0.99, f"stage{s}: only {agree} agreement"


def test_band_coverage_flags_small_band():
    """A steep rotation makes epipolar rows span more than a tiny band."""
    src, rel, depth = _setup(B=1, H=64, W=64, tilt=0.5)
    cov_small = float(band_coverage(rel, depth, 64, band=4, tile_rows=16))
    assert cov_small > 0.0


def test_pallas_xband_kernel_matches_gather_path():
    """x-banded Pallas kernel (interpret mode on CPU) vs the gather
    reference: values (incl. zeros-padding OOB region) + gradients, plus a
    wide-channel case (C=64 -> align_y=2 window alignment)."""
    src, rel, depth = _setup(B=2, H=32, W=64)
    ref = grid_sample_2d(src, warp_coords(rel, depth))
    got = homo_warp_mxu(
        src, rel, depth, band=16, tile_rows=8, xband=48, tile_cols=32,
        use_pallas=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    g_ref = jax.grad(
        lambda s: (grid_sample_2d(s, warp_coords(rel, depth)) ** 2).sum()
    )(src)
    g_got = jax.grad(
        lambda s: (
            homo_warp_mxu(
                s, rel, depth, band=16, tile_rows=8, xband=48, tile_cols=32,
                use_pallas=True,
            ) ** 2
        ).sum()
    )(src)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), atol=1e-3,
                               rtol=1e-4)

    # OOB zeros padding
    src2, rel2, depth2 = _setup(B=1, H=32, W=64, baseline=40.0)
    ref2 = np.asarray(grid_sample_2d(src2, warp_coords(rel2, depth2)))
    got2 = np.asarray(homo_warp_mxu(
        src2, rel2, depth2, band=32, tile_rows=8, xband=48, tile_cols=32,
        use_pallas=True,
    ))
    assert (np.abs(ref2) < 1e-6).mean() > 0.1
    np.testing.assert_allclose(got2, ref2, atol=2e-5)

    # C=64: align_y=2, non-multiple-of-8 aligned band (18 rows)
    rng = np.random.default_rng(3)
    src3 = jnp.asarray(rng.standard_normal((2, 32, 64, 64)).astype(np.float32))
    ref3 = grid_sample_2d(src3, warp_coords(rel, depth))
    got3 = homo_warp_mxu(
        src3, rel, depth, band=16, tile_rows=8, xband=48, tile_cols=32,
        use_pallas=True,
    )
    np.testing.assert_allclose(np.asarray(got3), np.asarray(ref3), atol=2e-5)


def test_hybrid_warp_matches_gather_path():
    """mxu_hybrid = XLA scan forward + x-banded Pallas backward (the
    measured-fastest combination on v5e, BENCH_NOTES.md round 2): values and
    gradients vs the gather reference, incl. the adaptive tile_cols fallback
    for widths not divisible by the configured chunk."""
    src, rel, depth = _setup(B=2, H=32, W=64)
    ref = grid_sample_2d(src, warp_coords(rel, depth))
    got = homo_warp_mxu(
        src, rel, depth, band=16, tile_rows=8, xband=96, tile_cols=32,
        hybrid=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    g_ref = jax.grad(
        lambda s: ((grid_sample_2d(s, warp_coords(rel, depth)) ** 2)
                   + 0.3 * grid_sample_2d(s, warp_coords(rel, depth))).sum()
    )(src)
    g_got = jax.grad(
        lambda s: ((homo_warp_mxu(
            s, rel, depth, band=16, tile_rows=8, xband=96, tile_cols=32,
            hybrid=True,
        ) ** 2) + 0.3 * homo_warp_mxu(
            s, rel, depth, band=16, tile_rows=8, xband=96, tile_cols=32,
            hybrid=True,
        )).sum()
    )(src)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), atol=1e-3,
                               rtol=1e-4)

    # adaptive tile_cols: W=64 with configured tile_cols=128 drops to 64
    got2 = homo_warp_mxu(
        src, rel, depth, band=16, tile_rows=8, xband=192, tile_cols=128,
        hybrid=True,
    )
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref), atol=2e-5)
    g2 = jax.grad(
        lambda s: (homo_warp_mxu(
            s, rel, depth, band=16, tile_rows=8, xband=192, tile_cols=128,
            hybrid=True,
        ) ** 2).sum()
    )(src)
    g2_ref = jax.grad(
        lambda s: (grid_sample_2d(s, warp_coords(rel, depth)) ** 2).sum()
    )(src)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g2_ref), atol=1e-3,
                               rtol=1e-4)


def test_v3_warp_matches_gather_path():
    """mxu_v3 = flipped-layout Pallas forward (ops/pallas/warp_fwd_v3,
    interpret mode on CPU) + x-banded Pallas backward: values and gradients
    vs the gather reference at a width above the kernel's W>=256
    eligibility floor."""
    src, rel, depth = _setup(B=1, D=2, H=16, W=256)
    ref = grid_sample_2d(src, warp_coords(rel, depth))
    got = homo_warp_mxu(
        src, rel, depth, band=16, tile_rows=8, xband=96, tile_cols=64,
        v3=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    g_ref = jax.grad(
        lambda s: (grid_sample_2d(s, warp_coords(rel, depth)) ** 2).sum()
    )(src)
    g_v3 = jax.grad(
        lambda s: (homo_warp_mxu(
            s, rel, depth, band=16, tile_rows=8, xband=96, tile_cols=64,
            v3=True,
        ) ** 2).sum()
    )(src)
    np.testing.assert_allclose(np.asarray(g_v3), np.asarray(g_ref), atol=1e-3,
                               rtol=1e-4)

    # column-chunked kernel variant (xwin = roundup(xband+130, 128) = 256
    # fits the 256-wide source, so the 128-aligned-window path engages)
    got_c = homo_warp_mxu(
        src, rel, depth, band=16, tile_rows=8, xband=100, tile_cols=64,
        v3=True,
    )
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(ref), atol=2e-5)

    # ineligible width (W=64 < 256) falls back to the hybrid/scan path
    src2, rel2, depth2 = _setup(B=1, D=2, H=16, W=64)
    ref2 = grid_sample_2d(src2, warp_coords(rel2, depth2))
    got2 = homo_warp_mxu(
        src2, rel2, depth2, band=16, tile_rows=8, xband=96, tile_cols=32,
        v3=True,
    )
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2), atol=2e-5)


def test_v3_warp_non_128_multiple_width():
    """Ws=320 (>= the 256 eligibility floor but NOT a 128 multiple): the v3
    launcher zero-pads the pre-transposed source to Ws_pad=384 for the manual
    HBM band DMA (Mosaic requires 128-multiple lane extents) — padded taps
    must carry ZERO weight, not an edge clamp. Covers coords landing in the
    last fractional column (x in [Ws-2, Ws-1)) and fully out of range past
    the right edge."""
    src, rel, depth = _setup(B=1, D=2, H=16, W=320)
    ref = grid_sample_2d(src, warp_coords(rel, depth))
    got = homo_warp_mxu(
        src, rel, depth, band=16, tile_rows=8, xband=96, tile_cols=64,
        v3=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    # push sample x across and past the right edge: a large baseline shifts
    # the epipolar lines right, so per-pixel coords sweep through the final
    # fractional column and beyond (zeros, like grid_sample's zero padding)
    src2, rel2, depth2 = _setup(B=1, D=2, H=16, W=320, baseline=40.0)
    cx = np.asarray(warp_coords(rel2, depth2))[..., 0]
    assert ((cx >= 318.0) & (cx < 319.0)).any(), "no coords in last column"
    assert (cx >= 319.0).any(), "no out-of-range coords"
    ref2 = grid_sample_2d(src2, warp_coords(rel2, depth2))
    got2 = homo_warp_mxu(
        src2, rel2, depth2, band=16, tile_rows=8, xband=96, tile_cols=64,
        v3=True,
    )
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2), atol=2e-5)


def test_v3_warp_bf16_widened_band():
    """bf16 src with C=8: align_y=2, so the kernel runs with the widened
    18-row band (144 sublanes) and floored starts — the geometry real TPU
    eval uses; compare against the f32 gather reference."""
    src, rel, depth = _setup(B=1, D=2, H=16, W=256)
    ref = grid_sample_2d(src, warp_coords(rel, depth))
    got = homo_warp_mxu(
        src.astype(jnp.bfloat16), rel, depth, band=16, tile_rows=8,
        xband=96, tile_cols=64, v3=True,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref), atol=0.05, rtol=0.02
    )

    # bf16 BACKWARD: the xband bwd kernel runs its matmuls at the
    # cotangent's precision (bf16 factors, f32 accumulation) — compare
    # against the f32 gather gradient with bf16-scale tolerances
    g_ref = jax.grad(
        lambda s: (grid_sample_2d(s, warp_coords(rel, depth)) ** 2).sum()
    )(src)
    g_bf = jax.grad(
        lambda s: (homo_warp_mxu(
            s, rel, depth, band=16, tile_rows=8, xband=96, tile_cols=64,
            v3=True,
        ).astype(jnp.float32) ** 2).sum()
    )(src.astype(jnp.bfloat16))
    np.testing.assert_allclose(
        np.asarray(g_bf, np.float32), np.asarray(g_ref), atol=0.2, rtol=0.05
    )


def test_fused_warp_cor_matches_two_step():
    """Eval-only fused warp+group-correlation kernel (warp_cor_v3, interpret
    mode) vs the gather warp + _group_correlate two-step reference, through
    epipolar_aggregate — and the full aggregate output."""
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.core.geometry import (
        relative_projection,
    )
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.ops.warp_cor import (
        epipolar_aggregate,
    )

    B, D, H, W, C, G, V = 1, 2, 16, 256, 8, 4, 3
    rng = np.random.default_rng(11)
    src0, rel, depth = _setup(B=B, D=D, H=H, W=W)
    feats = [
        jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
        for _ in range(V)
    ]
    # proj stacks shared by _setup's geometry: rebuild the [B, V, 2, 4, 4]
    # stack with the ref view first and the _setup source twice
    f = 0.9 * W
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    E_ref = np.eye(4, dtype=np.float32)
    stacks = [np.zeros((2, 4, 4), np.float32) for _ in range(V)]
    for i, st in enumerate(stacks):
        E = np.eye(4, dtype=np.float32)
        E[0, 3] = 3.0 * i
        E[1, 3] = 0.9 * i
        st[0] = E
        st[1, :3, :3] = K
    projs = jnp.asarray(np.broadcast_to(np.stack(stacks), (B, V, 2, 4, 4)))

    kw = dict(
        group_cor=True, group_dim=G, attn_temp=2.0, attn_fuse_d=True,
        band=16, tile_rows=8, xband=96, tile_cols=64,
    )
    ref_out = epipolar_aggregate(feats, projs, depth, impl="gather", **kw)
    # default fused path computes coordinates IN-KERNEL (warp_cor_v3_ik):
    # explicit m0*u+m1*v+m2 vs XLA's einsum differ by f32 rounding of
    # O(1e3) coordinates (~2e-4 weight shift) — far below the flagship's
    # bf16 quantization; the bilinear weights are continuous in coords
    got = epipolar_aggregate(
        feats, projs, depth, impl="mxu_v3", fuse_cor=True, **kw
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref_out), atol=1e-3, rtol=1e-4
    )
    # the precomputed-coords kernel path stays at the tight tolerance
    got_pc = epipolar_aggregate(
        feats, projs, depth, impl="mxu_v3", fuse_cor=True,
        kernel_coords=False, **kw
    )
    np.testing.assert_allclose(
        np.asarray(got_pc), np.asarray(ref_out), atol=3e-5, rtol=1e-4
    )
    # XLA attention chain (fuse_attn off) vs the one-pass attention kernel
    # (on, the default above): same chain, f32-close
    got_noat = epipolar_aggregate(
        feats, projs, depth, impl="mxu_v3", fuse_cor=True, fuse_attn=False,
        **kw
    )
    np.testing.assert_allclose(
        np.asarray(got_noat), np.asarray(got), atol=1e-4, rtol=1e-4
    )
    # and the plain (unfused) v3 path agrees too, as a cross-check
    got2 = epipolar_aggregate(feats, projs, depth, impl="mxu_v3", **kw)
    np.testing.assert_allclose(
        np.asarray(got2), np.asarray(ref_out), atol=3e-5, rtol=1e-4
    )
    # pack_out: the width-packed output must be exactly pack_w(unpacked)
    # on BOTH the fused (kernel-native single transpose) and plain paths
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.ops.packed_conv import (
        pack_w,
    )

    for impl, fc in (("mxu_v3", True), ("gather", False)):
        unpacked = epipolar_aggregate(
            feats, projs, depth, impl=impl, fuse_cor=fc, **kw
        )
        packed = epipolar_aggregate(
            feats, projs, depth, impl=impl, fuse_cor=fc, pack_out=16, **kw
        )
        np.testing.assert_array_equal(
            np.asarray(packed), np.asarray(pack_w(unpacked, 16))
        )


def test_xband_bwd_kernel_v2_matches_v1():
    """The (measured-negative, kept-for-the-record) single-RMW bwd kernel
    variant must stay numerically identical to the default v1 — exercised
    here so the v2 body cannot silently rot."""
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.ops.pallas.warp_xband_bwd import (
        warp_tiles_pallas_xband_bwd,
    )
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.ops.warp_mxu import (
        _split_tiles,
        _tile_starts,
        _chunk_starts,
        _split_blocks,
    )

    rng = np.random.default_rng(21)
    src, rel, depth = _setup(B=1, D=2, H=16, W=64)
    B, Hs, Ws, C = 1, 16, 64, 8
    TR, band, xband, TC = 8, 16, 40, 32
    coords = warp_coords(rel, depth)
    tiles = jax.vmap(lambda c: _split_tiles(c, TR))(coords)
    ystarts = jax.vmap(lambda t: _tile_starts(t[..., 1], band, Hs))(tiles)
    N = tiles.shape[1]
    W = 64
    xg = tiles[..., 0].reshape(B, N, TR, W)
    yg = tiles[..., 1].reshape(B, N, TR, W)
    blocks = jax.vmap(lambda c: _split_blocks(c, TR, TC))(coords)
    xs = jax.vmap(lambda b: _chunk_starts(b[..., 0], xband, Ws))(blocks)
    g = jnp.asarray(
        rng.standard_normal((B, N, TR, W, C)).astype(np.float32)
    )
    outs = {}
    for mode in ("v1", "v2", "v3", "v4"):
        outs[mode] = warp_tiles_pallas_xband_bwd(
            g, xg, yg, ystarts.astype(jnp.int32), xs.astype(jnp.int32),
            (B, Hs, Ws, C), band=band, xband=xband, tile_cols=TC,
            interpret=True, mode=mode,
        )
    np.testing.assert_allclose(
        np.asarray(outs["v2"]), np.asarray(outs["v1"]), atol=1e-5, rtol=1e-5
    )
    # v3 (merged-row big-K matmul) and v4 (v3 + full-VMEM accumulator) are
    # the same contraction in a different association order — f32 factors
    # must agree to accumulation noise
    for m in ("v3", "v4"):
        np.testing.assert_allclose(
            np.asarray(outs[m]), np.asarray(outs["v1"]), atol=1e-4,
            rtol=1e-4, err_msg=m,
        )
    # bf16 factors: ~2^-9 relative error per weight factor
    out_bf = warp_tiles_pallas_xband_bwd(
        g, xg, yg, ystarts.astype(jnp.int32), xs.astype(jnp.int32),
        (B, Hs, Ws, C), band=band, xband=xband, tile_cols=TC,
        interpret=True, mode="v3", factor_dtype=jnp.bfloat16,
    )
    ref = np.asarray(outs["v1"])
    np.testing.assert_allclose(
        np.asarray(out_bf), ref, atol=3e-2 * max(1.0, np.abs(ref).max()),
        rtol=3e-2,
    )


def test_warp_cor_v3_ik_matches_coords_path():
    """Fused warp+group-cor with IN-KERNEL coordinates + band/chunk plan
    (warp_cor_v3_ik) vs the precomputed-coords kernel (warp_cor_v3), both
    in interpret mode: chunked (W=256, xband 144), full-width fallback
    (W=128), and the non-128-multiple width (W=320, xwin > Ws disables
    chunking)."""
    import __graft_entry__ as ge
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.core.geometry import (
        relative_projection,
        warp_coords_xy,
    )
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.ops.warp_mxu import (
        warp_cor_v3,
        warp_cor_v3_ik,
    )

    rng = np.random.default_rng(0)
    for (H, W, D, C, G, xb) in [
        (64, 256, 4, 8, 4, 144),
        (64, 128, 4, 8, 4, 0),
        (32, 320, 4, 16, 4, 144),
    ]:
        B = 2
        batch = ge._example_batch(B=B, V=2, H=H, W=W)
        src = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
        ref = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
        pr = batch["proj_matrices"]["stage4"]
        rel = relative_projection(pr[:, 1], pr[:, 0])
        hypo = jnp.asarray(
            np.linspace(425.0, 935.0, D)[None, :, None, None]
            * np.ones((B, D, H, W)),
            jnp.float32,
        )
        cx, cy = warp_coords_xy(rel, hypo)
        a = warp_cor_v3(src, ref, cx, cy, 12, 8, xb, G, native=True)
        b = warp_cor_v3_ik(src, ref, rel, hypo, 12, 8, xb, G)
        # tolerance: f32 rounding of the in-kernel coordinate arithmetic
        # (explicit muls vs XLA einsum) shifts bilinear weights ~1e-4
        np.testing.assert_allclose(
            np.asarray(b, np.float32), np.asarray(a, np.float32),
            atol=1e-3, err_msg=f"H{H} W{W} xb{xb}",
        )


def test_hybrid_ik_bwd_matches_hybrid():
    """In-kernel-coords v4 backward (_warp_hybrid_ik, interpret): forward
    identical to the hybrid path (same XLA scan fwd) and gradient equal to
    the precomputed-coords hybrid backward up to f32 rounding of the
    in-kernel coordinate arithmetic. Covers the chunked geometry (W=64,
    tile_cols 32) and adaptive tile_cols (W=64, configured 128)."""
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.ops import (
        warp_mxu,
    )

    src, rel, depth = _setup(B=2, H=32, W=64)
    for xband, tc in ((96, 32), (192, 128)):
        def loss(s, ik):
            warp_mxu.set_bwd_kernel("v4", ik=ik)
            try:
                out = homo_warp_mxu(
                    s, rel, depth, band=16, tile_rows=8, xband=xband,
                    tile_cols=tc, hybrid=True,
                )
                return (out ** 2 + 0.3 * out).sum()
            finally:
                warp_mxu.set_bwd_kernel("auto", ik=True)  # module default

        f_ref = float(loss(src, False))
        f_ik = float(loss(src, True))
        assert f_ref == f_ik  # same forward
        g_ref = jax.grad(lambda s: loss(s, False))(src)
        g_ik = jax.grad(lambda s: loss(s, True))(src)
        np.testing.assert_allclose(
            np.asarray(g_ik), np.asarray(g_ref), atol=2e-3, rtol=1e-4,
            err_msg=f"xband={xband} tc={tc}",
        )


def test_per_stage_warp_band_tuple():
    """ModelConfig.warp_band accepts a per-stage tuple; a tuple repeating
    the int value is output-identical to the int, and the CLI parses the
    comma form."""
    import __graft_entry__ as ge
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.cli.train import (
        build_parser,
        make_model_config,
    )
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.config import (
        ModelConfig,
    )
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.models import (
        MVS4Net,
    )

    kw = dict(
        ndepths=(4, 4, 4, 4), depth_inter_r=(0.5, 0.5, 0.5, 1.0),
        group_cor=True, group_cor_dim=(4, 4, 4, 4), inverse_depth=True,
        mono=False, dtype="float32", warp_impl="mxu_hybrid", warp_band=16,
    )
    batch = ge._example_batch(B=1, V=2, H=64, W=64)
    m_int = MVS4Net(ModelConfig(**kw))
    v = ge._init_on_cpu(m_int, batch)
    out_i = m_int.apply(v, batch["imgs"], batch["proj_matrices"],
                        batch["depth_values"], train=False)
    m_tup = MVS4Net(ModelConfig(**dict(kw, warp_band=(16, 16, 16, 16))))
    out_t = m_tup.apply(v, batch["imgs"], batch["proj_matrices"],
                        batch["depth_values"], train=False)
    np.testing.assert_array_equal(
        np.asarray(out_i["stage4"]["depth"]),
        np.asarray(out_t["stage4"]["depth"]),
    )

    args = build_parser().parse_args(
        ["--logdir", "/tmp/x", "--trainpath", "/tmp/x", "--trainlist",
         "/tmp/x", "--testlist", "/tmp/x", "--warp_band", "16,12,12,10"]
    )
    assert make_model_config(args).warp_band == (16, 12, 12, 10)
    args2 = build_parser().parse_args(
        ["--logdir", "/tmp/x", "--trainpath", "/tmp/x", "--trainlist",
         "/tmp/x", "--testlist", "/tmp/x", "--warp_band", "12"]
    )
    assert make_model_config(args2).warp_band == 12


def test_cw_stage_features_eval_matches_nhwc():
    """CW stage-feature handoff (fused top-down chain native output -> fused
    warp+cor kernel, models/fpn.py cw_request + ops/warp_cor.features_cw):
    bit-identical to the NHWC path — the transposes it removes are exact,
    the kernels see the same operand values, and the zero lane padding
    matches _v3_pad_width's semantics. 256x320 makes stage 4 CW-eligible
    (W=320 >= the 256 floor) while stage 3 (W=160) stays NHWC, covering
    the mixed case."""
    import dataclasses

    import __graft_entry__ as ge
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.config import (
        ModelConfig,
    )
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.models import (
        MVS4Net,
    )

    kw = dict(
        group_cor=True, group_cor_dim=(8, 8, 4, 4), inverse_depth=True,
        mono=False, dtype="float32", warp_impl="mxu_v3", warp_band=16,
        warp_xband=192, fused_topdown=True, fuse_warp_cor=True,
        kernel_coords=True,
    )
    batch = ge._example_batch(B=1, V=3, H=256, W=320)
    m_cw = MVS4Net(ModelConfig(cw_stage_features=True, **kw))
    v = ge._init_on_cpu(m_cw, batch)
    out_cw = m_cw.apply(v, batch["imgs"], batch["proj_matrices"],
                        batch["depth_values"], train=False)
    m_nh = MVS4Net(ModelConfig(cw_stage_features=False, **kw))
    out_nh = m_nh.apply(v, batch["imgs"], batch["proj_matrices"],
                        batch["depth_values"], train=False)
    for s in (1, 2, 3, 4):
        np.testing.assert_array_equal(
            np.asarray(out_cw[f"stage{s}"]["depth"]),
            np.asarray(out_nh[f"stage{s}"]["depth"]),
            err_msg=f"stage{s}",
        )
