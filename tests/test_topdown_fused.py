"""Fused FPN top-down level kernel (ops/pallas/topdown_fused.py) vs the
unfused XLA chain (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_reconstruction_with_epipolar_lines_mvster_tpu.core.geometry import (
    resize_align_corners,
)
from deep_reconstruction_with_epipolar_lines_mvster_tpu.ops.pallas.topdown_fused import (
    topdown_fused_level,
)


@pytest.mark.parametrize("mode", ["v2", "v4", "v5"])
@pytest.mark.parametrize(
    "N,Hh,Wh,Cs,Co,seed",
    [(2, 16, 32, 8, 8, 0), (1, 32, 40, 16, 16, 1), (1, 8, 64, 32, 8, 2)],
)
def test_fused_level_matches_xla_chain(N, Hh, Wh, Cs, Co, seed, mode):
    rng = np.random.default_rng(seed)
    Ci = 64
    H, W = 2 * Hh, 2 * Wh
    intra = jnp.asarray(rng.standard_normal((N, Hh, Wh, Ci)), jnp.float32)
    skip = jnp.asarray(rng.standard_normal((N, H, W, Cs)), jnp.float32)
    wi = jnp.asarray(rng.standard_normal((1, 1, Cs, Ci)) * 0.1, jnp.float32)
    bi = jnp.asarray(rng.standard_normal((Ci,)) * 0.1, jnp.float32)
    wo = jnp.asarray(rng.standard_normal((3, 3, Ci, Co)) * 0.05, jnp.float32)

    up = resize_align_corners(intra, (H, W))
    i3 = jax.lax.conv_general_dilated(
        skip, wi, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + bi
    ref = jax.lax.conv_general_dilated(
        up + i3, wo, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = topdown_fused_level(intra, skip, wi, bi, wo, interpret=True,
                              mode=mode)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize("mode", ["v4", "v5"])
def test_fused_level_with_u_matches_xla_chain(mode):
    """with_u: the kernel's second output (pre-conv sum = the next level's
    input) must equal the unfused chain's intermediate; gradients through
    BOTH outputs must match the XLA chain (mid-level L2/L3 fusion path)."""
    rng = np.random.default_rng(7)
    N, Hh, Wh, Ci, Cs, Co = 1, 16, 24, 64, 16, 16
    H, W = 2 * Hh, 2 * Wh
    intra = jnp.asarray(rng.standard_normal((N, Hh, Wh, Ci)), jnp.float32)
    skip = jnp.asarray(rng.standard_normal((N, H, W, Cs)), jnp.float32)
    wi = jnp.asarray(rng.standard_normal((1, 1, Cs, Ci)) * 0.1, jnp.float32)
    bi = jnp.asarray(rng.standard_normal((Ci,)) * 0.1, jnp.float32)
    wo = jnp.asarray(rng.standard_normal((3, 3, Ci, Co)) * 0.05, jnp.float32)

    def ref_chain(intra, skip, wi, bi, wo):
        up = resize_align_corners(intra, (H, W))
        u = up + jax.lax.conv_general_dilated(
            skip, wi, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bi
        o = jax.lax.conv_general_dilated(
            u, wo, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return o, u

    o_ref, u_ref = ref_chain(intra, skip, wi, bi, wo)
    o_got, u_got = topdown_fused_level(
        intra, skip, wi, bi, wo, interpret=True, mode=mode, with_u=True
    )
    np.testing.assert_allclose(np.asarray(o_got), np.asarray(o_ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(u_got), np.asarray(u_ref),
                               atol=1e-5, rtol=1e-5)

    cot_o = jnp.asarray(rng.standard_normal(o_ref.shape), jnp.float32)
    cot_u = jnp.asarray(rng.standard_normal(u_ref.shape), jnp.float32)

    def loss_fused(*a):
        o, u = topdown_fused_level(
            *a, interpret=True, mode=mode, with_u=True
        )
        return (o * cot_o).sum() + (u * cot_u).sum()

    def loss_ref(*a):
        o, u = ref_chain(*a)
        return (o * cot_o).sum() + (u * cot_u).sum()

    args = (intra, skip, wi, bi, wo)
    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    for name, a, b in zip(("intra", "skip", "wi", "bi", "wo"), g_f, g_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4, err_msg=name
        )


def test_full_model_fused_topdown_matches():
    """MVS4Net with fused_topdown=True: identical variables tree, identical
    eval depths (train mode uses the kernel too — its custom VJP is covered
    by test_fused_level_vjp_matches_xla_chain)."""
    import dataclasses

    import __graft_entry__ as ge
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.config import (
        ModelConfig,
    )
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.models import (
        MVS4Net,
    )

    cfg = ModelConfig(
        group_cor=True, group_cor_dim=(8, 8, 4, 4), inverse_depth=True,
        ndepths=(8, 8, 4, 4), warp_impl="gather", remat=False,
    )
    batch = ge._example_batch(B=1, V=2, H=64, W=64)
    mu = MVS4Net(cfg)
    mf = MVS4Net(dataclasses.replace(cfg, fused_topdown=True))
    vs = mu.init(
        jax.random.PRNGKey(0), batch["imgs"], batch["proj_matrices"],
        batch["depth_values"], train=False,
    )
    # identical variable trees (the _ConvParams holders mirror nn.Conv)
    vs_f = mf.init(
        jax.random.PRNGKey(0), batch["imgs"], batch["proj_matrices"],
        batch["depth_values"], train=False,
    )
    assert jax.tree_util.tree_structure(vs) == jax.tree_util.tree_structure(vs_f)

    ref = mu.apply(
        vs, batch["imgs"], batch["proj_matrices"], batch["depth_values"],
        train=False,
    )
    got = mf.apply(
        vs, batch["imgs"], batch["proj_matrices"], batch["depth_values"],
        train=False,
    )
    for s in range(1, 5):
        np.testing.assert_allclose(
            np.asarray(got[f"stage{s}"]["depth"]),
            np.asarray(ref[f"stage{s}"]["depth"]),
            atol=2e-2,
        )
        np.testing.assert_allclose(
            np.asarray(got[f"stage{s}"]["photometric_confidence"]),
            np.asarray(ref[f"stage{s}"]["photometric_confidence"]),
            atol=5e-3,
        )


def test_fused_level_vjp_matches_xla_chain():
    """The kernel's custom VJP (rematerialized unfused chain) must produce
    the same gradients as differentiating the XLA chain directly — for all
    five inputs (intra, skip, wi, bi, wo)."""
    rng = np.random.default_rng(3)
    N, Hh, Wh, Ci, Cs, Co = 1, 16, 24, 64, 8, 8
    H, W = 2 * Hh, 2 * Wh
    intra = jnp.asarray(rng.standard_normal((N, Hh, Wh, Ci)), jnp.float32)
    skip = jnp.asarray(rng.standard_normal((N, H, W, Cs)), jnp.float32)
    wi = jnp.asarray(rng.standard_normal((1, 1, Cs, Ci)) * 0.1, jnp.float32)
    bi = jnp.asarray(rng.standard_normal((Ci,)) * 0.1, jnp.float32)
    wo = jnp.asarray(rng.standard_normal((3, 3, Ci, Co)) * 0.05, jnp.float32)
    cot = jnp.asarray(rng.standard_normal((N, H, W, Co)), jnp.float32)

    def loss_fused(*a):
        return (topdown_fused_level(*a, interpret=True) * cot).sum()

    def loss_ref(intra, skip, wi, bi, wo):
        up = resize_align_corners(intra, (H, W))
        i3 = jax.lax.conv_general_dilated(
            skip, wi, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + bi
        o = jax.lax.conv_general_dilated(
            up + i3, wo, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return (o * cot).sum()

    args = (intra, skip, wi, bi, wo)
    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    for name, a, b in zip(("intra", "skip", "wi", "bi", "wo"), g_f, g_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4, err_msg=name
        )


def test_fused_chain_matches_xla_chain():
    """Fully-fused cascade (CW-layout inter-level hand-off) vs the unfused
    XLA chain: all three outputs + gradients for every input."""
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.ops.pallas.topdown_fused import (
        topdown_fused_chain,
    )

    rng = np.random.default_rng(9)
    N, Ci = 1, 64
    Hh, Wh = 8, 12  # L2 half-res; levels double to (16,24) -> (32,48) -> (64,96)
    intra = jnp.asarray(rng.standard_normal((N, Hh, Wh, Ci)), jnp.float32)
    skips, weights = [], []
    for lvl, (cs, co) in enumerate([(32, 32), (16, 16), (8, 8)]):
        H, W = 2 ** (lvl + 1) * Hh, 2 ** (lvl + 1) * Wh
        skips.append(
            jnp.asarray(rng.standard_normal((N, H, W, cs)), jnp.float32)
        )
        weights.append((
            jnp.asarray(rng.standard_normal((1, 1, cs, Ci)) * 0.1, jnp.float32),
            jnp.asarray(rng.standard_normal((Ci,)) * 0.1, jnp.float32),
            jnp.asarray(rng.standard_normal((3, 3, Ci, co)) * 0.05, jnp.float32),
        ))

    def ref_chain(intra, skips, weights):
        outs = []
        cur = intra
        for skip, (wi, bi, wo) in zip(skips, weights):
            H, W = skip.shape[1:3]
            cur = resize_align_corners(cur, (H, W)) + jax.lax.conv_general_dilated(
                skip, wi, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bi
            outs.append(jax.lax.conv_general_dilated(
                cur, wo, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ))
        return tuple(outs)

    ref = ref_chain(intra, skips, weights)
    got = topdown_fused_chain(intra, tuple(skips), tuple(weights),
                              interpret=True)
    for i, (a, b) in enumerate(zip(got, ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-5,
            err_msg=f"o{i + 2}",
        )

    cots = [jnp.asarray(rng.standard_normal(r.shape), jnp.float32) for r in ref]

    def loss_fused(intra, skips, weights):
        outs = topdown_fused_chain(intra, skips, weights, interpret=True)
        return sum((o * c).sum() for o, c in zip(outs, cots))

    def loss_ref(intra, skips, weights):
        return sum((o * c).sum() for o, c in zip(ref_chain(intra, skips, weights), cots))

    args = (intra, tuple(skips), tuple(weights))
    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(*args)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(*args)
    for a, b in zip(jax.tree_util.tree_leaves(g_f), jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)
