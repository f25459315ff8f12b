"""Spatially-sharded eval forward (space axis over image rows) matches the
unsharded result on the virtual CPU mesh; multihost helper no-ops on one
process."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep_reconstruction_with_epipolar_lines_mvster_tpu.config import ModelConfig
from deep_reconstruction_with_epipolar_lines_mvster_tpu.models import MVS4Net
from deep_reconstruction_with_epipolar_lines_mvster_tpu.parallel import (
    make_mesh,
    reduce_scalars_across_hosts,
    replicate,
    shard_eval_forward,
    shard_eval_forward_shard_map,
    sync_hosts,
)

from test_model import make_inputs


def test_space_sharded_eval_matches_unsharded():
    cfg = ModelConfig(
        group_cor=True, group_cor_dim=(8, 8, 4, 4), inverse_depth=True
    )
    imgs, projs, dv = make_inputs(V=3, H=64, W=64)
    model = MVS4Net(cfg)
    variables = model.init(jax.random.PRNGKey(0), imgs, projs, dv, train=False)

    def forward(variables, imgs, projs, dv):
        out = model.apply(variables, imgs, projs, dv, train=False)
        return out["stage4"]["depth"], out["stage4"]["photometric_confidence"]

    depth_ref, conf_ref = jax.jit(forward)(variables, imgs, projs, dv)

    mesh = make_mesh(jax.devices()[:4], space=4)  # data=1 (B=1), 4-way rows
    with mesh:
        sharded = shard_eval_forward(forward, mesh)
        depth_sh, conf_sh = sharded(replicate(variables, mesh), imgs, projs, dv)

    # winner-take-all readout: fp reduction-order changes under sharding can
    # flip argmax ties on a handful of pixels — require near-total agreement
    d_sh, d_ref = np.asarray(depth_sh), np.asarray(depth_ref)
    agree = np.isclose(d_sh, d_ref, rtol=1e-4, atol=1e-2).mean()
    assert agree > 0.995, f"only {agree:.4f} of depths match"
    c_sh, c_ref = np.asarray(conf_sh), np.asarray(conf_ref)
    agree_c = np.isclose(c_sh, c_ref, rtol=1e-3, atol=1e-3).mean()
    assert agree_c > 0.995


def test_shard_map_eval_forward_matches_unsharded():
    """Data-parallel shard_map eval (per-shard local execution — the path
    that keeps the eval Pallas kernels sharded at scale) matches the
    single-device forward on a replicated batch."""
    cfg = ModelConfig(
        group_cor=True, group_cor_dim=(8, 8, 4, 4), inverse_depth=True
    )
    imgs, projs, dv = make_inputs(V=2, H=64, W=64)
    B = 4
    imgs = jnp.broadcast_to(imgs, (B, *imgs.shape[1:]))
    projs = {k: jnp.broadcast_to(v, (B, *v.shape[1:])) for k, v in projs.items()}
    dv = jnp.broadcast_to(dv, (B, *dv.shape[1:]))
    model = MVS4Net(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        imgs[:1], {k: v[:1] for k, v in projs.items()}, dv[:1], train=False,
    )

    def forward(variables, imgs, projs, dv):
        out = model.apply(variables, imgs, projs, dv, train=False)
        return out["stage4"]["depth"], out["stage4"]["photometric_confidence"]

    depth_ref, conf_ref = jax.jit(forward)(variables, imgs, projs, dv)

    mesh = make_mesh(jax.devices()[:4], space=1)  # 4-way data
    with mesh:
        fn = shard_eval_forward_shard_map(forward, mesh)
        from deep_reconstruction_with_epipolar_lines_mvster_tpu.parallel import (
            shard_batch,
        )

        b = shard_batch(
            {"imgs": imgs, "proj_matrices": projs, "depth_values": dv}, mesh
        )
        depth_sh, conf_sh = fn(
            replicate(variables, mesh), b["imgs"], b["proj_matrices"],
            b["depth_values"],
        )
    np.testing.assert_allclose(
        np.asarray(depth_sh), np.asarray(depth_ref), rtol=1e-4, atol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(conf_sh), np.asarray(conf_ref), rtol=1e-3, atol=1e-3
    )


def test_multihost_helpers_single_process():
    sync_hosts()
    out = reduce_scalars_across_hosts({"a": 1.0, "b": 2.5})
    assert out == {"a": 1.0, "b": 2.5}


@pytest.mark.slow
def test_space_sharded_shard_map_eval_matches_unsharded():
    """Row-sharded shard_map eval (shard_eval_forward_space — backbone
    replicated over 'space', warp/reg/readout halo-windowed per shard,
    Pallas-eligible flagship warp config) matches the unsharded forward.
    H=256 so stage4 genuinely shards (hs=128 + 2*48 halo = 224 < 256) while
    the coarse stages run replicated."""
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.parallel import (
        shard_batch,
        shard_eval_forward_space,
    )

    cfg = ModelConfig(
        group_cor=True, group_cor_dim=(8, 8, 4, 4), inverse_depth=True,
        warp_impl="mxu_hybrid", remat=False,
    )
    imgs, projs, dv = make_inputs(V=2, H=256, W=256)
    B = 2
    imgs = jnp.concatenate([imgs, imgs * 0.5], axis=0)
    projs = {k: jnp.broadcast_to(v, (B, *v.shape[1:])) for k, v in projs.items()}
    dv = jnp.broadcast_to(dv, (B, *dv.shape[1:]))
    model = MVS4Net(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        imgs[:1], {k: v[:1] for k, v in projs.items()}, dv[:1], train=False,
    )

    def forward(variables, imgs, projs, dv):
        out = model.apply(variables, imgs, projs, dv, train=False)
        return out["stage4"]["depth"], out["stage4"]["photometric_confidence"]

    depth_ref, conf_ref = jax.jit(forward)(variables, imgs, projs, dv)

    mesh = make_mesh(jax.devices()[:4], space=2)  # data=2 x space=2
    with mesh:
        fn = shard_eval_forward_space(model, mesh, space_halo=48)
        b = shard_batch(
            {"imgs": imgs, "proj_matrices": projs, "depth_values": dv}, mesh
        )
        depth_sh, conf_sh = fn(
            replicate(variables, mesh), b["imgs"], b["proj_matrices"],
            b["depth_values"],
        )

    # overlap-tile decomposition is exact up to fp-tiling noise; allow the
    # usual handful of argmax tie flips
    d_sh, d_ref = np.asarray(depth_sh), np.asarray(depth_ref)
    agree = np.isclose(d_sh, d_ref, rtol=1e-4, atol=1e-2).mean()
    assert agree > 0.999, f"only {agree:.5f} of depths match"
    c_sh, c_ref = np.asarray(conf_sh), np.asarray(conf_ref)
    agree_c = np.isclose(c_sh, c_ref, rtol=1e-3, atol=1e-3).mean()
    assert agree_c > 0.999


@pytest.mark.slow
def test_space_sharded_real_kernels_eval_matches_unsharded():
    """Row-sharded shard_map eval with the ACTUAL flagship kernel set —
    warp_impl=mxu_v3 (Pallas forward, interpret mode on CPU), fused
    top-down chain, fused warp+group-cor — so the parallel/mesh.py claim
    that 'Pallas kernels execute on per-shard local row windows' is
    exercised with the real kernels, not the XLA-scan fallback. Shape
    256x320: stage-4 W=320 is the eval-loader trait (64-multiple crop,
    NOT a 128 multiple, so the kernels' width zero-pad branches engage
    under sharding), and hs=128 + 2*48 halo = 224 < 256 genuinely shards
    stage 4."""
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.parallel import (
        shard_batch,
        shard_eval_forward_space,
    )

    cfg = ModelConfig(
        group_cor=True, group_cor_dim=(8, 8, 4, 4), inverse_depth=True,
        warp_impl="mxu_v3", fused_topdown=True, remat=False,
    )
    imgs, projs, dv = make_inputs(V=2, H=256, W=320)
    B = 2
    imgs = jnp.concatenate([imgs, imgs * 0.5], axis=0)
    projs = {k: jnp.broadcast_to(v, (B, *v.shape[1:])) for k, v in projs.items()}
    dv = jnp.broadcast_to(dv, (B, *dv.shape[1:]))
    model = MVS4Net(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        imgs[:1], {k: v[:1] for k, v in projs.items()}, dv[:1], train=False,
    )

    def forward(variables, imgs, projs, dv):
        out = model.apply(variables, imgs, projs, dv, train=False)
        return out["stage4"]["depth"], out["stage4"]["photometric_confidence"]

    depth_ref, conf_ref = jax.jit(forward)(variables, imgs, projs, dv)

    mesh = make_mesh(jax.devices()[:4], space=2)  # data=2 x space=2
    with mesh:
        fn = shard_eval_forward_space(model, mesh, space_halo=48)
        b = shard_batch(
            {"imgs": imgs, "proj_matrices": projs, "depth_values": dv}, mesh
        )
        depth_sh, conf_sh = fn(
            replicate(variables, mesh), b["imgs"], b["proj_matrices"],
            b["depth_values"],
        )

    d_sh, d_ref = np.asarray(depth_sh), np.asarray(depth_ref)
    agree = np.isclose(d_sh, d_ref, rtol=1e-4, atol=1e-2).mean()
    assert agree > 0.999, f"only {agree:.5f} of depths match"
    c_sh, c_ref = np.asarray(conf_sh), np.asarray(conf_ref)
    agree_c = np.isclose(c_sh, c_ref, rtol=1e-3, atol=1e-3).mean()
    assert agree_c > 0.999
