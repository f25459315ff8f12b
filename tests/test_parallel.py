"""Multi-device (virtual CPU mesh) tests for the data-parallel train step and
the driver entry points."""

import pytest
import numpy as np

import jax

from deep_reconstruction_with_epipolar_lines_mvster_tpu.parallel import make_mesh


def test_mesh_shapes():
    mesh = make_mesh(jax.devices()[:8], space=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "space")


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow  # 64 s; dryrun8 covers compile+run (r5 re-tier)
def test_entry_compiles_tiny():
    """entry() returns a jittable fn; compile-check on reduced shapes by
    rebuilding with the same model but smaller example args."""
    import __graft_entry__ as ge

    model = ge._dtu_model()
    batch = ge._example_batch(B=1, V=2, H=64, W=64)
    variables = model.init(
        jax.random.PRNGKey(0),
        batch["imgs"],
        batch["proj_matrices"],
        batch["depth_values"],
        train=False,
    )

    def fn(variables, imgs, projs, dv):
        out = model.apply(variables, imgs, projs, dv, train=False)
        return out["stage4"]["depth"], out["stage4"]["photometric_confidence"]

    depth, conf = jax.jit(fn)(
        variables, batch["imgs"], batch["proj_matrices"], batch["depth_values"]
    )
    assert np.isfinite(np.asarray(depth)).all()
    assert depth.shape == (1, 64, 64)


@pytest.mark.slow  # 119 s; dryrun8 is the fast-tier parallel gate (r5 re-tier)
def test_shard_map_step_matches_gspmd():
    """shard_map-based sharded train step (explicit pmean collectives, local
    pallas shapes) produces the same updated state and scalars as the GSPMD
    jit version on the 8-device CPU mesh — and uses shapes large enough that
    the hybrid warp's Pallas backward actually engages (W=256 > xband_al)."""
    import jax.numpy as jnp

    from deep_reconstruction_with_epipolar_lines_mvster_tpu.config import (
        LossConfig,
        ModelConfig,
    )
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.data.synthetic import (
        batch_samples,
        make_plane_scene,
    )
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.models import MVS4Net
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.parallel import (
        replicate,
        shard_batch,
        shard_train_step,
        shard_train_step_shard_map,
    )
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.train import (
        TrainState,
        make_optimizer,
        make_train_step,
    )
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.train.schedule import (
        warmup_multistep,
    )

    cfg = ModelConfig(
        group_cor=True, group_cor_dim=(8, 8, 4, 4), inverse_depth=True,
        warp_impl="mxu_hybrid", warp_xband=96, warp_tile_cols=32,
        remat=False,
    )
    lcfg = LossConfig(inverse_depth=True, l1_lw=0.003, ot_iter=2)
    model = MVS4Net(cfg)
    # ONE sample replicated 8x: per-shard BatchNorm statistics then equal
    # the global-batch statistics, so the two shardings must agree exactly.
    # (On distinct samples they legitimately differ: GSPMD normalizes over
    # the GLOBAL batch — SyncBN semantics — while shard_map normalizes per
    # shard, which is the reference's per-GPU DDP BatchNorm behaviour;
    # documented in parallel/mesh.py.)
    scenes = [make_plane_scene(V=2, H=64, W=256, seed=0) for _ in range(8)]
    for s in scenes:
        for k in ("view_depths", "intrinsics", "extrinsics"):
            s.pop(k)
    batch = batch_samples(scenes)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch["imgs"][:1]),
        jax.tree_util.tree_map(lambda x: jnp.asarray(x[:1]), batch["proj_matrices"]),
        jnp.asarray(batch["depth_values"][:1]),
        train=True,
    )
    # SGD for the comparison: Adam's first step is ~sign(grad)*lr, which
    # flips on near-zero grads under different f32 reduction orders
    import optax

    tx = optax.sgd(1e-3)
    mesh = make_mesh(jax.devices()[:8], space=1)
    sharded = shard_batch(batch, mesh)

    def run(build):
        # fresh host copies per run: jit donation deletes the device buffers
        # and device_put may reuse a cached placement of the same array
        fresh = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), variables)
        state = replicate(TrainState.create(fresh, tx), mesh)
        with mesh:
            new_state, scalars = build(state, sharded)
        return (
            jax.device_get(new_state.params),
            {k: float(v) for k, v in scalars.items()},
        )

    gspmd_step = shard_train_step(make_train_step(model, lcfg, tx), mesh)
    smap_step = shard_train_step_shard_map(
        make_train_step(model, lcfg, tx, axis_name="data"), mesh
    )
    p_ref, s_ref = run(gspmd_step)
    p_smap, s_smap = run(smap_step)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-7),
        p_ref, p_smap,
    )
    assert abs(s_ref["loss"] - s_smap["loss"]) < 1e-3


def test_pad_batch_to_multiple():
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.parallel.mesh import (
        pad_batch_to_multiple,
    )

    batch = {
        "imgs": np.arange(4 * 3).reshape(4, 3).astype(np.float32),
        "proj_matrices": {"stage1": np.arange(4).astype(np.int32)},
    }
    out = pad_batch_to_multiple(batch, 8)
    assert out["imgs"].shape == (8, 3)
    # wrap-around padding: sample i pads as i % n
    np.testing.assert_array_equal(out["imgs"][4:], batch["imgs"])
    np.testing.assert_array_equal(
        out["proj_matrices"]["stage1"], np.array([0, 1, 2, 3, 0, 1, 2, 3])
    )
    # already divisible: unchanged object
    same = pad_batch_to_multiple(batch, 4)
    assert same is batch


@pytest.mark.slow  # 33 s (r5 re-tier)
def test_shard_map_bn_stats_replicated_on_distinct_samples():
    """With DISTINCT per-shard samples, the shard_map step's updated
    BatchNorm running stats must be truly identical across device buffers
    (they are pmean-synced inside the step; without that sync the P()
    out_spec would silently hold divergent per-device values)."""
    import jax.numpy as jnp
    import optax

    from deep_reconstruction_with_epipolar_lines_mvster_tpu.config import (
        LossConfig,
        ModelConfig,
    )
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.data.synthetic import (
        batch_samples,
        make_plane_scene,
    )
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.models import MVS4Net
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.parallel import (
        replicate,
        shard_batch,
        shard_train_step_shard_map,
    )
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.train import (
        TrainState,
        make_train_step,
    )

    cfg = ModelConfig(
        group_cor=True, group_cor_dim=(8, 8, 4, 4), inverse_depth=True,
        warp_impl="gather", remat=False,
    )
    lcfg = LossConfig(inverse_depth=True, ot_iter=2)
    model = MVS4Net(cfg)
    scenes = [make_plane_scene(V=2, H=64, W=64, seed=i) for i in range(8)]
    for s in scenes:
        for k in ("view_depths", "intrinsics", "extrinsics"):
            s.pop(k)
    batch = batch_samples(scenes)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch["imgs"][:1]),
        jax.tree_util.tree_map(lambda x: jnp.asarray(x[:1]), batch["proj_matrices"]),
        jnp.asarray(batch["depth_values"][:1]),
        train=True,
    )
    tx = optax.sgd(1e-3)
    mesh = make_mesh(jax.devices()[:8], space=1)
    step = shard_train_step_shard_map(
        make_train_step(model, lcfg, tx, axis_name="data"), mesh
    )
    state = replicate(TrainState.create(variables, tx), mesh)
    with mesh:
        new_state, _ = step(state, shard_batch(batch, mesh))

    leaves = jax.tree_util.tree_leaves(new_state.batch_stats)
    checked = 0
    for leaf in leaves:
        shards = getattr(leaf, "addressable_shards", None)
        if not shards or len(shards) < 2:
            continue
        ref = np.asarray(shards[0].data)
        for sh in shards[1:]:
            np.testing.assert_array_equal(np.asarray(sh.data), ref)
        checked += 1
    assert checked > 0


@pytest.mark.slow  # 64 s (r5 re-tier)
def test_padded_val_batch_metrics_exact():
    """The wrap-padded trailing val batch's scalars must equal the unpadded
    single-device run EXACTLY (per-sample validity mask in the metric
    reduction — parallel/mesh.py:pad_batch_to_multiple + train/step.py)."""
    import jax.numpy as jnp

    from deep_reconstruction_with_epipolar_lines_mvster_tpu.config import (
        LossConfig,
        ModelConfig,
    )
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.data.synthetic import (
        batch_samples,
        make_plane_scene,
    )
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.models import MVS4Net
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.parallel.mesh import (
        pad_batch_to_multiple,
    )
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.train import (
        TrainState,
        make_eval_step,
        make_optimizer,
    )

    cfg = ModelConfig(
        ndepths=(4, 4, 4, 4), group_cor=True, group_cor_dim=(4, 4, 4, 4),
        inverse_depth=True, remat=False, warp_impl="mxu",
    )
    scenes = [make_plane_scene(V=2, H=64, W=64, seed=i) for i in range(3)]
    for s in scenes:
        for k in ("view_depths", "intrinsics", "extrinsics"):
            s.pop(k)
    batch = batch_samples(scenes)  # n=3, uneven vs a 4-wide data axis

    model = MVS4Net(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch["imgs"]),
        jax.tree_util.tree_map(jnp.asarray, batch["proj_matrices"]),
        jnp.asarray(batch["depth_values"]),
        train=True,
    )
    state = TrainState.create(variables, make_optimizer(lambda _: 1e-3))
    step = jax.jit(make_eval_step(model, LossConfig(inverse_depth=True)))

    padded = pad_batch_to_multiple(batch, 4)
    assert padded["imgs"].shape[0] == 4 and "valid" in padded
    np.testing.assert_array_equal(padded["valid"], [1.0, 1.0, 1.0, 0.0])

    ref = step(state, jax.tree_util.tree_map(jnp.asarray, batch))
    got = step(state, jax.tree_util.tree_map(jnp.asarray, padded))
    for k in ref:
        np.testing.assert_allclose(
            float(got[k]), float(ref[k]), rtol=1e-6, atol=1e-7, err_msg=k
        )
