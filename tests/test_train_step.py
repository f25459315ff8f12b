"""End-to-end slice: overfit one synthetic plane scene with the jitted train
step (SURVEY.md §7 step 2 — the 'one model running' milestone)."""

import numpy as np
import pytest

import jax
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
from deep_reconstruction_with_epipolar_lines_mvster_tpu.train.schedule import (
    warmup_multistep,
)
from deep_reconstruction_with_epipolar_lines_mvster_tpu.train.step import (
    TrainState,
    make_eval_step,
    make_optimizer,
    make_train_step,
)


def test_overfit_synthetic_plane():
    cfg = ModelConfig(
        group_cor=True, group_cor_dim=(8, 8, 4, 4), inverse_depth=True, mono=True
    )
    lcfg = LossConfig(inverse_depth=True, mono=True, l1_lw=0.003, ot_lw=1.0)
    batch = batch_samples([make_plane_scene(V=3, H=64, W=64)])
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    model = MVS4Net(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        batch["imgs"],
        batch["proj_matrices"],
        batch["depth_values"],
        train=True,
    )
    tx = make_optimizer(warmup_multistep(1e-3, [10_000], 0.5, warmup_iters=10))
    state = TrainState.create(variables, tx)
    train_step = jax.jit(make_train_step(model, lcfg, tx))

    first = None
    for i in range(40):
        state, scalars = train_step(state, batch)
        if first is None:
            first = {k: float(v) for k, v in scalars.items()}
    last = {k: float(v) for k, v in scalars.items()}

    assert np.isfinite(last["loss"])
    assert last["loss"] < first["loss"], (first["loss"], last["loss"])
    assert last["abs_depth_error"] < first["abs_depth_error"]
    # the OT loss on the coarsest stage should have clearly dropped
    assert last["s0_c_loss"] < first["s0_c_loss"]

    # eval step runs and produces finite scalars with the trained params
    eval_step = jax.jit(make_eval_step(model, lcfg))
    ev = eval_step(state, batch)
    assert np.isfinite(float(ev["loss"]))
    assert np.isfinite(float(ev["abs_depth_error"]))


def test_warmup_multistep_schedule_values():
    sched = warmup_multistep(1.0, [100, 200], 0.5, warmup_iters=10)
    # linear warmup from 1/3 to 1
    np.testing.assert_allclose(float(sched(0)), 1.0 / 3.0, rtol=1e-6)
    np.testing.assert_allclose(float(sched(5)), 1.0 / 3.0 * 0.5 + 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(sched(10)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(sched(99)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(sched(100)), 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(sched(250)), 0.25, rtol=1e-6)


def test_cyclic_tri2_matches_torch_oracle():
    """CyclicLR triangular2 curve vs torch's scheduler (reference
    train_mvs4.py:131-134 parameters: base=lr, max=100*lr, step_size_up=4)."""
    torch = pytest.importorskip("torch")
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.train.schedule import cyclic_tri2

    base, mx = 1e-3, 1e-1
    sched = cyclic_tri2(base, mx, step_size_up=4)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base)
    ref = torch.optim.lr_scheduler.CyclicLR(
        opt, base_lr=base, max_lr=mx, step_size_up=4,
        mode="triangular2", cycle_momentum=False,
    )
    for step in range(40):
        np.testing.assert_allclose(
            float(sched(step)), opt.param_groups[0]["lr"], rtol=1e-5,
            err_msg=f"step {step}",
        )
        opt.step()
        ref.step()


def test_exponent_schedule_decays_per_epoch():
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.train.schedule import exponent

    sched = exponent(1.0, steps_per_epoch=50)
    # constant inside an epoch, 0.17x at each epoch boundary (ExponentialLR
    # gamma=0.17 stepped per epoch — the reference's intended semantics)
    np.testing.assert_allclose(float(sched(0)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(sched(49)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(sched(50)), 0.17, rtol=1e-5)
    np.testing.assert_allclose(float(sched(149)), 0.17**2, rtol=1e-5)
