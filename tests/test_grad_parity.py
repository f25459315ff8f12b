"""Gradient-level torch parity: dL/dparams of the full training objective
(reference ``train_mvs4.py:344`` backward through ``MVS4Net.py:195-240``)
must match between the reference PyTorch net and the flax rebuild on
transplanted weights — forward parity alone (tests/test_torch_parity.py)
does not prove the training dynamics are equivalent.

Technique: the torch per-parameter gradients are routed through the SAME
name-mapping converter used for weights (``torch_state_dict_to_flax`` on a
state_dict whose param entries are replaced by their ``.grad``), giving an
exactly-aligned gradient tree to compare leaf by leaf. A briefly-trained
net is used (like the forward-parity harness) so the argmax readout is not
tie-degenerate; residual tie-flips perturb a few pixels' loss terms, which
bounds elementwise agreement — comparisons use per-leaf relative L2.

Also checks one-optimizer-step drift: a FRESH Adam step in torch vs optax
from the same weights/grads must land on the same parameters.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "models")),
    reason="reference checkout not mounted",
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from deep_reconstruction_with_epipolar_lines_mvster_tpu.config import (  # noqa: E402
    LossConfig,
)
from deep_reconstruction_with_epipolar_lines_mvster_tpu.models import MVS4Net  # noqa: E402
from deep_reconstruction_with_epipolar_lines_mvster_tpu.models.losses import (  # noqa: E402
    mvs4net_loss,
)
from deep_reconstruction_with_epipolar_lines_mvster_tpu.utils.torch_port import (  # noqa: E402
    torch_state_dict_to_flax,
)

sys.path.insert(0, os.path.dirname(__file__))
from test_torch_parity import (  # noqa: E402
    _batch,
    _build_ref,
    _make_cfg,
    _torch_inputs,
    _train_briefly,
)


def _rel_l2(a, b):
    na = np.linalg.norm(a - b)
    nb = np.linalg.norm(b)
    return na / (nb + 1e-12)


@pytest.mark.slow
def test_grad_parity_dtu_config():
    cfg = _make_cfg()  # DTU flagship: group_cor 8,8,4,4 / inverse / mono
    ref_net, _ = _build_ref(cfg, seed=0)
    batch = _batch(2, 3, 64, 128)
    lcfg = LossConfig(
        l1_lw=0.003, ot_lw=1.0, inverse_depth=True, mono=True,
        ot_iter=3, ot_eps=1.0,
    )
    _train_briefly(ref_net, batch, lcfg)
    imgs_list, projs_t, dv_t = _torch_inputs(batch)
    gt_t = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in batch["depth"].items()
    }
    mask_t = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in batch["mask"].items()
    }

    # ---- torch backward ---------------------------------------------------
    from models.MVS4Net import MVS4net_loss as ref_loss  # noqa: PLC0415

    ref_net.train()
    ref_net.zero_grad(set_to_none=True)
    out = ref_net(imgs_list, projs_t, dv_t)
    loss_t = ref_loss(
        out, gt_t, mask_t, stage_lw=[1, 1, 1, 1],
        l1ot_lw=[lcfg.l1_lw, lcfg.ot_lw], inverse_depth=lcfg.inverse_depth,
        ot_iter=lcfg.ot_iter, ot_eps=lcfg.ot_eps, mono=lcfg.mono,
    )[0]
    loss_t.backward()

    # ---- transplant weights AND grads through the same converter -----------
    model = MVS4Net(cfg)
    template = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch["imgs"][:1]),
        jax.tree_util.tree_map(
            lambda x: jnp.asarray(x[:1]), batch["proj_matrices"]
        ),
        jnp.asarray(batch["depth_values"][:1]),
        train=True,
    )
    sd = ref_net.state_dict()
    variables = torch_state_dict_to_flax(sd, template, cfg)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    params_t = dict(ref_net.named_parameters())
    sd_grad = {
        k: (params_t[k].grad.detach() if k in params_t else v)
        for k, v in sd.items()
    }
    grads_ref = torch_state_dict_to_flax(sd_grad, template, cfg)["params"]

    # ---- jax backward -----------------------------------------------------
    args = (
        jnp.asarray(batch["imgs"]),
        jax.tree_util.tree_map(jnp.asarray, batch["proj_matrices"]),
        jnp.asarray(batch["depth_values"]),
    )

    def loss_fn(params):
        outputs, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            *args, train=True, mutable=["batch_stats"],
        )
        return mvs4net_loss(
            outputs,
            jax.tree_util.tree_map(jnp.asarray, batch["depth"]),
            jax.tree_util.tree_map(jnp.asarray, batch["mask"]),
            lcfg,
        )[0]

    loss_f, grads_f = jax.value_and_grad(loss_fn)(variables["params"])
    np.testing.assert_allclose(
        float(loss_f), float(loss_t.detach()), rtol=1.5e-2, err_msg="loss"
    )

    flat_f = {
        "/".join(str(k.key) for k in path): np.asarray(v, np.float64)
        for path, v in jax.tree_util.tree_flatten_with_path(grads_f)[0]
    }
    flat_r = {
        "/".join(str(k.key) for k in path): np.asarray(v, np.float64)
        for path, v in jax.tree_util.tree_flatten_with_path(grads_ref)[0]
    }
    assert set(flat_f) == set(flat_r)

    gnorm = np.sqrt(sum(np.sum(v * v) for v in flat_r.values()))
    bad = {}
    for name in sorted(flat_f):
        nr = np.linalg.norm(flat_r[name])
        if nr < 1e-5 * gnorm:
            # numerically-zero gradient (e.g. a conv bias feeding straight
            # into train-mode BN, which cancels any bias shift): rel L2
            # compares noise to noise — require the flax grad be zero too
            assert np.linalg.norm(flat_f[name]) < 1e-4 * gnorm, name
            continue
        r = _rel_l2(flat_f[name], flat_r[name])
        if r > 0.02:  # per-leaf relative L2 (tie-flip pixels bound this)
            bad[name] = r
    assert not bad, f"gradient mismatch (rel L2 > 2%): {bad}"

    # ---- one fresh-Adam-step drift ------------------------------------------
    lr = 1e-3
    opt_t = torch.optim.Adam(ref_net.parameters(), lr=lr)
    opt_t.step()  # uses the .grad already populated
    stepped_ref = torch_state_dict_to_flax(ref_net.state_dict(), template, cfg)

    tx = optax.adam(lr)  # same eps placement / bias correction as torch Adam
    upd, _ = tx.update(grads_f, tx.init(variables["params"]),
                       variables["params"])
    stepped_f = optax.apply_updates(variables["params"], upd)

    flat_sf = {
        "/".join(str(k.key) for k in path): np.asarray(v, np.float64)
        for path, v in jax.tree_util.tree_flatten_with_path(stepped_f)[0]
    }
    flat_sr = {
        "/".join(str(k.key) for k in path): np.asarray(v, np.float64)
        for path, v in jax.tree_util.tree_flatten_with_path(
            stepped_ref["params"]
        )[0]
    }
    bad = {}
    for name in sorted(flat_sf):
        if np.linalg.norm(flat_r[name]) < 1e-5 * gnorm:
            continue  # numerically-zero grad: step-1 Adam is sign(noise)
        # step-1 Adam updates are ~sign(g)*lr: elements whose (tiny) grads
        # disagree in sign move 2*lr apart — bound the count, not just norms
        d = np.abs(flat_sf[name] - flat_sr[name])
        frac = (d > 0.5 * lr).mean()
        if frac > 0.02:
            bad[name] = float(frac)
    assert not bad, f"post-Adam-step drift on >2% of elements: {bad}"
