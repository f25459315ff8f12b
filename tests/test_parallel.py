"""Multi-device (virtual CPU mesh) tests for the data-parallel train step and
the driver entry points."""

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
