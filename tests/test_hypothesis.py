"""Depth-hypothesis scheduler tests (reference: mvs4net_utils.py:69-106)."""

import numpy as np

import jax.numpy as jnp

from deep_reconstruction_with_epipolar_lines_mvster_tpu.core import (
    init_range,
    init_inverse_range,
    schedule_inverse_range,
    schedule_range,
)


def test_init_range_uniform():
    dv = jnp.asarray([[425.0, 935.0]], dtype=jnp.float32)
    out = init_range(dv, 8, 4, 5)
    assert out.shape == (1, 8, 4, 5)
    col = np.asarray(out[0, :, 0, 0])
    np.testing.assert_allclose(col, np.linspace(425.0, 935.0, 8), rtol=1e-6)
    # constant over space
    assert np.ptp(np.asarray(out[0, 3])) == 0


def test_init_inverse_range_endpoints_and_order():
    dv = jnp.asarray([[425.0, 935.0]], dtype=jnp.float32)
    out = np.asarray(init_inverse_range(dv, 8, 2, 2))
    # index 0 is the far plane (1/dmax), last index the near plane (reference
    # ordering, mvs4net_utils.py:79-85)
    np.testing.assert_allclose(out[0, 0, 0, 0], 935.0, rtol=1e-5)
    np.testing.assert_allclose(out[0, -1, 0, 0], 425.0, rtol=1e-5)
    inv = 1.0 / out[0, :, 0, 0]
    np.testing.assert_allclose(np.diff(inv), np.diff(inv)[0] * np.ones(7), rtol=1e-4)


def test_schedule_inverse_range_window():
    B, h2, w2 = 1, 4, 4
    inv_min = jnp.full((B, h2, w2), 1 / 400.0, dtype=jnp.float32)
    inv_max = jnp.full((B, h2, w2), 1 / 900.0, dtype=jnp.float32)
    out = np.asarray(schedule_inverse_range(inv_min, inv_max, 4, 8, 8))
    assert out.shape == (1, 4, 8, 8)
    np.testing.assert_allclose(out[0, 0], 900.0, rtol=1e-4)
    np.testing.assert_allclose(out[0, -1], 400.0, rtol=1e-4)


def test_schedule_range_centered():
    cur = jnp.full((1, 4, 4), 600.0, dtype=jnp.float32)
    itv = jnp.asarray([2.0], dtype=jnp.float32)
    out = np.asarray(schedule_range(cur, 4, itv, 8, 8))
    assert out.shape == (1, 4, 8, 8)
    # window spans cur +/- ndepth/2*itv = [596, 604], uniformly in depth
    np.testing.assert_allclose(out[0, 0], 596.0, rtol=1e-5)
    np.testing.assert_allclose(out[0, -1], 604.0, rtol=1e-5)
    col = out[0, :, 2, 2]
    np.testing.assert_allclose(np.diff(col), np.diff(col)[0], rtol=1e-4)
