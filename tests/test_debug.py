"""Numeric debug subsystem: bitmask decoding + dump files."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from deep_reconstruction_with_epipolar_lines_mvster_tpu.config import ModelConfig
from deep_reconstruction_with_epipolar_lines_mvster_tpu.models import MVS4Net
from deep_reconstruction_with_epipolar_lines_mvster_tpu.utils import (
    debug_dump_forward,
    get_powers,
)

from test_model import make_inputs


def test_get_powers_matches_reference():
    # reference get_powers semantics (train_mvs4.py:112-113)
    assert get_powers(0) == []
    assert get_powers(1) == ["0"]
    assert get_powers(2) == ["1"]
    assert get_powers(5) == ["0", "2"]
    assert get_powers(255) == [str(i) for i in range(8)]


def test_debug_dump(tmp_path):
    cfg = ModelConfig(
        group_cor=True, group_cor_dim=(8, 8, 4, 4), inverse_depth=True
    )
    imgs, projs, dv = make_inputs(V=2, H=64, W=64)
    model = MVS4Net(cfg)
    variables = model.init(jax.random.PRNGKey(0), imgs, projs, dv, train=False)

    written = debug_dump_forward(
        model, variables, imgs, projs, dv,
        bits=2 + 4 + 8 + 32 + 64,  # depth, hypos, attn, warped, cor weights
        outdir=str(tmp_path), train=False,
    )
    assert any("stage4_depth" in k for k in written)
    assert any("stage1_hypo_depth" in k for k in written)
    assert any("stage1_attn_weight" in k for k in written)
    assert any("warped_src0" in k for k in written)
    assert any("cor_weight_src0" in k for k in written)
    for path in written.values():
        assert os.path.exists(path)
        arr = np.load(path)
        assert np.isfinite(arr).all()
    # attn weights are distributions over D
    attn = np.load(written["stage1_attn_weight"])
    np.testing.assert_allclose(attn.sum(axis=0), 1.0, atol=1e-5)
