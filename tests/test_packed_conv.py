"""Width-packed conv execution (ops/packed_conv.py) — exactness vs the
plain XLA lowering, and variable-interchangeability of the packed model
blocks (same params, different execution layout)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from deep_reconstruction_with_epipolar_lines_mvster_tpu.ops.packed_conv import (
    pack_w,
    packed_conv_w,
    pick_pack,
    unpack_w,
    zero_stuff,
)


@pytest.mark.parametrize(
    "kw,stride,pad,k_in,k_out",
    [
        (3, 1, 1, 16, 16),
        (3, 1, 1, 8, 8),
        (5, 2, 2, 16, 8),
        (3, 2, 1, 8, 4),
        (1, 1, 0, 16, 16),
        (3, 1, 1, 4, 8),   # k_out > k_in (R=2)
    ],
)
def test_packed_conv2d_matches_xla(kw, stride, pad, k_in, k_out):
    rng = np.random.default_rng(0)
    N, H, W, Ci, Co = 2, 6, 64, 3, 5
    x = jnp.asarray(rng.standard_normal((N, H, W, Ci)), jnp.float32)
    K = jnp.asarray(rng.standard_normal((kw, kw, Ci, Co)), jnp.float32)

    ref = lax.conv_general_dilated(
        x, K, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    Wout = (W + 2 * pad - kw) // stride + 1
    if Wout % k_out:
        pytest.skip("output width not divisible")
    got = unpack_w(
        packed_conv_w(
            pack_w(x, k_in), K, strides=(stride, stride), pads=(pad, pad),
            k_in=k_in, k_out=k_out, W=W,
        ),
        k_out,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_packed_conv3d_matches_xla():
    rng = np.random.default_rng(1)
    N, D, H, W, Ci, Co = 2, 4, 6, 32, 3, 4
    x = jnp.asarray(rng.standard_normal((N, D, H, W, Ci)), jnp.float32)
    K = jnp.asarray(rng.standard_normal((3, 3, 3, Ci, Co)), jnp.float32)
    ref = lax.conv_general_dilated(
        x, K, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    got = unpack_w(
        packed_conv_w(
            pack_w(x, 8), K, strides=(1, 1, 1), pads=(1, 1, 1),
            k_in=8, k_out=8, W=W,
        ),
        8,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_packed_deconv_matches_flax_convtranspose():
    """The zero-stuff + stride-1 packed conv construction reproduces
    flax ConvTranspose(k=3, s=2, padding=((1,2),(1,2)))."""
    from flax import linen as nn

    rng = np.random.default_rng(2)
    N, H, W, Ci, Co = 2, 4, 32, 6, 3
    x = jnp.asarray(rng.standard_normal((N, H, W, Ci)), jnp.float32)
    layer = nn.ConvTranspose(
        Co, (3, 3), strides=(2, 2), padding=((1, 2), (1, 2)), use_bias=False
    )
    vs = layer.init(jax.random.PRNGKey(0), x)
    ref = layer.apply(vs, x)
    K = vs["params"]["kernel"]

    xz = zero_stuff(x, axes=(1, 2))  # [N, 2H, 2W, C]
    got = unpack_w(
        packed_conv_w(
            pack_w(xz, 8), K, strides=(1, 1), pads=(1, 1),
            k_in=8, k_out=8, W=2 * W,
        ),
        8,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_pick_pack():
    assert pick_pack(640, 8) == 16
    assert pick_pack(640, 4) == 16   # capped
    assert pick_pack(80, 64) == 2
    assert pick_pack(20, 32) == 4
    assert pick_pack(7, 8) == 1      # nothing divides


def _reg_variables_and_input(pack, train, depth=4, G=4, seed=0):
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.models.reg import (
        Reg2D,
    )

    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((2 * depth, 16, 32, G)), jnp.float32)
    reg = Reg2D(base_channels=8, depth=depth, pack=pack)
    return reg, x


def test_reg2d_packed_matches_unpacked_eval():
    reg_u, x = _reg_variables_and_input(False, train=False)
    reg_p, _ = _reg_variables_and_input(True, train=False)
    vs = reg_u.init(jax.random.PRNGKey(0), x, train=False)
    ref = reg_u.apply(vs, x, train=False)
    got = reg_p.apply(vs, x, train=False)  # same variables, packed execution
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-4)


def test_reg2d_packed_matches_unpacked_train_stats():
    """Train mode: outputs AND updated BatchNorm running stats agree."""
    reg_u, x = _reg_variables_and_input(False, train=True)
    reg_p, _ = _reg_variables_and_input(True, train=True)
    vs = reg_u.init(jax.random.PRNGKey(1), x, train=True)
    ref, ref_vars = reg_u.apply(vs, x, train=True, mutable=["batch_stats"])
    got, got_vars = reg_p.apply(vs, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        ),
        ref_vars["batch_stats"],
        got_vars["batch_stats"],
    )


@pytest.mark.slow  # 36 s (r5 re-tier)
def test_reg2d_packed_gradients_match():
    """Backward through the packed kernel transform equals the unpacked
    gradient (the transform is a fixed linear scatter)."""
    reg_u, x = _reg_variables_and_input(False, train=True)
    reg_p, _ = _reg_variables_and_input(True, train=True)
    vs = reg_u.init(jax.random.PRNGKey(2), x, train=True)

    def loss(params, reg):
        out, _ = reg.apply(
            {**vs, "params": params}, x, train=True, mutable=["batch_stats"]
        )
        return jnp.sum(out**2)

    g_ref = jax.grad(loss)(vs["params"], reg_u)
    g_got = jax.grad(loss)(vs["params"], reg_p)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3
        ),
        g_ref,
        g_got,
    )


def test_fpn4_packed_matches_unpacked():
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.models.fpn import (
        FPN4,
    )

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 32, 64, 3)), jnp.float32)
    fu = FPN4(8, view_groups=2)
    fp = FPN4(8, view_groups=2, pack=True)
    vs = fu.init(jax.random.PRNGKey(0), x, train=False)
    for train in (False, True):
        ref, rv = fu.apply(vs, x, train=train, mutable=["batch_stats"])
        got, gv = fp.apply(vs, x, train=train, mutable=["batch_stats"])
        for a, b in zip(ref, got):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=3e-4
            )
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            ),
            rv["batch_stats"],
            gv["batch_stats"],
        )


@pytest.mark.slow
def test_full_model_prepacked_fused_cor_matches_gather():
    """Flagship kernel set (mxu_v3 + fuse_cor + fused_topdown + pack_conv)
    at a v3-eligible width (stage-4 W=256): the PREPACKED cost-volume
    handoff (aggregate pack_out -> Reg2D prepacked_k, kernel-native single
    transpose) must reproduce the plain gather/unfused model bit-for-bit
    from identical variables."""
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
        ndepths=(8, 8, 4, 4), warp_impl="mxu_v3", fused_topdown=True,
        pack_conv=True, remat=False,
    )
    batch = ge._example_batch(B=1, V=2, H=64, W=256)
    mp = MVS4Net(cfg)
    mu = MVS4Net(dataclasses.replace(
        cfg, pack_conv=False, warp_impl="gather", fused_topdown=False
    ))
    vs = mp.init(
        jax.random.PRNGKey(0), batch["imgs"], batch["proj_matrices"],
        batch["depth_values"], train=False,
    )
    got = mp.apply(
        vs, batch["imgs"], batch["proj_matrices"], batch["depth_values"],
        train=False,
    )
    ref = mu.apply(
        vs, batch["imgs"], batch["proj_matrices"], batch["depth_values"],
        train=False,
    )
    for s in range(1, 5):
        np.testing.assert_allclose(
            np.asarray(got[f"stage{s}"]["depth"]),
            np.asarray(ref[f"stage{s}"]["depth"]),
            atol=2e-2,
        )


@pytest.mark.slow  # 45 s; fpn4/reg2d packed parity stay fast (r5 re-tier)
def test_full_model_packed_matches_unpacked():
    """MVS4Net with pack_conv=True produces the same depths/confidence as
    the unpacked model from identical variables (eval mode)."""
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
    mp = MVS4Net(dataclasses.replace(cfg, pack_conv=True))
    vs = mu.init(
        jax.random.PRNGKey(0), batch["imgs"], batch["proj_matrices"],
        batch["depth_values"], train=False,
    )
    ref = mu.apply(
        vs, batch["imgs"], batch["proj_matrices"], batch["depth_values"],
        train=False,
    )
    got = mp.apply(
        vs, batch["imgs"], batch["proj_matrices"], batch["depth_values"],
        train=False,
    )
    for s in range(1, 5):
        # depths span ~[425, 935]; reduction-order drift through the
        # winner-take-all readout stays well under the hypothesis spacing
        np.testing.assert_allclose(
            np.asarray(got[f"stage{s}"]["depth"]),
            np.asarray(ref[f"stage{s}"]["depth"]),
            atol=2e-2,
        )
        np.testing.assert_allclose(
            np.asarray(got[f"stage{s}"]["photometric_confidence"]),
            np.asarray(ref[f"stage{s}"]["photometric_confidence"]),
            atol=2e-3,
        )


def test_packed_deconv3d_matches_flax_convtranspose():
    from flax import linen as nn

    from deep_reconstruction_with_epipolar_lines_mvster_tpu.models.layers import (
        _PackedDeconv2x3D,
    )

    rng = np.random.default_rng(5)
    N, D, H, W, Ci, Co = 1, 2, 4, 16, 6, 3
    x = jnp.asarray(rng.standard_normal((N, D, H, W, Ci)), jnp.float32)
    layer = nn.ConvTranspose(
        Co, (3, 3, 3), strides=(2, 2, 2), padding=((1, 2),) * 3, use_bias=False
    )
    vs = layer.init(jax.random.PRNGKey(0), x)
    ref = layer.apply(vs, x)

    packed = _PackedDeconv2x3D(Co, k_in=4, k_out=8)
    got = packed.apply(
        {"params": {"kernel": vs["params"]["kernel"]}}, pack_w(x, 4)
    )
    np.testing.assert_allclose(
        np.asarray(unpack_w(got, 8)), np.asarray(ref), atol=2e-5
    )


@pytest.mark.slow  # 29 s (r5 re-tier)
def test_reg3d_packed_matches_unpacked():
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.models.reg import (
        Reg3D,
    )

    rng = np.random.default_rng(6)
    D = 8
    x = jnp.asarray(rng.standard_normal((2 * D, 16, 32, 8)), jnp.float32)
    for ds in (3, 2, 1):
        ru = Reg3D(base_channels=8, down_size=ds, depth=D)
        rp = Reg3D(base_channels=8, down_size=ds, depth=D, pack=True)
        vs = ru.init(jax.random.PRNGKey(ds), x, train=False)
        ref = ru.apply(vs, x, train=False)
        got = rp.apply(vs, x, train=False)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=5e-4,
            err_msg=f"down_size={ds}",
        )
    # train-mode stats agree too (down_size 2 as representative)
    ru = Reg3D(base_channels=8, down_size=2, depth=D)
    rp = Reg3D(base_channels=8, down_size=2, depth=D, pack=True)
    vs = ru.init(jax.random.PRNGKey(9), x, train=True)
    ref, rv = ru.apply(vs, x, train=True, mutable=["batch_stats"])
    got, gv = rp.apply(vs, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        ),
        rv["batch_stats"], gv["batch_stats"],
    )


def test_depth_packed_mid_matches_plain():
    """Depth-in-channels execution of the stride-1 3x3x3 mid block
    (_DepthPackedConv3D) is math-exact vs the plain unfolded 3-D conv for
    every (folded width factor k, depth-packed width factor kp) combination,
    including train-mode BN statistics."""
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.models.layers import (
        ConvBnReLU3D,
    )
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.ops.packed_conv import (
        pack_w,
        unpack_w,
    )

    rng = np.random.default_rng(7)
    B, D, H, W, C, Co = 2, 4, 16, 40, 16, 16
    x = jnp.asarray(rng.standard_normal((B * D, H, W, C)), jnp.float32)
    ref = ConvBnReLU3D(Co, kernel=(3, 3, 3), depth=D)
    v = ref.init(jax.random.PRNGKey(0), x, train=False)
    y0 = ref.apply(v, x, train=False)
    _, st0 = ref.apply(v, x, train=True, mutable=["batch_stats"])
    for k, kp in [(1, 1), (1, 2), (4, 2), (4, 1), (2, 4)]:
        m = ConvBnReLU3D(
            Co, kernel=(3, 3, 3), depth=D, k_in=k, k_out=k, d_pack=kp
        )
        y1 = unpack_w(m.apply(v, pack_w(x, k), train=False), k)
        np.testing.assert_allclose(
            np.asarray(y1), np.asarray(y0), atol=1e-5,
            err_msg=f"k={k} kp={kp}",
        )
        _, st1 = m.apply(v, pack_w(x, k), train=True, mutable=["batch_stats"])
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            ),
            st0["batch_stats"], st1["batch_stats"],
        )


def test_mid_pack_plan_choices():
    """The static plan picks depth-in-channels exactly where its paper
    FLOPs beat width packing (D=4 full-res stages: every mid level; D=8
    stages: lvl1/2 only) and the chosen kp divides the level width."""
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.ops.packed_conv import (
        mid_pack_plan,
        pick_pack_levels,
    )

    for W, D, expect in ((640, 4, [2, 1, 1]), (160, 8, [1, 1, 0])):
        ks = pick_pack_levels(W, 8, 4)
        plan = [mid_pack_plan(W >> l, 8 << l, D, ks[l]) for l in (1, 2, 3)]
        assert plan == expect, (W, D, plan)
        for l, kp in zip((1, 2, 3), plan):
            assert kp == 0 or (W >> l) % kp == 0


def test_band_conv3x3_proto_matches_conv():
    """Round-6 go/no-go prototype (ops/pallas/reg_band_proto): banded-matmul
    small-C 3x3 conv, interpret-exact vs lax.conv incl. fused scale/bias/
    ReLU and zero lane padding. MEASURED NEGATIVE on chip at the bench
    conv0 shape (1.54 vs 0.99 ms packed, ~10 vs ~98 effective TF/s,
    _probe_r5o) — kept as the recorded answer to 'build the banded reg
    kernel': width packing IS the right reg formulation on this hardware."""
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.ops.pallas.reg_band_proto import (
        band_conv3x3,
    )

    rng = np.random.default_rng(3)
    N, H, W, Ci, Co = 2, 32, 96, 4, 8
    x = jnp.asarray(rng.standard_normal((N, H, W, Ci)), jnp.float32)
    K = jnp.asarray(rng.standard_normal((3, 3, Ci, Co)), jnp.float32) * 0.2
    scale = jnp.asarray(np.abs(rng.standard_normal(Co)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(Co).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, K, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    ref = np.maximum(
        np.asarray(ref) * np.asarray(scale) + np.asarray(bias), 0
    )
    x_cw = jnp.pad(jnp.swapaxes(x, 2, 3), ((0, 0),) * 3 + ((0, 128 - W),))
    got = band_conv3x3(x_cw, K, scale, bias, w_real=W, interpret=True)
    got = np.swapaxes(np.asarray(got), 2, 3)[:, :, :W]
    np.testing.assert_allclose(got, ref, atol=1e-5)
