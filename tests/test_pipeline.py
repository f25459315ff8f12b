"""Full eval pipeline on synthetic data: model forward -> artifact tree ->
consistency filter -> fused PLY (the reference's test_mvs4 --run_gendepth
--run_filter flow, end to end, no real data)."""

import pytest
import os

import numpy as np

import jax

from deep_reconstruction_with_epipolar_lines_mvster_tpu.config import ModelConfig
from deep_reconstruction_with_epipolar_lines_mvster_tpu.data.io import write_pair_file
from deep_reconstruction_with_epipolar_lines_mvster_tpu.data.synthetic import (
    SyntheticEvalDataset,
)
from deep_reconstruction_with_epipolar_lines_mvster_tpu.eval import (
    FusionConfig,
    filter_scene,
    generate_depth_maps,
)
from deep_reconstruction_with_epipolar_lines_mvster_tpu.models import MVS4Net


def test_gendepth_then_filter(tmp_path):
    cfg = ModelConfig(
        group_cor=True, group_cor_dim=(8, 8, 4, 4), inverse_depth=True, mono=True
    )
    model = MVS4Net(cfg)
    ds = SyntheticEvalDataset(V=3, H=64, W=64)
    s0 = ds[0]
    variables = model.init(
        jax.random.PRNGKey(0),
        s0["imgs"][None],
        {k: v[None] for k, v in s0["proj_matrices"].items()},
        s0["depth_values"][None],
        train=False,
    )

    outdir = str(tmp_path / "out")
    stats = generate_depth_maps(
        model, variables, ds, outdir, save_jpg=True, save_ply=False,
        num_workers=0, verbose=False,
    )
    assert stats["views"] == 3
    scene_dir = os.path.join(outdir, "scan1")
    for v in range(3):
        for rel in (
            f"images/{v:0>8}.jpg",
            f"depth_est/{v:0>8}.pfm",
            f"depth_est/{v:0>8}.png",
            f"depth_est/{v:0>8}stage_4.jpg",
            f"depth_est/{v:0>8}mono_4.jpg",
            f"confidence/{v:0>8}.pfm",
            f"cams/{v:0>8}_cam.txt",
        ):
            assert os.path.exists(os.path.join(scene_dir, rel)), rel

    # accumulated confidence-masked scene cloud (test_mvs4.py:519-529)
    combined = os.path.join(scene_dir, "combined.ply")
    assert os.path.exists(combined)
    with open(combined, "rb") as f:
        header = f.read(200).decode("ascii", "replace")
    assert "element vertex" in header

    # cams round-trip through the reference txt format
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.data.io import (
        read_cam_file,
    )

    K, E, dmin, ditv, fields = read_cam_file(
        os.path.join(scene_dir, "cams/00000000_cam.txt")
    )
    assert K.shape == (3, 3) and E.shape == (4, 4)
    assert len(fields) == 4

    # filtering runs on the generated artifacts (untrained model => garbage
    # depths; we only assert mechanics, not coverage)
    pair_path = str(tmp_path / "pair.txt")
    write_pair_file(pair_path, [(v, [s for s in range(3) if s != v]) for v in range(3)])
    fstats = filter_scene(
        scene_dir, pair_path, nview_filter=3,
        cfg=FusionConfig(photomask=0.0, geomask=1), verbose=False,
    )
    assert os.path.exists(os.path.join(scene_dir, "_fused_3Dpts.ply"))
    assert os.path.exists(os.path.join(scene_dir, "mask/00000000_photo.png"))
    assert np.isfinite(fstats["avg_filter_time_s"])


def test_eval_shape_bucketing_shares_one_compile(tmp_path):
    """Two scenes with different native resolutions through ONE shared
    forward with shape_bucket='max': a single shape bucket (= one XLA
    compile), artifacts cropped back to each scene's native shape
    (VERDICT round-1 item 6; reference shape snapping
    dataloader_eval.py:94-171)."""
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.data.io import read_pfm
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.eval.depthgen import (
        make_eval_forward,
    )

    cfg = ModelConfig(group_cor=True, group_cor_dim=(8, 8, 4, 4), inverse_depth=True)
    model = MVS4Net(cfg)
    ds_small = SyntheticEvalDataset(V=3, H=64, W=64, scan="scanA")
    ds_big = SyntheticEvalDataset(V=3, H=128, W=128, scan="scanB")
    s0 = ds_small[0]
    variables = model.init(
        jax.random.PRNGKey(0), s0["imgs"][None],
        {k: v[None] for k, v in s0["proj_matrices"].items()},
        s0["depth_values"][None], train=False,
    )
    forward = make_eval_forward(model)
    outdir = str(tmp_path / "out")
    shapes = set()
    for ds in (ds_small, ds_big):
        stats = generate_depth_maps(
            model, variables, ds, outdir, num_workers=0, verbose=False,
            forward=forward, shape_bucket="max", max_hw=(128, 128),
        )
        shapes.update(map(tuple, stats["shapes"]))
    assert len(shapes) == 1, shapes  # both scenes share the (128,128) bucket

    d_small, _ = read_pfm(os.path.join(outdir, "scanA/depth_est/00000000.pfm"))
    d_big, _ = read_pfm(os.path.join(outdir, "scanB/depth_est/00000000.pfm"))
    assert d_small.shape == (64, 64)
    assert d_big.shape == (128, 128)

    # outputs in the valid region are finite and positive (padding is an
    # approximation, not bit-exact: the FPN top-down and hypothesis windows
    # use align-corners resizes whose mapping depends on the global extent —
    # documented in eval/depthgen.py; with random weights the argmax readout
    # additionally tie-flips, so no numeric agreement is asserted here)
    for d in (d_small, d_big):
        assert np.isfinite(d).all() and (d > 0).all()


@pytest.mark.slow  # 46 s; space sharding covered fast in test_spatial_sharding (r5 re-tier)
def test_make_eval_forward_space_mesh_matches():
    """make_eval_forward with a (data=1, space=2) mesh (the --space eval-CLI
    path) returns the same artifact dict as the single-device forward at a
    shape where stage4 genuinely row-shards."""
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.eval.depthgen import (
        make_eval_forward,
    )
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.parallel import (
        make_mesh,
    )

    cfg = ModelConfig(group_cor=True, group_cor_dim=(8, 8, 4, 4),
                      inverse_depth=True, remat=False)
    model = MVS4Net(cfg)
    ds = SyntheticEvalDataset(V=2, H=256, W=256, scan="scanS")
    s0 = ds[0]
    args = (
        s0["imgs"][None],
        {k: v[None] for k, v in s0["proj_matrices"].items()},
        s0["depth_values"][None],
    )
    variables = model.init(jax.random.PRNGKey(0), *args, train=False)

    ref = make_eval_forward(model)(variables, *args)
    mesh = make_mesh(jax.devices()[:2], space=2)
    got = make_eval_forward(model, mesh)(variables, *args)

    d_ref, d_got = np.asarray(ref["depth"]), np.asarray(got["depth"])
    agree = np.isclose(d_got, d_ref, rtol=1e-4, atol=1e-2).mean()
    assert agree > 0.999, agree
    np.testing.assert_allclose(
        np.asarray(got["confidence"]), np.asarray(ref["confidence"]),
        rtol=1e-3, atol=1e-3,
    )
    for a, b in zip(got["stage_depths"], ref["stage_depths"]):
        assert np.isclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-2).mean() > 0.999
