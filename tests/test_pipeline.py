"""Full eval pipeline on synthetic data: model forward -> artifact tree ->
consistency filter -> fused PLY (the reference's test_mvs4 --run_gendepth
--run_filter flow, end to end, no real data)."""

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
