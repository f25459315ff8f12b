"""Loader tests for the non-DTU datasets: Blender/BDS (active recipe,
scripts/train_bds8.sh), Tanks&Temples and ETH3D (unwired upstream, same
status here) — fixture-driven formula checks mirroring tests/test_data.py's
DTU coverage. Reference: datasets/blender4.py, datasets/tanks.py,
datasets/eth3d.py."""

import os

import numpy as np
import pytest

from deep_reconstruction_with_epipolar_lines_mvster_tpu.data import find_dataset_def
from deep_reconstruction_with_epipolar_lines_mvster_tpu.data.io import (
    save_pfm,
    write_cam_file,
    write_pair_file,
)


def _write_png(path, hw, rng, gray=False):
    from PIL import Image

    h, w = hw
    arr = rng.integers(0, 255, (h, w) if gray else (h, w, 3), dtype=np.uint8)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


# ---------------------------------------------------------------- blender ---

N_VIEWS, N_LIGHTS = 3, 3
BL_K = np.array([[1446.2, 0, 331.6], [0, 1441.6, 266.8], [0, 0, 1]], np.float32)


@pytest.fixture(scope="module")
def blender_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bds"))
    rng = np.random.default_rng(0)
    scan = "scene001"
    pairs = [(v, [s for s in range(N_VIEWS) if s != v]) for v in range(N_VIEWS)]
    write_pair_file(f"{root}/pair.txt", pairs)
    os.makedirs(f"{root}/Cameras_512x640", exist_ok=True)
    for v in range(N_VIEWS):
        E = np.eye(4, dtype=np.float32)
        E[0, 3] = 3.0 * v
        # full-res cams, 2 depth fields (blender4.py cam layout)
        write_cam_file(f"{root}/Cameras_512x640/{v:0>8}_cam.txt", E, BL_K, [425.0, 2.5])
        for light in range(N_LIGHTS):
            _write_png(
                f"{root}/Rectified_512x640/{scan}/rect_C{v:0>3}_L{light:0>2}.png",
                (512, 640), rng,
            )
        _write_png(
            f"{root}/Depths_512x640/{scan}/depth_mask_{v:0>3}.png",
            (512, 640), rng, gray=True,
        )
        save_pfm(
            f"{root}/Depths_512x640/{scan}/depth_map_{v:0>3}.pfm",
            rng.uniform(450, 900, (512, 640)).astype(np.float32),
        )
    with open(f"{root}/train.txt", "w") as f:
        f.write(scan + "\n")
    return root


class TestBlenderLoader:
    def _ds(self, root, mode="train", nlights="2:3", **kw):
        DS = find_dataset_def("blender4")
        return DS(root, f"{root}/train.txt", mode, N_VIEWS, 1.34,
                  Nlights=nlights, **kw)

    def test_sample_spec_and_stage_scaling(self, blender_root):
        ds = self._ds(blender_root, mode="val", nlights="0:3")
        s = ds[0]
        assert s["imgs"].shape == (N_VIEWS, 512, 640, 3)
        for st, (h, w) in zip(
            ("stage1", "stage2", "stage3", "stage4"),
            [(64, 80), (128, 160), (256, 320), (512, 640)],
        ):
            assert s["depth"][st].shape == (h, w)
            assert s["mask"][st].shape == (h, w)
            assert s["proj_matrices"][st].shape == (N_VIEWS, 2, 4, 4)
        # full-res cams: stage4 = base intrinsics, stage{3,2,1} = /2,/4,/8
        # (blender4.py:217-231 — opposite of DTU's quarter-res layout)
        K4 = s["proj_matrices"]["stage4"][0, 1, :2, :3]
        np.testing.assert_allclose(K4, BL_K[:2], rtol=1e-5)
        for st, div in (("stage3", 2), ("stage2", 4), ("stage1", 8)):
            np.testing.assert_allclose(
                s["proj_matrices"][st][0, 1, :2, :3], K4 / div, rtol=1e-6
            )
        # depth_values = [dmin, dmin + 192*itv*interval_scale]
        np.testing.assert_allclose(
            s["depth_values"], [425.0, 425.0 + 192 * 2.5 * 1.34], rtol=1e-6
        )

    def test_nlights_spec(self, blender_root):
        # "0:3" -> light 0 only, one meta per (scan, view pair)
        ds0 = self._ds(blender_root, nlights="0:3")
        assert len(ds0) == N_VIEWS
        assert all(m[1] == 0 for m in ds0.metas)
        # "-2:3" -> fixed light index 2
        dsf = self._ds(blender_root, nlights="-2:3")
        assert all(m[1] == 2 for m in dsf.metas)
        # train "2:3" -> 2 sampled lights per meta
        dst = self._ds(blender_root, nlights="2:3")
        assert len(dst) == N_VIEWS * 2
        assert all(0 <= m[1] < 3 for m in dst.metas)
        # val samples exactly 2 lights out of Nlights (blender4.py:57-60)
        dsv = self._ds(blender_root, mode="val", nlights="3:3")
        assert len(dsv) == N_VIEWS * 2

    def test_rt_scales_translation_and_depth(self, blender_root):
        base = self._ds(blender_root, mode="val", nlights="0:3")
        ds = self._ds(blender_root, nlights="0:3", rt=True, seed=5)
        b, s = base[0], ds[0]
        scale = s["depth_values"][0] / b["depth_values"][0]
        assert 0.8 <= scale <= 1.25 and scale != 1.0
        np.testing.assert_allclose(
            s["depth"]["stage4"].mean() / b["depth"]["stage4"].mean(),
            scale, rtol=1e-5,
        )
        # extrinsics translation scaled too (blender4.py rt, like dtu_yao4)
        t_ratio = (
            s["proj_matrices"]["stage4"][1, 0, 0, 3]
            / b["proj_matrices"]["stage4"][1, 0, 0, 3]
        )
        np.testing.assert_allclose(t_ratio, scale, rtol=1e-5)

    def test_mask_binarization(self, blender_root):
        s = self._ds(blender_root, mode="val", nlights="0:3")[0]
        m = s["mask"]["stage4"]
        assert set(np.unique(m)).issubset({0.0, 1.0})


# ------------------------------------------------------------------ tanks ---

TT_K = np.array([[1200.0, 0, 960.0], [0, 1200.0, 540.0], [0, 0, 1]], np.float32)


@pytest.fixture(scope="module")
def tanks_root(tmp_path_factory):
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.data.tanks import (
        INTERMEDIATE,
    )

    root = str(tmp_path_factory.mktemp("tt"))
    rng = np.random.default_rng(1)
    pairs = [(v, [s for s in range(3) if s != v]) for v in range(3)]
    for scan in INTERMEDIATE:
        os.makedirs(f"{root}/intermediate/{scan}", exist_ok=True)
        write_pair_file(f"{root}/intermediate/{scan}/pair.txt", pairs)
    scan = INTERMEDIATE[0]
    os.makedirs(f"{root}/intermediate/{scan}/cams", exist_ok=True)
    for v in range(3):
        E = np.eye(4, dtype=np.float32)
        E[0, 3] = 0.2 * v
        # eval cam layout: min interval num_depth max (4 fields)
        write_cam_file(
            f"{root}/intermediate/{scan}/cams/{v:08d}_cam.txt",
            E, TT_K, [2.5, 0.05, 192, 12.1],
        )
        _write_png(f"{root}/intermediate/{scan}/images/{v:08d}.jpg", (1080, 1920), rng)
    return root


def test_tanks_loader(tanks_root):
    DS = find_dataset_def("tanks")
    ds = DS(tanks_root, n_views=3, split="intermediate")
    assert len(ds) == 8 * 3  # 8 intermediate scans x 3 ref views
    s = ds[0]
    # 1080 -> 1024 vertical crop with principal-point shift (tanks.py:53-60)
    assert s["imgs"].shape == (3, 1024, 1920, 3)
    # stage1 = base * 0.125, then x2 per stage (tanks.py:96-110)
    K1 = s["proj_matrices"]["stage1"][0, 1, :2, :3]
    expect = TT_K[:2].copy()
    expect[1, 2] -= 28.0
    np.testing.assert_allclose(K1, expect * 0.125, rtol=1e-5)
    np.testing.assert_allclose(
        s["proj_matrices"]["stage4"][0, 1, :2, :3], expect, rtol=1e-5
    )
    # depth_values = [min, max(last field)]
    np.testing.assert_allclose(s["depth_values"], [2.5, 12.1], rtol=1e-6)
    assert s["filename"] == "Family/{}/00000000{}"


# ------------------------------------------------------------------ eth3d ---


@pytest.fixture(scope="module")
def eth3d_root(tmp_path_factory):
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.data.eth3d import (
        TEST_SCANS,
    )

    root = str(tmp_path_factory.mktemp("eth3d"))
    rng = np.random.default_rng(2)
    pairs = [(v, [s for s in range(3) if s != v]) for v in range(3)]
    for scan in TEST_SCANS:
        os.makedirs(f"{root}/{scan}", exist_ok=True)
        write_pair_file(f"{root}/{scan}/pair.txt", pairs)
    scan = TEST_SCANS[0]
    os.makedirs(f"{root}/{scan}/cams_1", exist_ok=True)
    K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1]], np.float32)
    for v in range(3):
        E = np.eye(4, dtype=np.float32)
        E[1, 3] = 0.1 * v
        # negative depth_min in view 0's cam (the ETH3D quirk, eth3d.py:50-52)
        dmin = -0.5 if v == 0 else 0.6
        write_cam_file(
            f"{root}/{scan}/cams_1/{v:08d}_cam.txt", E, K, [dmin, 0.01, 192, 8.0]
        )
        _write_png(f"{root}/{scan}/images/{v:08d}.jpg", (480, 640), rng)
    return root


def test_eth3d_loader(eth3d_root):
    pytest.importorskip("cv2")
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.data.eth3d import (
        TEST_SCANS,
    )

    DS = find_dataset_def("eth3d")
    ds = DS(eth3d_root, split="test", n_views=3, img_wh=(320, 256))
    assert len(ds) == len(TEST_SCANS) * 3
    s = ds[0]
    assert s["imgs"].shape == (3, 256, 320, 3)
    # intrinsics scaled by the resize factors (eth3d.py:57-63,90-92)
    K4 = s["proj_matrices"]["stage4"][0, 1]
    np.testing.assert_allclose(K4[0, 0], 500.0 * 320 / 640, rtol=1e-5)
    np.testing.assert_allclose(K4[1, 1], 500.0 * 256 / 480, rtol=1e-5)
    np.testing.assert_allclose(K4[0, 2], 320.0 * 320 / 640, rtol=1e-5)
    # negative depth_min clamped (eth3d.py:50-52)
    np.testing.assert_allclose(s["depth_values"], [1.0, 8.0], rtol=1e-6)
    assert s["filename"].startswith(TEST_SCANS[0] + "/{}/")
