"""Fusion / consistency-filter tests: cv2 oracle parity + closed-loop plane
scene + PLY round trip + full depthgen->filter pipeline on artifacts."""

import os

import numpy as np
import pytest

from deep_reconstruction_with_epipolar_lines_mvster_tpu.data.synthetic import (
    make_plane_scene,
)
from deep_reconstruction_with_epipolar_lines_mvster_tpu.eval import (
    FusionConfig,
    backproject_to_world,
    filter_ref_view,
    filter_scene,
    read_ply,
    reproject,
    write_ply,
)


@pytest.fixture(scope="module")
def scene():
    return make_plane_scene(V=4, H=64, W=64, baseline=8.0)


def _cams(scene, v):
    K = scene["intrinsics"]
    E = scene["extrinsics"][v]
    return K.astype(np.float32), E.astype(np.float32)


class TestReproject:
    def test_vs_cv2_oracle(self, scene):
        """jnp reproject vs a numpy+cv2 implementation of the reference
        formulas (test_mvs4.py:612-649)."""
        cv2 = pytest.importorskip("cv2")
        d_ref = scene["view_depths"][0]
        d_src = scene["view_depths"][1]
        K_ref, E_ref = _cams(scene, 0)
        K_src, E_src = _cams(scene, 1)

        h, w = d_ref.shape
        x_ref, y_ref = np.meshgrid(np.arange(w), np.arange(h))
        x_ref, y_ref = x_ref.reshape(-1), y_ref.reshape(-1)
        xyz_ref = np.linalg.inv(K_ref) @ (
            np.vstack((x_ref, y_ref, np.ones_like(x_ref))) * d_ref.reshape(-1)
        )
        xyz_src = (E_src @ np.linalg.inv(E_ref)) @ np.vstack(
            (xyz_ref, np.ones_like(x_ref))
        )
        k_xyz = K_src @ xyz_src[:3]
        xy_src = k_xyz[:2] / k_xyz[2:3]
        x_src = xy_src[0].reshape(h, w).astype(np.float32)
        y_src = xy_src[1].reshape(h, w).astype(np.float32)
        sampled = cv2.remap(d_src, x_src, y_src, interpolation=cv2.INTER_LINEAR)
        xyz_src2 = np.linalg.inv(K_src) @ (
            np.vstack((xy_src, np.ones_like(x_ref))) * sampled.reshape(-1)
        )
        xyz_rep = (E_ref @ np.linalg.inv(E_src)) @ np.vstack(
            (xyz_src2, np.ones_like(x_ref))
        )
        d_expect = xyz_rep[2].reshape(h, w).astype(np.float32)
        k_rep = K_ref @ xyz_rep[:3]
        x_expect = (k_rep[0] / k_rep[2]).reshape(h, w)
        y_expect = (k_rep[1] / k_rep[2]).reshape(h, w)

        d_got, x_got, y_got = reproject(d_ref, K_ref, E_ref, d_src, K_src, E_src)
        # compare away from borders (cv2 border handling differs at edges)
        sl = np.s_[4:-4, 4:-4]
        np.testing.assert_allclose(np.asarray(d_got)[sl], d_expect[sl], rtol=2e-3)
        np.testing.assert_allclose(np.asarray(x_got)[sl], x_expect[sl], atol=0.1)
        np.testing.assert_allclose(np.asarray(y_got)[sl], y_expect[sl], atol=0.1)

    def test_consistent_depths_pass(self, scene):
        """GT depths of the same plane are geometrically consistent: the
        filter should accept nearly every interior pixel."""
        out = filter_ref_view(
            scene["view_depths"][0],
            np.ones_like(scene["view_depths"][0]),
            *_cams(scene, 0),
            [scene["view_depths"][v] for v in (1, 2, 3)],
            [_cams(scene, v)[0] for v in (1, 2, 3)],
            [_cams(scene, v)[1] for v in (1, 2, 3)],
            FusionConfig(photomask=0.5, geomask=2),
        )
        interior = out["final_mask"][8:-8, 8:-8]
        assert interior.mean() > 0.95
        # fused depth stays close to GT where accepted
        err = np.abs(out["fused_depth"] - scene["view_depths"][0])
        assert err[out["final_mask"]].max() < 1.0

    def test_inconsistent_depths_rejected(self, scene):
        """Corrupt the source depths: the geometric mask must collapse."""
        bad = [scene["view_depths"][v] * 1.5 for v in (1, 2, 3)]
        out = filter_ref_view(
            scene["view_depths"][0],
            np.ones_like(scene["view_depths"][0]),
            *_cams(scene, 0),
            bad,
            [_cams(scene, v)[0] for v in (1, 2, 3)],
            [_cams(scene, v)[1] for v in (1, 2, 3)],
            FusionConfig(photomask=0.5, geomask=2),
        )
        assert out["geo_mask"].mean() < 0.05

    def test_photomask_thresholds(self, scene):
        conf = np.zeros_like(scene["view_depths"][0])
        conf[: conf.shape[0] // 2] = 0.9
        out = filter_ref_view(
            scene["view_depths"][0], conf, *_cams(scene, 0),
            [scene["view_depths"][1]], [_cams(scene, 1)[0]], [_cams(scene, 1)[1]],
            FusionConfig(photomask=0.5, geomask=1),
        )
        assert out["photo_mask"][: conf.shape[0] // 2].all()
        assert not out["photo_mask"][conf.shape[0] // 2 :].any()


def test_backproject_points_on_plane(scene):
    """Back-projected GT depth must land on Z = z0 + gx·X + gy·Y."""
    K, E = _cams(scene, 1)
    pts = np.asarray(
        backproject_to_world(scene["view_depths"][1], K, E)
    ).reshape(-1, 3)
    resid = pts[:, 2] - (600.0 + 0.15 * pts[:, 0] - 0.1 * pts[:, 1])
    assert np.abs(resid).max() < 0.5


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    xyz = rng.standard_normal((100, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, (100, 3), dtype=np.uint8)
    p = str(tmp_path / "cloud.ply")
    write_ply(p, xyz, rgb)
    xyz2, rgb2 = read_ply(p)
    np.testing.assert_array_equal(xyz2, xyz)
    np.testing.assert_array_equal(rgb2, rgb)


def test_filter_scene_on_artifacts(tmp_path, scene):
    """Write a reference-layout artifact tree from GT depths, run the scene
    filter, verify masks + fused cloud."""
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.data.io import (
        save_image_u8,
        save_pfm,
        write_cam_file,
        write_pair_file,
    )

    folder = str(tmp_path / "scan1")
    V = scene["view_depths"].shape[0]
    for v in range(V):
        os.makedirs(f"{folder}/depth_est", exist_ok=True)
        os.makedirs(f"{folder}/confidence", exist_ok=True)
        os.makedirs(f"{folder}/cams", exist_ok=True)
        os.makedirs(f"{folder}/images", exist_ok=True)
        save_pfm(f"{folder}/depth_est/{v:0>8}.pfm", scene["view_depths"][v])
        save_pfm(
            f"{folder}/confidence/{v:0>8}.pfm",
            np.full_like(scene["view_depths"][v], 0.9),
        )
        K, E = _cams(scene, v)
        write_cam_file(f"{folder}/cams/{v:0>8}_cam.txt", E, K, [425.0, 2.5])
        save_image_u8(f"{folder}/images/{v:0>8}.jpg", scene["imgs"][v])

    pair_path = str(tmp_path / "pair.txt")
    write_pair_file(
        pair_path, [(v, [s for s in range(V) if s != v]) for v in range(V)]
    )

    stats = filter_scene(
        folder, pair_path, nview_filter=4,
        cfg=FusionConfig(photomask=0.5, geomask=2), verbose=False,
    )
    assert stats["final_coverage"] > 0.9
    assert stats["n_points"] > 0
    assert os.path.exists(f"{folder}/_fused_3Dpts.ply")
    assert os.path.exists(f"{folder}/mask/00000000_final.png")
    xyz, rgb = read_ply(f"{folder}/_fused_3Dpts.ply")
    resid = xyz[:, 2] - (600.0 + 0.15 * xyz[:, 0] - 0.1 * xyz[:, 1])
    assert np.abs(resid).mean() < 0.5
