"""Scene-level fusion oracle: a literal numpy transcription of the
reference's whole filter/fusion pipeline (test_mvs4.py:612-894 —
reproject_with_depth, check_geometric_consistency, filter_depth) run over a
reference-layout artifact tree, asserted bit-for-bit against
eval/scene_filter.filter_scene's written artifacts (mask PNGs + fused PLY).

This closes the last unproven link in the eval chain: the per-op cv2 oracle
(test_fusion.py) proves reproject; this proves the masks, the fused depth,
the vertex accumulation and the artifact IO end to end.
"""

import os

import numpy as np
import pytest

from deep_reconstruction_with_epipolar_lines_mvster_tpu.data.io import (
    read_cam_file,
    read_image,
    read_pair_file,
    read_pfm,
    save_image_u8,
    save_pfm,
    write_cam_file,
    write_pair_file,
)
from deep_reconstruction_with_epipolar_lines_mvster_tpu.data.synthetic import (
    make_plane_scene,
)
from deep_reconstruction_with_epipolar_lines_mvster_tpu.eval import (
    FusionConfig,
    filter_scene,
    read_ply,
)

# ----------------------------------------------------------------- oracle ---
# Literal numpy transcriptions of the reference functions. Variable naming
# and op order deliberately follow test_mvs4.py so the mapping is auditable.


def _bilinear_zeros(img, x, y):
    """cv2.remap(INTER_LINEAR, BORDER_CONSTANT=0) semantics in pure numpy
    (exact math, no cv2 fixed-point quantization): 4-tap bilinear where
    out-of-bounds taps contribute 0 (test_mvs4.py:632)."""
    h, w = img.shape
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    lx = (x - x0).astype(np.float32)
    ly = (y - y0).astype(np.float32)
    out = np.zeros_like(x, dtype=np.float32)
    for dy, wy in ((0, 1.0 - ly), (1, ly)):
        for dx, wx in ((0, 1.0 - lx), (1, lx)):
            xi, yi = x0 + dx, y0 + dy
            valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            tap = np.where(
                valid, img[np.clip(yi, 0, h - 1), np.clip(xi, 0, w - 1)], 0.0
            )
            out += (wx * wy) * tap
    return out


def _reproject_with_depth(depth_ref, K_ref, E_ref, depth_src, K_src, E_src):
    """test_mvs4.py:612-649."""
    width, height = depth_ref.shape[1], depth_ref.shape[0]
    x_ref, y_ref = np.meshgrid(np.arange(0, width), np.arange(0, height))
    x_ref, y_ref = x_ref.reshape([-1]), y_ref.reshape([-1])
    xyz_ref = np.matmul(
        np.linalg.inv(K_ref),
        np.vstack((x_ref, y_ref, np.ones_like(x_ref))) * depth_ref.reshape([-1]),
    )
    xyz_src = np.matmul(
        np.matmul(E_src, np.linalg.inv(E_ref)),
        np.vstack((xyz_ref, np.ones_like(x_ref))),
    )[:3]
    K_xyz_src = np.matmul(K_src, xyz_src)
    xy_src = K_xyz_src[:2] / K_xyz_src[2:3]

    x_src = xy_src[0].reshape([height, width]).astype(np.float32)
    y_src = xy_src[1].reshape([height, width]).astype(np.float32)
    sampled_depth_src = _bilinear_zeros(depth_src, x_src, y_src)

    xyz_src2 = np.matmul(
        np.linalg.inv(K_src),
        np.vstack((xy_src, np.ones_like(x_ref))) * sampled_depth_src.reshape([-1]),
    )
    xyz_reprojected = np.matmul(
        np.matmul(E_ref, np.linalg.inv(E_src)),
        np.vstack((xyz_src2, np.ones_like(x_ref))),
    )[:3]
    depth_reprojected = xyz_reprojected[2].reshape([height, width]).astype(np.float32)
    K_xyz_reprojected = np.matmul(K_ref, xyz_reprojected)
    xy_reprojected = K_xyz_reprojected[:2] / K_xyz_reprojected[2:3]
    x_reprojected = xy_reprojected[0].reshape([height, width]).astype(np.float32)
    y_reprojected = xy_reprojected[1].reshape([height, width]).astype(np.float32)
    return depth_reprojected, x_reprojected, y_reprojected


def _check_geometric_consistency(
    depth_ref, K_ref, E_ref, depth_src, K_src, E_src, *, pix_th, depth_th
):
    """test_mvs4.py:653-670."""
    width, height = depth_ref.shape[1], depth_ref.shape[0]
    x_ref, y_ref = np.meshgrid(np.arange(0, width), np.arange(0, height))
    depth_reprojected, x2d, y2d = _reproject_with_depth(
        depth_ref, K_ref, E_ref, depth_src, K_src, E_src
    )
    dist = np.sqrt((x2d - x_ref) ** 2 + (y2d - y_ref) ** 2)
    relative_depth_diff = np.abs(depth_reprojected - depth_ref) / depth_ref
    mask = np.logical_and(dist < pix_th, relative_depth_diff < depth_th)
    depth_reprojected = depth_reprojected.copy()
    depth_reprojected[~mask] = 0
    return mask, depth_reprojected


def _depth2pts_np(depth_map, K, E):
    """test_mvs4.py:206-229 (pixel-center grid)."""
    h, w = depth_map.shape
    xs = np.linspace(0.5, w - 0.5, w)
    ys = np.linspace(0.5, h - 0.5, h)
    gx, gy = np.meshgrid(xs, ys)
    grid = np.concatenate(
        [gx.reshape(1, -1), gy.reshape(1, -1), np.ones((1, h * w), np.float32)], 0
    )
    uv = np.matmul(np.linalg.inv(K), grid)
    cam_points = uv * depth_map.reshape(1, -1)
    R, t = E[:3, :3], E[:3, 3:4]
    return np.matmul(np.linalg.inv(R), cam_points - t).transpose()


def _oracle_filter_scene(scene_folder, pair_file, *, nview_filter, cfg):
    """test_mvs4.py:674-846 core loop (minus plotting/printing)."""
    pair_data = read_pair_file(pair_file)
    per_view, vertices, colors = {}, [], []
    for ref_view, src_views in pair_data:
        src_views = src_views[: nview_filter - 1]
        K_ref, E_ref, *_ = read_cam_file(
            os.path.join(scene_folder, f"cams/{ref_view:0>8}_cam.txt")
        )
        ref_img = read_image(os.path.join(scene_folder, f"images/{ref_view:0>8}.jpg"))
        ref_depth = read_pfm(
            os.path.join(scene_folder, f"depth_est/{ref_view:0>8}.pfm")
        )[0]
        conf = read_pfm(
            os.path.join(scene_folder, f"confidence/{ref_view:0>8}.pfm")
        )[0]
        photo_mask = conf > cfg.photomask

        all_src_depths = []
        geo_mask_sum = 0
        for src_view in src_views:
            K_s, E_s, *_ = read_cam_file(
                os.path.join(scene_folder, f"cams/{src_view:0>8}_cam.txt")
            )
            d_s = read_pfm(
                os.path.join(scene_folder, f"depth_est/{src_view:0>8}.pfm")
            )[0]
            m, d_rep = _check_geometric_consistency(
                ref_depth, K_ref, E_ref, d_s, K_s, E_s,
                pix_th=cfg.condmask_pixel, depth_th=cfg.condmask_depth,
            )
            geo_mask_sum = geo_mask_sum + m.astype(np.int32)
            all_src_depths.append(d_rep)

        depth_est_averaged = (sum(all_src_depths) + ref_depth) / (geo_mask_sum + 1)
        geo_mask = geo_mask_sum >= cfg.geomask
        final_mask = np.logical_and(photo_mask, geo_mask)
        per_view[ref_view] = {
            "photo_mask": photo_mask,
            "geo_mask": geo_mask,
            "final_mask": final_mask,
            "fused_depth": depth_est_averaged.astype(np.float32),
        }
        xyz_world = _depth2pts_np(depth_est_averaged.astype(np.float32), K_ref, E_ref)
        vertices.append(xyz_world[final_mask.flatten()])
        colors.append((ref_img[final_mask] * 255).astype(np.uint8))
    return per_view, np.concatenate(vertices, 0), np.concatenate(colors, 0)


# ------------------------------------------------------------------ test ----


@pytest.fixture(scope="module")
def artifact_tree(tmp_path_factory):
    """Reference-layout artifact tree with deliberate structure: one src view
    has a corrupted half (geo rejections, wide margin vs the 1% threshold)
    and confidence has a low-confidence band (photo rejections)."""
    tmp = tmp_path_factory.mktemp("oracle_scene")
    scene = make_plane_scene(V=4, H=64, W=64, baseline=8.0)
    folder = str(tmp / "scan1")
    V, H, W = 4, 64, 64
    depths = scene["view_depths"].copy()
    # corrupt the left half of view 2's depth: 30% scale, rejected by the
    # 1% relative-depth criterion with a huge margin (no borderline pixels)
    depths[2][:, : W // 2] *= 1.3
    for v in range(V):
        for sub in ("depth_est", "confidence", "cams", "images"):
            os.makedirs(f"{folder}/{sub}", exist_ok=True)
        save_pfm(f"{folder}/depth_est/{v:0>8}.pfm", depths[v].astype(np.float32))
        conf = np.full((H, W), 0.9, np.float32)
        conf[3 * H // 4 :] = 0.05  # photomask=0.3: wide margins both sides
        save_pfm(f"{folder}/confidence/{v:0>8}.pfm", conf)
        write_cam_file(
            f"{folder}/cams/{v:0>8}_cam.txt",
            scene["extrinsics"][v].astype(np.float32),
            scene["intrinsics"].astype(np.float32),
            [425.0, 2.5],
        )
        save_image_u8(f"{folder}/images/{v:0>8}.jpg", scene["imgs"][v])
    pair_path = str(tmp / "pair.txt")
    write_pair_file(
        pair_path, [(v, [s for s in range(V) if s != v]) for v in range(V)]
    )
    return folder, pair_path


CFG = FusionConfig(photomask=0.3, geomask=2, condmask_pixel=1.0, condmask_depth=0.01)


def test_scene_filter_matches_reference_oracle(artifact_tree):
    folder, pair_path = artifact_tree
    oracle, o_xyz, o_rgb = _oracle_filter_scene(
        folder, pair_path, nview_filter=4, cfg=CFG
    )

    stats = filter_scene(
        folder, pair_path, nview_filter=4, cfg=CFG, verbose=False, debug_bits=2
    )

    from PIL import Image

    n_total = n_diff = 0
    for ref_view, exp in oracle.items():
        for name in ("photo", "geo", "final"):
            got = (
                np.array(
                    Image.open(f"{folder}/mask/{ref_view:0>8}_{name}.png")
                )
                > 127
            )
            # photo masks threshold identical inputs -> bit-exact; geo/final
            # may flip on f32-margin pixels only (none by construction)
            n_total += got.size
            n_diff += int((got != exp[f"{name}_mask"]).sum())
            np.testing.assert_array_equal(
                got, exp[f"{name}_mask"], err_msg=f"view {ref_view} {name} mask"
            )
        fused_got = np.load(f"{folder}/debug/{ref_view:0>8}_fused_depth.npy")
        np.testing.assert_allclose(
            fused_got, exp["fused_depth"], rtol=1e-4, atol=5e-3,
            err_msg=f"view {ref_view} fused depth",
        )
    assert n_diff == 0 and n_total > 0

    # rejections actually exercised: the corrupted view costs geo coverage
    assert 0.05 < stats["final_coverage"] < 0.95

    # the fused PLY vertex set (positions, colors, ORDER) matches the oracle's
    xyz, rgb = read_ply(f"{folder}/_fused_3Dpts.ply")
    assert xyz.shape == o_xyz.shape
    np.testing.assert_allclose(xyz, o_xyz.astype(np.float32), rtol=1e-4, atol=5e-3)
    np.testing.assert_array_equal(rgb, o_rgb)


def test_oracle_rejects_corruption_and_photomask(artifact_tree):
    """Sanity on the oracle itself: the corrupted half and the low-confidence
    band are rejected, the clean interior survives."""
    folder, pair_path = artifact_tree
    oracle, _, _ = _oracle_filter_scene(folder, pair_path, nview_filter=4, cfg=CFG)
    v0 = oracle[0]
    # low-confidence band fails photo
    assert not v0["photo_mask"][3 * 64 // 4 :].any()
    assert v0["photo_mask"][: 3 * 64 // 4].all()
    # interior of the clean region passes geo for view 0 (2 clean src views)
    assert v0["geo_mask"][8:-8, 8:-8].mean() > 0.5
    # view 2 as ref: its own corrupted-depth half must fail geo everywhere
    assert oracle[2]["geo_mask"][8:-8, 4 : 64 // 2 - 4].mean() < 0.05
