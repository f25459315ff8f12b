"""Point-cloud metrics + headless viz helper tests."""

import numpy as np

from deep_reconstruction_with_epipolar_lines_mvster_tpu.eval.pcd_metrics import (
    accuracy_completeness,
)
from deep_reconstruction_with_epipolar_lines_mvster_tpu.eval.viz import (
    bbox_edge_points,
    bin_bbox_bounds,
    camera_glyph_points,
    crop_to_box,
    remove_statistical_outliers,
    voxel_downsample,
)


def test_identical_clouds_zero_error():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-100, 100, (5000, 3))
    m = accuracy_completeness(pts, pts, tau=2.0)
    assert m["accuracy"] == 0.0 and m["completeness"] == 0.0
    assert m["overall"] == 0.0 and m["f1"] == 1.0


def test_shifted_cloud_measures_offset():
    rng = np.random.default_rng(1)
    gt = rng.uniform(-100, 100, (20000, 3))
    pred = gt + np.array([1.0, 0.0, 0.0])
    m = accuracy_completeness(pred, gt, tau=2.0)
    # dense cloud: nearest neighbour is within ~1 unit of the shift
    assert 0.1 < m["accuracy"] <= 1.05
    assert 0.1 < m["completeness"] <= 1.05
    assert m["f1"] > 0.95


def test_incomplete_cloud_hurts_completeness_not_accuracy():
    rng = np.random.default_rng(2)
    gt = rng.uniform(0, 100, (20000, 3))
    pred = gt[gt[:, 0] < 50]  # half the scene missing
    m = accuracy_completeness(pred, gt, tau=2.0)
    assert m["accuracy"] < 1e-9
    assert m["completeness"] > m["accuracy"]
    assert m["recall@2.0"] < 1.0


def test_bin_bbox_presets():
    mn, mx, omn, omx = bin_bbox_bounds("path/to/overhead03_capture")
    assert mn[2] == 0.0
    np.testing.assert_allclose(mx[0] - mn[0], 570.0)
    assert (omn < mn).all() and (omx[:2] > mx[:2]).all()
    edges = bbox_edge_points(mn, mx)
    assert edges.shape[1] == 3 and len(edges) == 12 * 20


def test_camera_glyphs():
    E = np.eye(4)
    E[:3, 3] = [0, 0, -500]
    pts = camera_glyph_points([E])
    np.testing.assert_allclose(pts[0], [0, 0, 500], atol=1e-9)


def test_outlier_removal_and_voxel():
    rng = np.random.default_rng(3)
    cloud = rng.normal(0, 1.0, (2000, 3))
    outliers = rng.uniform(50, 60, (20, 3))
    cleaned = remove_statistical_outliers(np.vstack([cloud, outliers]))
    assert len(cleaned) <= 2000 + 5
    assert cleaned.max() < 50

    ds = voxel_downsample(cloud.astype(np.float32), 0.5)
    assert 0 < len(ds) < len(cloud)

    cropped = crop_to_box(cloud, [-1, -1, -1], [1, 1, 1])
    assert (np.abs(cropped) <= 1.0).all()
