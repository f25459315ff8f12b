"""Data-layer tests: format IO round trips, loader sample-spec parity with the
reference formulas, batching/sharding."""

import os

import numpy as np
import pytest

from deep_reconstruction_with_epipolar_lines_mvster_tpu.data import (
    DataLoader,
    collate,
    find_dataset_def,
)
from deep_reconstruction_with_epipolar_lines_mvster_tpu.data.io import (
    read_cam_file,
    read_pair_file,
    read_pfm,
    save_pfm,
    write_cam_file,
    write_pair_file,
)
from deep_reconstruction_with_epipolar_lines_mvster_tpu.data.eval_loader import (
    rescale_crop_image,
)


def test_pfm_roundtrip(tmp_path):
    depth = np.random.default_rng(0).uniform(400, 900, (48, 64)).astype(np.float32)
    p = str(tmp_path / "d.pfm")
    save_pfm(p, depth)
    back, scale = read_pfm(p)
    np.testing.assert_array_equal(back, depth)
    # the reference reader (datasets/data_io.py:6-41) parses our writer output
    assert scale == 1.0


def test_cam_file_roundtrip(tmp_path):
    E = np.eye(4, dtype=np.float32)
    E[:3, 3] = [1, 2, 3]
    K = np.array([[361.54, 0, 82.9], [0, 360.4, 66.7], [0, 0, 1]], dtype=np.float32)
    p = str(tmp_path / "00000000_cam.txt")
    write_cam_file(p, E, K, [425.0, 2.5])
    Ki, Ei, dmin, ditv, fields = read_cam_file(p)
    np.testing.assert_allclose(Ei, E, atol=1e-5)
    np.testing.assert_allclose(Ki, K, atol=1e-4)
    assert (dmin, ditv) == (425.0, 2.5)
    assert fields == (425.0, 2.5)


def test_pair_file_roundtrip(tmp_path):
    pairs = [(0, [1, 2, 3]), (1, [0, 2]), (2, [0, 1, 3, 4])]
    p = str(tmp_path / "pair.txt")
    write_pair_file(p, pairs)
    assert read_pair_file(p) == pairs


# ------------------------------------------------------------------ fixtures

def _write_png(path, hw, rng, gray=False):
    from PIL import Image

    h, w = hw
    arr = rng.integers(0, 255, (h, w) if gray else (h, w, 3), dtype=np.uint8)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


def _make_dtu_fixture(root, n_views=4):
    rng = np.random.default_rng(0)
    scan = "scan1"
    os.makedirs(f"{root}/Cameras/train", exist_ok=True)
    pairs = [(v, [s for s in range(n_views) if s != v][:3]) for v in range(n_views)]
    write_pair_file(f"{root}/Cameras/pair.txt", pairs)
    K = np.array([[361.5, 0, 82.9], [0, 360.4, 66.7], [0, 0, 1]], dtype=np.float32)
    for v in range(n_views):
        E = np.eye(4, dtype=np.float32)
        E[0, 3] = 4.0 * v
        write_cam_file(f"{root}/Cameras/train/{v:0>8}_cam.txt", E, K, [425.0, 2.5])
        for light in range(7):
            _write_png(
                f"{root}/Rectified/{scan}_train/rect_{v + 1:0>3}_{light}_r5000.png",
                (512, 640), rng,
            )
        _write_png(
            f"{root}/Depths_raw/{scan}/depth_visual_{v:0>4}.png", (1200, 1600), rng,
            gray=True,
        )
        depth_hr = rng.uniform(450, 900, (1200, 1600)).astype(np.float32)
        os.makedirs(f"{root}/Depths_raw/{scan}", exist_ok=True)
        save_pfm(f"{root}/Depths_raw/{scan}/depth_map_{v:0>4}.pfm", depth_hr)
    with open(f"{root}/train.txt", "w") as f:
        f.write(scan + "\n")
    return root


@pytest.fixture(scope="module")
def dtu_root(tmp_path_factory):
    return _make_dtu_fixture(str(tmp_path_factory.mktemp("dtu")))


class TestDTULoader:
    def test_sample_spec(self, dtu_root):
        DS = find_dataset_def("dtu_yao4")
        ds = DS(dtu_root, f"{dtu_root}/train.txt", "train", 3, 1.0625)
        assert len(ds) == 4 * 7  # views x lights
        s = ds[0]
        assert s["imgs"].shape == (3, 512, 640, 3)
        assert s["imgs"].dtype == np.float32
        for st, (h, w) in zip(
            ("stage1", "stage2", "stage3", "stage4"),
            [(64, 80), (128, 160), (256, 320), (512, 640)],
        ):
            assert s["depth"][st].shape == (h, w)
            assert s["mask"][st].shape == (h, w)
            assert s["proj_matrices"][st].shape == (3, 2, 4, 4)
        # depth_values = [dmin, dmin + 192*itv*interval_scale]
        np.testing.assert_allclose(
            s["depth_values"], [425.0, 425.0 + 192 * 2.5 * 1.0625], rtol=1e-6
        )

    def test_stage_intrinsics_scaling(self, dtu_root):
        """DTU cams are quarter-res: stage2 = base, stage1 = /2, stage3 = x2,
        stage4 = x4 (reference dtu_yao4.py:212-225)."""
        DS = find_dataset_def("dtu_yao4")
        ds = DS(dtu_root, f"{dtu_root}/train.txt", "val", 3, 1.0)
        s = ds[0]
        K2 = s["proj_matrices"]["stage2"][0, 1, :2, :]
        np.testing.assert_allclose(
            s["proj_matrices"]["stage1"][0, 1, :2, :], K2 / 2, rtol=1e-6
        )
        np.testing.assert_allclose(
            s["proj_matrices"]["stage3"][0, 1, :2, :], K2 * 2, rtol=1e-6
        )
        np.testing.assert_allclose(
            s["proj_matrices"]["stage4"][0, 1, :2, :], K2 * 4, rtol=1e-6
        )
        # extrinsics identical across stages
        np.testing.assert_array_equal(
            s["proj_matrices"]["stage1"][:, 0], s["proj_matrices"]["stage4"][:, 0]
        )

    def test_rt_scales_translation_and_depth(self, dtu_root):
        DS = find_dataset_def("dtu_yao4")
        ds = DS(dtu_root, f"{dtu_root}/train.txt", "train", 3, 1.0, rt=True, seed=7)
        base = DS(dtu_root, f"{dtu_root}/train.txt", "val", 3, 1.0)
        s = ds[0]
        b = base[0]
        scale = s["depth_values"][0] / b["depth_values"][0]
        assert 0.8 <= scale <= 1.25
        # GT depth scaled consistently with depth_values
        ratio = s["depth"]["stage4"].mean() / b["depth"]["stage4"].mean()
        np.testing.assert_allclose(ratio, scale, rtol=1e-5)

    def test_augmentation_deterministic_across_num_workers(self, dtu_root):
        """Per-sample RNG: same seed => identical batches for num_workers=0
        and num_workers=4 (thread-pool __getitem__ must not perturb the
        augmentation stream), and a different epoch => different stream."""
        DS = find_dataset_def("dtu_yao4")

        def batches(num_workers, epoch=0):
            ds = DS(dtu_root, f"{dtu_root}/train.txt", "train", 3, 1.0, rt=True, seed=3)
            dl = DataLoader(ds, 4, shuffle=True, seed=3, num_workers=num_workers)
            dl.set_epoch(epoch)
            return list(dl)

        serial, threaded = batches(0), batches(4)
        assert len(serial) == len(threaded)
        for a, b in zip(serial, threaded):
            np.testing.assert_array_equal(a["imgs"], b["imgs"])
            np.testing.assert_array_equal(a["depth_values"], b["depth_values"])
        other_epoch = batches(0, epoch=1)
        assert any(
            not np.array_equal(a["imgs"], c["imgs"])
            for a, c in zip(serial, other_epoch)
        )


def test_rescale_crop_image_formulas():
    """Pure-function parity with read_rescale_crop_img
    (dataloader_eval.py:94-171): 600x800 -> target (512, 640)."""
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(600, 800, 3)).astype(np.float32)
    K = np.array([[700.0, 0, 400.0], [0, 700.0, 300.0], [0, 0, 1]], dtype=np.float32)
    out, Kout = rescale_crop_image(img, K, (512, 640))
    # resize_scale = max(512/600, 640/800) = 0.8533..; rescaled = (512, 682)
    # final_w = 640 (682 > 640), final_h = 512
    assert out.shape == (512, 640, 3)
    scale = max(512 / 600, 640 / 800)
    np.testing.assert_allclose(Kout[0, 0], 700.0 * scale, rtol=1e-6)
    start_w = int(np.floor((int(800 * scale) - 640) / 2))
    np.testing.assert_allclose(Kout[0, 2], 400.0 * scale - start_w, rtol=1e-6)
    # dims snapped to multiples of 64
    assert out.shape[0] % 64 == 0 and out.shape[1] % 64 == 0


def test_rescale_crop_rejects_upscale():
    img = np.zeros((100, 100, 3), dtype=np.float32)
    K = np.eye(3, dtype=np.float32)
    with pytest.raises(ValueError):
        rescale_crop_image(img, K, (512, 640))


class TestDataLoader:
    class _Toy:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return {
                "x": np.full((2, 2), i, dtype=np.float32),
                "meta": {"y": np.array([i], dtype=np.int32)},
                "filename": f"f{i}",
            }

    def test_batching_and_collate(self):
        dl = DataLoader(self._Toy(10), 3, num_workers=2, drop_last=True)
        batches = list(dl)
        assert len(batches) == 3 == len(dl)
        b = batches[0]
        assert b["x"].shape == (3, 2, 2)
        assert b["meta"]["y"].shape == (3, 1)
        assert isinstance(b["filename"], list) and len(b["filename"]) == 3

    def test_shuffle_deterministic_per_epoch(self):
        dl = DataLoader(self._Toy(10), 10, shuffle=True, seed=1, num_workers=0)
        a = next(iter(dl))["x"][:, 0, 0]
        b = next(iter(dl))["x"][:, 0, 0]
        np.testing.assert_array_equal(a, b)
        dl.set_epoch(1)
        c = next(iter(dl))["x"][:, 0, 0]
        assert not np.array_equal(a, c)

    def test_host_sharding_partitions(self):
        seen = []
        for host in range(2):
            dl = DataLoader(
                self._Toy(10), 5, num_hosts=2, host_id=host, num_workers=0
            )
            for b in dl:
                seen.extend(b["x"][:, 0, 0].tolist())
        assert sorted(int(v) for v in seen) == list(range(10))

    def test_worker_error_propagates(self):
        class Bad(self._Toy):
            def __getitem__(self, i):
                raise RuntimeError("boom")

        dl = DataLoader(Bad(4), 2, num_workers=2)
        with pytest.raises(RuntimeError, match="boom"):
            list(dl)
