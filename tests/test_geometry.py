"""Geometry parity tests.

grid_sample / homography-warp semantics are checked against torch (CPU) as an
independent oracle for the exact `F.grid_sample(bilinear, zeros,
align_corners=True)` behaviour the reference model depends on
(reference: models/mvs4net_utils.py:21-67).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from deep_reconstruction_with_epipolar_lines_mvster_tpu.core import (
    compose_projection,
    grid_sample_2d,
    homo_warp,
    resize_align_corners,
)
from deep_reconstruction_with_epipolar_lines_mvster_tpu.core.geometry import (
    upsample_nearest_2x,
    warp_coords,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _rand(*shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32)


class TestGridSample:
    def _compare(self, img_nchw, coords_xy, atol=1e-5):
        """coords_xy: [B, P, 2] pixel coordinates."""
        B, C, H, W = img_nchw.shape
        # torch wants normalized coords with align_corners=True
        gx = coords_xy[..., 0] / ((W - 1) / 2.0) - 1.0
        gy = coords_xy[..., 1] / ((H - 1) / 2.0) - 1.0
        grid = np.stack([gx, gy], axis=-1)[:, :, None, :]  # [B, P, 1, 2]
        ref = F.grid_sample(
            torch.from_numpy(img_nchw),
            torch.from_numpy(grid.astype(np.float32)),
            mode="bilinear",
            padding_mode="zeros",
            align_corners=True,
        ).numpy()  # [B, C, P, 1]
        ref = ref[..., 0].transpose(0, 2, 1)  # [B, P, C]

        img_nhwc = jnp.asarray(img_nchw.transpose(0, 2, 3, 1))
        got = np.asarray(grid_sample_2d(img_nhwc, jnp.asarray(coords_xy)))
        np.testing.assert_allclose(got, ref, atol=atol, rtol=1e-5)

    def test_in_bounds(self):
        img = _rand(2, 3, 9, 11)
        rng = np.random.default_rng(1)
        coords = np.stack(
            [rng.uniform(0, 10, (2, 50)), rng.uniform(0, 8, (2, 50))], axis=-1
        ).astype(np.float32)
        self._compare(img, coords)

    def test_out_of_bounds_zero_padding(self):
        img = _rand(1, 2, 6, 7)
        rng = np.random.default_rng(2)
        coords = np.stack(
            [rng.uniform(-4, 11, (1, 80)), rng.uniform(-4, 10, (1, 80))], axis=-1
        ).astype(np.float32)
        self._compare(img, coords)

    def test_integer_coords_identity(self):
        img = _rand(1, 1, 5, 5)
        xs, ys = np.meshgrid(np.arange(5), np.arange(5), indexing="xy")
        coords = np.stack([xs.ravel(), ys.ravel()], axis=-1)[None].astype(np.float32)
        got = np.asarray(
            grid_sample_2d(jnp.asarray(img.transpose(0, 2, 3, 1)), jnp.asarray(coords))
        )
        np.testing.assert_allclose(got[0, :, 0], img[0, 0].ravel(), atol=1e-6)


def _make_cams():
    """Two cameras with a small x baseline, as (E, K) proj stacks [2,4,4]."""
    K = np.array([[40.0, 0, 16], [0, 40.0, 12], [0, 0, 1]], dtype=np.float32)
    E_ref = np.eye(4, dtype=np.float32)
    E_src = np.eye(4, dtype=np.float32)
    E_src[0, 3] = 0.5  # small baseline along x

    def stack(E):
        s = np.zeros((2, 4, 4), dtype=np.float32)
        s[0] = E
        s[1, :3, :3] = K
        return s

    return stack(E_ref), stack(E_src), K


class TestHomoWarp:
    def test_identity_warp(self):
        """src == ref camera: warp must reproduce the source feature map for
        every depth hypothesis (interior pixels)."""
        S_ref, _, _ = _make_cams()
        fea = jnp.asarray(_rand(1, 24, 32, 4).astype(np.float32))
        depth = jnp.full((1, 3, 24, 32), 10.0, dtype=jnp.float32)
        warped = homo_warp(fea, jnp.asarray(S_ref)[None], jnp.asarray(S_ref)[None], depth)
        for d in range(3):
            np.testing.assert_allclose(
                np.asarray(warped[0, d]), np.asarray(fea[0]), atol=1e-4
            )

    def test_against_torch_reference_formula(self):
        """Full warp vs an independent torch implementation of the reference
        plane-sweep + grid_sample math (same relative matrix fed to both, so
        the oracle isolates the grid arithmetic + sampling)."""
        S_ref, S_src, _ = _make_cams()
        B, H, W, C, D = 1, 24, 32, 4, 4
        fea = _rand(B, C, H, W, seed=3)
        depth = np.linspace(8.0, 14.0, D, dtype=np.float32)
        depth_v = np.broadcast_to(depth[None, :, None, None], (B, D, H, W)).copy()

        from deep_reconstruction_with_epipolar_lines_mvster_tpu.core import (
            relative_projection,
        )
        rel = np.asarray(
            relative_projection(jnp.asarray(S_src)[None], jnp.asarray(S_ref)[None])
        )

        # torch oracle (same plane-sweep math as mvs4net_utils.homo_warping,
        # starting from the identical relative matrix)
        proj = torch.from_numpy(rel)
        rot, trans = proj[:, :3, :3], proj[:, :3, 3:4]
        y, x = torch.meshgrid(
            torch.arange(H, dtype=torch.float32),
            torch.arange(W, dtype=torch.float32),
            indexing="ij",
        )
        xyz = torch.stack([x.reshape(-1), y.reshape(-1), torch.ones(H * W)])[None]
        rot_xyz = rot @ xyz
        rdx = rot_xyz.unsqueeze(2) * torch.from_numpy(depth_v).reshape(B, 1, D, -1)
        pxyz = rdx + trans.reshape(B, 3, 1, 1)
        z = pxyz[:, 2:3].clone()
        z[z == 0] = 1e-9
        pxy = pxyz[:, :2] / z
        gx = pxy[:, 0] / ((W - 1) / 2) - 1
        gy = pxy[:, 1] / ((H - 1) / 2) - 1
        grid = torch.stack([gx, gy], dim=3)
        ref_out = F.grid_sample(
            torch.from_numpy(fea),
            grid.reshape(B, D * H, W, 2),
            mode="bilinear",
            padding_mode="zeros",
            align_corners=True,
        ).reshape(B, C, D, H, W).numpy()

        got = homo_warp(
            jnp.asarray(fea.transpose(0, 2, 3, 1)),
            jnp.asarray(S_src)[None],
            jnp.asarray(S_ref)[None],
            jnp.asarray(depth_v),
        )  # [B, D, H, W, C]
        got_nchw = np.asarray(got).transpose(0, 4, 1, 2, 3)
        np.testing.assert_allclose(got_nchw, ref_out, atol=1e-4, rtol=1e-4)

    def test_known_shift(self):
        """Plane at depth d with baseline b along x: disparity = f*b/d."""
        from deep_reconstruction_with_epipolar_lines_mvster_tpu.core import (
            relative_projection,
        )
        S_ref, S_src, _ = _make_cams()
        d0 = 10.0
        rel = relative_projection(jnp.asarray(S_src)[None], jnp.asarray(S_ref)[None])
        coords = warp_coords(
            rel,
            jnp.full((1, 1, 8, 8), d0, dtype=jnp.float32),
        )
        xs, ys = np.meshgrid(np.arange(8), np.arange(8), indexing="xy")
        expected_x = xs + 40.0 * 0.5 / d0
        np.testing.assert_allclose(np.asarray(coords[0, 0, ..., 0]), expected_x, atol=1e-5)
        np.testing.assert_allclose(np.asarray(coords[0, 0, ..., 1]), ys, atol=1e-5)


class TestComposeProjection:
    def test_matches_manual(self):
        rng = np.random.default_rng(0)
        E = np.eye(4, dtype=np.float32)
        E[:3, :3] = np.linalg.qr(rng.standard_normal((3, 3)))[0]
        E[:3, 3] = rng.standard_normal(3)
        K = np.array([[100, 0, 32], [0, 90, 24], [0, 0, 1]], dtype=np.float32)
        stack = np.zeros((2, 4, 4), dtype=np.float32)
        stack[0] = E
        stack[1, :3, :3] = K
        got = np.asarray(compose_projection(jnp.asarray(stack)[None]))[0]
        expect = E.copy()
        expect[:3, :4] = K @ E[:3, :4]
        np.testing.assert_allclose(got, expect, atol=1e-5)


class TestRelativeProjection:
    def test_matches_f64_compose_invert(self):
        """Analytic-inverse relative transform vs float64 numpy oracle."""
        from deep_reconstruction_with_epipolar_lines_mvster_tpu.core import (
            relative_projection,
        )
        rng = np.random.default_rng(3)
        def rand_stack():
            E = np.eye(4)
            E[:3, :3] = np.linalg.qr(rng.standard_normal((3, 3)))[0]
            E[:3, 3] = rng.standard_normal(3) * 10
            K = np.array(
                [[500 + rng.uniform(0, 50), 0, 320], [0, 480.0, 240], [0, 0, 1]]
            )
            s = np.zeros((2, 4, 4))
            s[0] = E
            s[1, :3, :3] = K
            return s
        S_ref, S_src = rand_stack(), rand_stack()

        def compose(s):
            P = s[0].copy()
            P[:3, :4] = s[1, :3, :3] @ s[0][:3, :4]
            return P
        expect = compose(S_src) @ np.linalg.inv(compose(S_ref))
        got = np.asarray(
            relative_projection(
                jnp.asarray(S_src, dtype=jnp.float32)[None],
                jnp.asarray(S_ref, dtype=jnp.float32)[None],
            )
        )[0]
        np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)

    def test_identity_is_exact_enough(self):
        from deep_reconstruction_with_epipolar_lines_mvster_tpu.core import (
            relative_projection,
        )
        S_ref, _, _ = _make_cams()
        rel = np.asarray(
            relative_projection(jnp.asarray(S_ref)[None], jnp.asarray(S_ref)[None])
        )[0]
        np.testing.assert_allclose(rel, np.eye(4), atol=1e-5)


class TestResize:
    def test_bilinear_align_corners_vs_torch(self):
        x = _rand(2, 3, 5, 7, seed=5)
        ref = F.interpolate(
            torch.from_numpy(x), size=(10, 14), mode="bilinear", align_corners=True
        ).numpy()
        got = np.asarray(
            resize_align_corners(jnp.asarray(x.transpose(0, 2, 3, 1)), (10, 14))
        ).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

    def test_downsample_vs_torch(self):
        x = _rand(1, 2, 8, 12, seed=6)
        ref = F.interpolate(
            torch.from_numpy(x), size=(4, 6), mode="bilinear", align_corners=True
        ).numpy()
        got = np.asarray(
            resize_align_corners(jnp.asarray(x.transpose(0, 2, 3, 1)), (4, 6))
        ).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

    def test_nearest_2x_vs_torch(self):
        x = _rand(1, 2, 4, 5, seed=7)
        ref = F.interpolate(torch.from_numpy(x), scale_factor=2, mode="nearest").numpy()
        got = np.asarray(
            upsample_nearest_2x(jnp.asarray(x.transpose(0, 2, 3, 1)))
        ).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, ref, atol=0)
