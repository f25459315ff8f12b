"""Geometric-consistency depth filtering + multi-view fusion.

TPU-native re-design of the reference's CPU/OpenCV fusion stage
(``test_mvs4.py:612-894``): the ref->src->ref reprojection round trip,
pixel/relative-depth consistency masks, consistent-view counting and fused
depth averaging are pure jnp, jitted and vmapped over source views — the
whole per-ref-view filter runs as one device computation instead of a Python
loop with ``cv2.remap`` (the reference's per-view fusion takes ~seconds on
CPU; SURVEY.md §6).

Semantics parity (file:line into the reference):
- ``reproject``: lift ref pixels by ref depth, project into src, *bilinearly
  sample the src depth* (cv2.remap INTER_LINEAR + zero border ==
  grid_sample zeros padding), lift by the sampled depth, project back
  (test_mvs4.py:612-649);
- consistency: ``dist < condmask_pixel`` AND ``|d_rep - d_ref|/d_ref <
  condmask_depth``; inconsistent reprojected depths are zeroed
  (test_mvs4.py:653-670);
- fusion: ``(sum(reprojected) + ref) / (n_consistent + 1)``, geo mask =
  count >= geomask, final = photo AND geo (test_mvs4.py:744-749);
- world-space backprojection uses *pixel-center* grids (0.5 offsets,
  test_mvs4.py:206-229).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..core.geometry import extrinsics_inverse, grid_sample_2d, intrinsics_inverse


class FusionConfig(NamedTuple):
    photomask: float = 0.3          # confidence threshold (--photomask)
    geomask: int = 2                # min consistent views (--geomask)
    condmask_pixel: float = 1.0     # reprojection pixel distance (--condmask_pixel)
    condmask_depth: float = 0.01    # relative depth difference (--condmask_depth)


def _pixel_grid(h: int, w: int, *, centered: bool = False) -> jnp.ndarray:
    """[H, W, 3] homogeneous pixel coordinates; ``centered`` adds the 0.5
    pixel-center offset used by the reference's world backprojection
    (test_mvs4.py:220-229) but NOT by its consistency check (:616)."""
    off = 0.5 if centered else 0.0
    xs = jnp.arange(w, dtype=jnp.float32) + off
    ys = jnp.arange(h, dtype=jnp.float32) + off
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    return jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)


def backproject_to_world(
    depth: jnp.ndarray, intrinsics: jnp.ndarray, extrinsics: jnp.ndarray
) -> jnp.ndarray:
    """Depth map -> world-space points [H, W, 3] (reference depth2pts_np,
    test_mvs4.py:206-218, pixel-center convention)."""
    h, w = depth.shape
    uv = _pixel_grid(h, w, centered=True) @ intrinsics_inverse(intrinsics).T
    cam_pts = uv * depth[..., None]
    rot = extrinsics[:3, :3]
    t = extrinsics[:3, 3]
    # (p - t) @ R == R^T (p - t) == R^-1 (p - t) for orthonormal R
    return (cam_pts - t) @ rot


def reproject(
    depth_ref: jnp.ndarray,
    intr_ref: jnp.ndarray,
    extr_ref: jnp.ndarray,
    depth_src: jnp.ndarray,
    intr_src: jnp.ndarray,
    extr_src: jnp.ndarray,
):
    """Ref->src->ref round trip (reference reproject_with_depth,
    test_mvs4.py:612-649). Returns (depth_reprojected, x2d_reprojected,
    y2d_reprojected), each [H, W]."""
    h, w = depth_ref.shape
    grid = _pixel_grid(h, w)  # [H, W, 3] (corner convention, like the ref)

    k_ref_inv = intrinsics_inverse(intr_ref)
    xyz_ref = (grid @ k_ref_inv.T) * depth_ref[..., None]  # ref cam coords

    # ref cam -> src cam: E_src @ E_ref^-1 (analytic rigid inverse)
    rel = extr_src @ extrinsics_inverse(extr_ref)
    xyz_src = xyz_ref @ rel[:3, :3].T + rel[:3, 3]
    k_xyz = xyz_src @ intr_src.T
    xy_src = k_xyz[..., :2] / k_xyz[..., 2:3]

    # bilinear sample of src depth at the projected coords
    sampled = grid_sample_2d(
        depth_src[None, :, :, None], xy_src[None]
    )[0, ..., 0]

    # lift by the sampled src depth, project back to ref
    xyz_src2 = (
        jnp.concatenate([xy_src, jnp.ones((h, w, 1), dtype=xy_src.dtype)], axis=-1)
        @ intrinsics_inverse(intr_src).T
    ) * sampled[..., None]
    rel_back = extr_ref @ extrinsics_inverse(extr_src)
    xyz_rep = xyz_src2 @ rel_back[:3, :3].T + rel_back[:3, 3]
    depth_rep = xyz_rep[..., 2]
    k_rep = xyz_rep @ intr_ref.T
    xy_rep = k_rep[..., :2] / k_rep[..., 2:3]
    return depth_rep, xy_rep[..., 0], xy_rep[..., 1]


def check_geometric_consistency(
    depth_ref, intr_ref, extr_ref, depth_src, intr_src, extr_src,
    *, condmask_pixel: float, condmask_depth: float,
):
    """(mask, depth_reprojected-with-zeros) — reference
    check_geometric_consistency (test_mvs4.py:653-670)."""
    h, w = depth_ref.shape
    grid = _pixel_grid(h, w)
    depth_rep, x_rep, y_rep = reproject(
        depth_ref, intr_ref, extr_ref, depth_src, intr_src, extr_src
    )
    dist = jnp.sqrt((x_rep - grid[..., 0]) ** 2 + (y_rep - grid[..., 1]) ** 2)
    rel_diff = jnp.abs(depth_rep - depth_ref) / depth_ref
    mask = (dist < condmask_pixel) & (rel_diff < condmask_depth)
    return mask, jnp.where(mask, depth_rep, 0.0)


@functools.partial(jax.jit, static_argnames=("condmask_pixel", "condmask_depth", "geomask", "photomask"))
def _filter_ref_view(
    depth_ref, conf_ref, intr_ref, extr_ref,
    depths_src, intrs_src, extrs_src,     # stacked over the src-view axis
    *, photomask: float, geomask: int, condmask_pixel: float, condmask_depth: float,
):
    check = jax.vmap(
        lambda d, k, e: check_geometric_consistency(
            depth_ref, intr_ref, extr_ref, d, k, e,
            condmask_pixel=condmask_pixel, condmask_depth=condmask_depth,
        )
    )
    masks, depths_rep = check(depths_src, intrs_src, extrs_src)  # [S, H, W]
    geo_count = masks.astype(jnp.int32).sum(axis=0)
    fused = (depths_rep.sum(axis=0) + depth_ref) / (geo_count + 1).astype(jnp.float32)
    photo_mask = conf_ref > photomask
    geo_mask = geo_count >= geomask
    final_mask = photo_mask & geo_mask
    return {
        "photo_mask": photo_mask,
        "geo_mask": geo_mask,
        "final_mask": final_mask,
        "fused_depth": fused,
    }


def filter_ref_view(
    depth_ref: np.ndarray,
    conf_ref: np.ndarray,
    intr_ref: np.ndarray,
    extr_ref: np.ndarray,
    src_depths: Sequence[np.ndarray],
    src_intrs: Sequence[np.ndarray],
    src_extrs: Sequence[np.ndarray],
    cfg: FusionConfig = FusionConfig(),
) -> Dict[str, np.ndarray]:
    """Filter + fuse one reference view against its source views (device-side,
    all source views in one vmapped computation)."""
    out = _filter_ref_view(
        jnp.asarray(depth_ref, jnp.float32),
        jnp.asarray(conf_ref, jnp.float32),
        jnp.asarray(intr_ref, jnp.float32),
        jnp.asarray(extr_ref, jnp.float32),
        jnp.stack([jnp.asarray(d, jnp.float32) for d in src_depths]),
        jnp.stack([jnp.asarray(k, jnp.float32) for k in src_intrs]),
        jnp.stack([jnp.asarray(e, jnp.float32) for e in src_extrs]),
        photomask=cfg.photomask,
        geomask=cfg.geomask,
        condmask_pixel=cfg.condmask_pixel,
        condmask_depth=cfg.condmask_depth,
    )
    return {k: np.asarray(v) for k, v in out.items()}


def fused_world_points(
    fused_depth: np.ndarray,
    final_mask: np.ndarray,
    intr: np.ndarray,
    extr: np.ndarray,
    image01: np.ndarray | None = None,
):
    """Masked world-space vertices (+ colors) for one ref view
    (test_mvs4.py:781-793)."""
    pts = np.asarray(
        backproject_to_world(
            jnp.asarray(fused_depth, jnp.float32),
            jnp.asarray(intr, jnp.float32),
            jnp.asarray(extr, jnp.float32),
        )
    )
    m = np.asarray(final_mask, bool)
    xyz = pts[m]
    rgb = None
    if image01 is not None:
        rgb = (np.asarray(image01)[m] * 255.0).astype(np.uint8)
    return xyz, rgb
