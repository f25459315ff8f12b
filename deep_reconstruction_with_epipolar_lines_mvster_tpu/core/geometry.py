"""Projective geometry for multi-view stereo, pure jnp, NHWC layout.

Reimplements (TPU-first, not a translation) the geometry of the reference's
``models/mvs4net_utils.py:21-67`` (``homo_warping``) and the ``F.grid_sample`` /
``F.interpolate(align_corners=True)`` semantics it relies on. All sampling is
expressed as flat gathers + bilinear weights so XLA can fuse the arithmetic and
keep the gather on-chip; resizes are expressed as small static interpolation
matrices applied with einsum so they run on the MXU.

Conventions
-----------
- images / feature maps are ``[B, H, W, C]`` (NHWC — TPU-native),
- depth hypothesis volumes are ``[B, D, H, W]``,
- warped feature volumes are ``[B, D, H, W, C]``,
- projection inputs are ``[B, 2, 4, 4]`` stacks of (extrinsics 4x4,
  intrinsics-in-top-left-3x3) exactly like the reference sample spec
  (``datasets/dtu_yao4.py:201-204``), composed here into a single 4x4.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def compose_projection(proj_mat: jnp.ndarray) -> jnp.ndarray:
    """Compose the reference's ``[2,4,4]`` (extrinsics, intrinsics) stack into
    a single 4x4 pixel-projection matrix ``P`` with ``P[:3,:4] = K @ E[:3,:4]``.

    Mirrors the per-view composition in the reference stagenet
    (``models/mvs4net_utils.py:1047-1050``). Accepts any leading batch dims:
    ``[..., 2, 4, 4] -> [..., 4, 4]``.
    """
    extr = proj_mat[..., 0, :, :]
    intr = proj_mat[..., 1, :3, :3]
    top = jnp.einsum("...ij,...jk->...ik", intr, extr[..., :3, :4])
    return jnp.concatenate([top, extr[..., 3:4, :]], axis=-2)


def intrinsics_inverse(intr: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of an upper-triangular 3x3 intrinsics matrix
    ``[[fx, s, cx], [0, fy, cy], [0, 0, 1]]`` (any leading batch dims).

    Avoids ``jnp.linalg.inv`` on the composed K·E matrix: numerically
    inverting that product in float32 (what the reference does on GPU,
    ``mvs4net_utils.py:32``) costs ~1e-2 px of warp accuracy; the analytic
    route keeps the warp grid accurate to <1e-4 px — TPUs have no fast f64
    fallback, so accuracy has to come from structure.
    """
    fx = intr[..., 0, 0]
    s = intr[..., 0, 1]
    cx = intr[..., 0, 2]
    fy = intr[..., 1, 1]
    cy = intr[..., 1, 2]
    zero = jnp.zeros_like(fx)
    one = jnp.ones_like(fx)
    row0 = jnp.stack([1.0 / fx, -s / (fx * fy), (s * cy - cx * fy) / (fx * fy)], -1)
    row1 = jnp.stack([zero, 1.0 / fy, -cy / fy], -1)
    row2 = jnp.stack([zero, zero, one], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def extrinsics_inverse(extr: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a rigid-body 4x4 ``[R|t]`` via ``[Rᵀ | -Rᵀ t]`` (any
    leading batch dims). Exact for orthonormal R, no linear solve."""
    rot = extr[..., :3, :3]
    t = extr[..., :3, 3:4]
    rot_t = jnp.swapaxes(rot, -1, -2)
    top = jnp.concatenate([rot_t, -rot_t @ t], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=extr.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def relative_projection(
    src_proj_stack: jnp.ndarray, ref_proj_stack: jnp.ndarray
) -> jnp.ndarray:
    """Relative pixel transform ``K_src · E_src · E_ref⁻¹ · K_ref⁻¹`` from the
    two ``[..., 2, 4, 4]`` (extrinsics, intrinsics) stacks.

    Equivalent to the reference's ``src_proj_new @ inv(ref_proj_new)``
    (``mvs4net_utils.py:32`` with ``:1047-1050``) but built from analytic
    inverses of the factors — see :func:`intrinsics_inverse`.

    Returns ``[..., 4, 4]``.
    """
    e_src = src_proj_stack[..., 0, :, :]
    k_src = src_proj_stack[..., 1, :3, :3]
    e_ref = ref_proj_stack[..., 0, :, :]
    k_ref = ref_proj_stack[..., 1, :3, :3]
    rel_e = e_src @ extrinsics_inverse(e_ref)  # [..., 4, 4]
    k_ref_inv = intrinsics_inverse(k_ref)
    top = k_src @ rel_e[..., :3, :4]
    top = jnp.concatenate(
        [top[..., :, :3] @ k_ref_inv, top[..., :, 3:4]], axis=-1
    )
    # bottom row of rel_e, with the :3 block de-projected by K_ref^-1
    bot = jnp.concatenate(
        [rel_e[..., 3:4, :3] @ k_ref_inv, rel_e[..., 3:4, 3:4]], axis=-1
    )
    return jnp.concatenate([top, bot], axis=-2)


def grid_sample_2d(
    img: jnp.ndarray,
    coords_xy: jnp.ndarray,
    *,
    align_corners: bool = True,
) -> jnp.ndarray:
    """Bilinear sampling of ``img`` at pixel coordinates, zeros padding.

    Matches ``F.grid_sample(mode='bilinear', padding_mode='zeros',
    align_corners=True)`` (the hot op of the reference,
    ``models/mvs4net_utils.py:59``) but takes *pixel* coordinates directly —
    the reference normalizes to [-1, 1] and grid_sample denormalizes with the
    identical align_corners mapping, so the round trip is skipped here.

    Args:
      img: ``[B, H, W, C]``.
      coords_xy: ``[B, ..., 2]`` with ``(x, y)`` in pixel units; out-of-range
        samples blend with zeros exactly like torch's zeros padding (each of
        the 4 corner taps contributes 0 when that corner is out of bounds).
      align_corners: pixel-center convention; only True is used by the model.

    Returns:
      ``[B, ..., C]`` sampled values, dtype of ``img``.
    """
    if not align_corners:
        raise NotImplementedError("model only uses align_corners=True")
    B, H, W, C = img.shape
    batch_shape = coords_xy.shape[:-1]
    P = int(np.prod(batch_shape[1:])) if len(batch_shape) > 1 else 1
    coords = coords_xy.reshape(B, P, 2)
    x = coords[..., 0].astype(jnp.float32)
    y = coords[..., 1].astype(jnp.float32)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    img_flat = img.reshape(B, H * W, C)

    def tap(xi, yi, w):
        valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        yc = jnp.clip(yi, 0, H - 1)
        idx = yc * W + xc  # [B, P]
        vals = jnp.take_along_axis(img_flat, idx[..., None], axis=1)  # [B,P,C]
        w = jnp.where(valid, w, 0.0).astype(img.dtype)
        return vals * w[..., None]

    out = (
        tap(x0i, y0i, (1.0 - lx) * (1.0 - ly))
        + tap(x0i + 1, y0i, lx * (1.0 - ly))
        + tap(x0i, y0i + 1, (1.0 - lx) * ly)
        + tap(x0i + 1, y0i + 1, lx * ly)
    )
    return out.reshape(*batch_shape, C)


def warp_coords(
    rel_proj: jnp.ndarray,
    depth_values: jnp.ndarray,
) -> jnp.ndarray:
    """Pixel coordinates in the source view for every (ref pixel, hypothesis).

    The plane-sweep transform of the reference ``homo_warping``
    (``models/mvs4net_utils.py:32-53``): lift each reference pixel to each
    depth hypothesis, project into the source camera, perspective-divide with
    the reference's exact zero-guard (``z == 0 -> 1e-9``).

    Args:
      rel_proj: relative pixel transform ``[B, 4, 4]``
        (see :func:`relative_projection`).
      depth_values: ``[B, D, H, W]``.

    Returns:
      ``[B, D, H, W, 2]`` float32 ``(x, y)`` source-pixel coordinates.
    """
    x, y = warp_coords_xy(rel_proj, depth_values)
    return jnp.stack([x, y], axis=-1)


def warp_coords_xy(rel_proj, depth_values):
    """:func:`warp_coords` as two separate ``[B, D, H, W]`` planes.

    The stacked ``[..., 2]`` form forces XLA to materialize an interleaved
    coordinate tensor that the banded-warp planners immediately de-interleave
    (measured ~0.7 ms/view of 'convolution fusion' at the bench stage 4);
    the Pallas warp paths consume x and y separately, so never stack."""
    B, D, H, W = depth_values.shape
    rot = rel_proj[:, :3, :3]
    trans = rel_proj[:, :3, 3]
    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    grid_x, grid_y = jnp.meshgrid(xs, ys, indexing="xy")
    ones = jnp.ones_like(grid_x)
    xyz = jnp.stack([grid_x, grid_y, ones], axis=-1).reshape(1, H * W, 3)
    rot_xyz = jnp.einsum("bij,bpj->bpi", rot, xyz)  # [B, HW, 3]
    d = depth_values.reshape(B, D, H * W, 1)
    proj_xyz = rot_xyz[:, None, :, :] * d + trans[:, None, None, :]
    z = proj_xyz[..., 2]
    z = jnp.where(z == 0.0, 1e-9, z)
    x = (proj_xyz[..., 0] / z).reshape(B, D, H, W)
    y = (proj_xyz[..., 1] / z).reshape(B, D, H, W)
    return jax.lax.stop_gradient(x), jax.lax.stop_gradient(y)


def homo_warp(
    src_fea: jnp.ndarray,
    src_proj_stack: jnp.ndarray,
    ref_proj_stack: jnp.ndarray,
    depth_values: jnp.ndarray,
) -> jnp.ndarray:
    """Differentiable homography warp: ``[B,Hs,Ws,C] -> [B,D,H,W,C]``.

    TPU-native equivalent of the reference's ``homo_warping``
    (``models/mvs4net_utils.py:21-67``); gradients flow into ``src_fea``
    through the bilinear taps, the sampling grid is stop-gradiented (the
    reference computes it under ``torch.no_grad``).

    Args:
      src_proj_stack / ref_proj_stack: ``[B, 2, 4, 4]`` (extrinsics,
        intrinsics) stacks — the sample-spec format.
    """
    rel = relative_projection(src_proj_stack, ref_proj_stack)
    coords = warp_coords(rel, depth_values)
    return grid_sample_2d(src_fea, coords)


def _interp_matrix_align_corners(n_out: int, n_in: int) -> np.ndarray:
    """Static 1-D linear-interpolation matrix with align_corners=True."""
    m = np.zeros((n_out, n_in), dtype=np.float32)
    if n_out == 1 or n_in == 1:
        m[:, 0] = 1.0
        return m
    src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    i0 = np.floor(src).astype(np.int64)
    i0 = np.clip(i0, 0, n_in - 2)
    frac = src - i0
    m[np.arange(n_out), i0] += (1.0 - frac).astype(np.float32)
    m[np.arange(n_out), i0 + 1] += frac.astype(np.float32)
    return m


def resize_align_corners(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize matching ``F.interpolate(..., align_corners=True)``.

    Used for the FPN top-down x2 upsampling (``mvs4net_utils.py:489-495``) and
    the hypothesis-window interpolation (``:93``). ``x`` is ``[..., H, W, C]``;
    the resize runs as two small static matmuls (MXU-friendly) instead of a
    gather.
    """
    *lead, H, W, C = x.shape
    Ho, Wo = out_hw
    if (H, W) == (Ho, Wo):
        return x
    my = jnp.asarray(_interp_matrix_align_corners(Ho, H), dtype=x.dtype)
    mx = jnp.asarray(_interp_matrix_align_corners(Wo, W), dtype=x.dtype)
    xf = x.reshape(-1, H, W, C)
    xf = jnp.einsum("oh,bhwc->bowc", my, xf)
    xf = jnp.einsum("pw,bowc->bopc", mx, xf)
    return xf.reshape(*lead, Ho, Wo, C)


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest x2 upsample of ``[..., H, W, C]`` (torch 'nearest' semantics:
    ``out[i] = in[i // 2]``)."""
    x = jnp.repeat(x, 2, axis=-3)
    x = jnp.repeat(x, 2, axis=-2)
    return x
