"""Depth-hypothesis initialisation / coarse-to-fine window scheduling.

Reimplements the reference schedulers (``models/mvs4net_utils.py:69-106``) in
pure jnp. The inverse-depth path is the one exercised by every shipped recipe;
``schedule_range`` additionally fixes the reference's crash-on-use bug
(``ndepth.device - 1`` at ``mvs4net_utils.py:102``) — documented divergence,
the broken path is unreachable in the reference anyway.
"""

from __future__ import annotations

import jax.numpy as jnp

from .geometry import resize_align_corners


def init_range(depth_values: jnp.ndarray, ndepths: int, h: int, w: int) -> jnp.ndarray:
    """Uniform-in-depth hypotheses from a ``[B, >=2]`` (min..max) range.

    Reference: ``init_range`` (``mvs4net_utils.py:69-77``). Returns
    ``[B, D, H, W]``.
    """
    dmin = depth_values[:, 0]
    dmax = depth_values[:, -1]
    itv = (dmax - dmin) / (ndepths - 1)
    steps = jnp.arange(ndepths, dtype=depth_values.dtype)
    samples = dmin[:, None] + steps[None, :] * itv[:, None]  # [B, D]
    return jnp.broadcast_to(
        samples[:, :, None, None], (depth_values.shape[0], ndepths, h, w)
    )


def init_inverse_range(
    depth_values: jnp.ndarray, ndepths: int, h: int, w: int
) -> jnp.ndarray:
    """Uniform-in-inverse-depth hypotheses; index 0 is the *far* plane
    (1/dmax) exactly as in the reference ``init_inverse_range``
    (``mvs4net_utils.py:79-85``). Returns ``[B, D, H, W]``.
    """
    inv_min = 1.0 / depth_values[:, 0]   # largest inverse (near)
    inv_max = 1.0 / depth_values[:, -1]  # smallest inverse (far)
    itv = jnp.arange(ndepths, dtype=depth_values.dtype) / (ndepths - 1)
    inv_hypo = inv_max[:, None] + (inv_min - inv_max)[:, None] * itv[None, :]
    hypo = 1.0 / inv_hypo  # [B, D]
    return jnp.broadcast_to(
        hypo[:, :, None, None], (depth_values.shape[0], ndepths, h, w)
    )


def schedule_inverse_range(
    inverse_min_depth: jnp.ndarray,
    inverse_max_depth: jnp.ndarray,
    ndepths: int,
    h: int,
    w: int,
) -> jnp.ndarray:
    """Re-centred inverse-depth window around the previous-stage prediction.

    Reference: ``schedule_inverse_range`` (``mvs4net_utils.py:87-94``): build
    D evenly-spaced inverse-depth samples between the per-pixel
    (max, min) window at the previous (half) resolution, then trilinearly
    upsample to ``(D, H, W)`` with align_corners=True. Depth count is
    unchanged, so the depth axis of the trilinear interp is the identity and
    the op reduces to a per-plane bilinear resize.

    Args:
      inverse_min_depth / inverse_max_depth: ``[B, h/2, w/2]`` per-pixel
        window bounds from the previous stage.

    Returns:
      ``[B, D, H, W]`` depth hypotheses (in depth, not inverse depth).
    """
    itv = jnp.arange(ndepths, dtype=inverse_min_depth.dtype) / (ndepths - 1)
    inv_hypo = (
        inverse_max_depth[:, None, :, :]
        + (inverse_min_depth - inverse_max_depth)[:, None, :, :] * itv[None, :, None, None]
    )  # [B, D, h/2, w/2]
    B, D = inv_hypo.shape[:2]
    inv_hypo = resize_align_corners(inv_hypo[..., None], (h, w))[..., 0]
    return 1.0 / inv_hypo


def schedule_range(
    cur_depth: jnp.ndarray,
    ndepth: int,
    depth_interval_pixel: jnp.ndarray,
    h: int,
    w: int,
) -> jnp.ndarray:
    """Linear-in-depth re-centred window (non-inverse path).

    Reference: ``schedule_range`` (``mvs4net_utils.py:96-106``) — which is
    broken upstream (``ndepth.device - 1``); here the interval divides by
    ``ndepth - 1`` as clearly intended.

    Args:
      cur_depth: ``[B, h/2, w/2]`` previous-stage depth.
      depth_interval_pixel: ``[B]`` per-sample interval.
    """
    half = ndepth / 2.0 * depth_interval_pixel[:, None, None]
    dmin = cur_depth - half
    dmax = cur_depth + half
    itv = (dmax - dmin) / (ndepth - 1)
    steps = jnp.arange(ndepth, dtype=cur_depth.dtype)
    samples = dmin[:, None, :, :] + steps[None, :, None, None] * itv[:, None, :, :]
    return resize_align_corners(samples[..., None], (h, w))[..., 0]
