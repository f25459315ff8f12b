"""Depth metrics + running meters (reference utils.py:103-163).

All metrics are per-image-then-batch-mean with mask weighting, matching the
reference ``compute_metrics_for_each_image`` wrapper; images with an empty
mask contribute 0 (the reference would produce NaN there — never happens with
the shipped data).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def _per_image_masked_mean(
    x: jnp.ndarray, mask: jnp.ndarray, valid: jnp.ndarray | None = None
) -> jnp.ndarray:
    """x, mask: [B, H, W] -> mean over batch of per-image masked means.
    ``valid`` ([B] float, 1 real / 0 padded) excludes wrap-padded samples
    from the batch mean (parallel/mesh.py:pad_batch_to_multiple)."""
    m = mask.astype(jnp.float32)
    per = (x.astype(jnp.float32) * m).sum(axis=(1, 2)) / jnp.maximum(
        m.sum(axis=(1, 2)), 1.0
    )
    if valid is None:
        return per.mean()
    v = valid.astype(jnp.float32)
    return (per * v).sum() / jnp.maximum(v.sum(), 1.0)


def thres_metric(
    depth_est: jnp.ndarray, depth_gt: jnp.ndarray, mask: jnp.ndarray, thres: float,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Fraction of masked pixels with |err| > thres (utils.py:139-150)."""
    err = jnp.abs(depth_est - depth_gt)
    return _per_image_masked_mean((err > thres).astype(jnp.float32), mask, valid)


def abs_depth_error(
    depth_est: jnp.ndarray, depth_gt: jnp.ndarray, mask: jnp.ndarray,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Mean absolute masked depth error (utils.py:154-163)."""
    return _per_image_masked_mean(jnp.abs(depth_est - depth_gt), mask, valid)


def depth_metrics(
    depth_est: jnp.ndarray, depth_gt: jnp.ndarray, mask: jnp.ndarray,
    valid: jnp.ndarray | None = None,
) -> Dict[str, jnp.ndarray]:
    """The reference scalar set (train_mvs4.py:362-366)."""
    out = {"abs_depth_error": abs_depth_error(depth_est, depth_gt, mask, valid)}
    for t in (1, 2, 4, 8):
        out[f"thres{t}mm_error"] = thres_metric(
            depth_est, depth_gt, mask, float(t), valid
        )
    return out


class DictAverageMeter:
    """Running mean over scalar dicts (reference utils.py:103-122)."""

    def __init__(self):
        self.data: Dict[str, float] = {}
        self.count = 0

    def update(self, new_input: Dict[str, float]) -> None:
        self.count += 1
        for k, v in new_input.items():
            v = float(v)
            self.data[k] = self.data.get(k, 0.0) + v

    def mean(self) -> Dict[str, float]:
        return {k: v / max(self.count, 1) for k, v in self.data.items()}
