"""Sinkhorn OT loss parity vs an independent torch implementation of the
reference formula (models/mvs4net_utils.py:1164-1210)."""

import numpy as np
import pytest

import jax.numpy as jnp

from deep_reconstruction_with_epipolar_lines_mvster_tpu.core import sinkhorn_loss

torch = pytest.importorskip("torch")


def torch_sinkhorn(gt_depth, hypo_depth, attn_weight, mask, iters, eps=1.0,
                   continuous=False):
    """Independent torch oracle mirroring the reference math."""
    gt_depth = torch.from_numpy(gt_depth)
    hypo_depth = torch.from_numpy(hypo_depth)
    attn_weight = torch.from_numpy(attn_weight)
    mask = torch.from_numpy(mask)
    B, D, H, W = attn_weight.shape
    if not continuous:
        D_map = torch.stack(
            [torch.arange(-i, D - i, 1, dtype=torch.float32) for i in range(D)],
            dim=1,
        ).abs()
        D_map = D_map[None, None].repeat(B, H * W, 1, 1)
        gt_indices = (
            torch.abs(hypo_depth - gt_depth[:, None]).min(1)[1].reshape(B * H * W, 1)
        )
        gt_dist = torch.zeros(B * H * W, D)
        gt_dist.scatter_add_(1, gt_indices, torch.ones(B * H * W, 1))
        gt_dist = gt_dist.reshape(B, H * W, D)
    else:
        gt_dist = torch.zeros((B, H * W, D + 1))
        gt_dist[:, :, -1] = 1
        D_map = torch.zeros((B, D, D + 1))
        D_map[:, :D, :D] = torch.stack(
            [torch.arange(-i, D - i, 1, dtype=torch.float32) for i in range(D)],
            dim=1,
        ).abs().unsqueeze(0)
        D_map = D_map[:, None, None].repeat(1, H, W, 1, 1)
        itv = 1 / hypo_depth[:, 2] - 1 / hypo_depth[:, 1]
        gt_bin = (1 / gt_depth - 1 / hypo_depth[:, 0]) / itv
        gt_bin[~mask] = 10
        gt_bin_dist = torch.stack(
            [(gt_bin - i).abs() for i in range(D)], dim=1
        ).permute(0, 2, 3, 1)
        D_map[:, :, :, :, -1] = gt_bin_dist
        D_map = D_map.reshape(B, H * W, D, 1 + D)

    pred_dist = attn_weight.permute(0, 2, 3, 1).reshape(B, H * W, D)
    log_mu = (gt_dist + 1e-12).log()
    log_nu = (pred_dist + 1e-12).log()
    u, v = torch.zeros_like(log_nu), torch.zeros_like(log_mu)
    for _ in range(iters):
        v = log_mu - torch.logsumexp(D_map / eps + u.unsqueeze(3), dim=2)
        u = log_nu - torch.logsumexp(D_map / eps + v.unsqueeze(2), dim=3)
    T_map = (D_map / eps + u.unsqueeze(3) + v.unsqueeze(2)).exp()
    loss = (T_map * D_map).reshape(B * H * W, -1)[mask.reshape(-1)].sum(-1).mean()
    return loss.item()


def _fixture(D=4, B=2, H=6, W=5, seed=0):
    rng = np.random.default_rng(seed)
    hypo = np.sort(rng.uniform(5, 15, (B, D, H, W)).astype(np.float32), axis=1)
    gt = rng.uniform(5, 15, (B, H, W)).astype(np.float32)
    logits = rng.standard_normal((B, D, H, W)).astype(np.float32)
    attn = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    mask = rng.uniform(size=(B, H, W)) > 0.3
    return gt, hypo, attn.astype(np.float32), mask


@pytest.mark.parametrize("iters", [1, 3, 10])
def test_discrete_matches_reference(iters):
    gt, hypo, attn, mask = _fixture(seed=iters)
    expect = torch_sinkhorn(gt, hypo, attn, mask, iters=iters)
    got = float(
        sinkhorn_loss(
            jnp.asarray(gt), jnp.asarray(hypo), jnp.asarray(attn),
            jnp.asarray(mask), iters=iters,
        )
    )
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_continuous_matches_reference():
    gt, hypo, attn, mask = _fixture(seed=42)
    expect = torch_sinkhorn(gt, hypo, attn, mask, iters=3, continuous=True)
    got = float(
        sinkhorn_loss(
            jnp.asarray(gt), jnp.asarray(hypo), jnp.asarray(attn),
            jnp.asarray(mask), iters=3, continuous=True,
        )
    )
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_perfect_prediction_lower_loss():
    """A distribution concentrated on the GT bin must incur a lower OT cost
    than a uniform one."""
    gt, hypo, _, mask = _fixture(seed=7)
    B, D, H, W = hypo.shape
    gt_idx = np.abs(hypo - gt[:, None]).argmin(1)
    onehot = np.eye(D, dtype=np.float32)[gt_idx].transpose(0, 3, 1, 2)
    sharp = 0.97 * onehot + 0.01
    uniform = np.full((B, D, H, W), 1.0 / D, dtype=np.float32)
    l_sharp = float(
        sinkhorn_loss(jnp.asarray(gt), jnp.asarray(hypo), jnp.asarray(sharp),
                      jnp.asarray(mask), iters=10)
    )
    l_unif = float(
        sinkhorn_loss(jnp.asarray(gt), jnp.asarray(hypo), jnp.asarray(uniform),
                      jnp.asarray(mask), iters=10)
    )
    assert l_sharp < l_unif
