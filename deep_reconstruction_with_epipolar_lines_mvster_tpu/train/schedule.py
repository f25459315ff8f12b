"""Learning-rate schedules (optax-style ``step -> lr`` callables).

Reimplements the reference scheduler menu (``train_mvs4.py:124-137``):
``MS`` (WarmupMultiStepLR, utils.py:212-254, milestones in *iterations* =
``len(loader) * epoch``), ``cos``, ``onecycle`` and ``exponent``.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import optax


def warmup_multistep(
    base_lr: float,
    milestones: Sequence[int],
    gamma: float,
    *,
    warmup_factor: float = 1.0 / 3.0,
    warmup_iters: int = 500,
    warmup_method: str = "linear",
):
    """WarmupMultiStepLR: linear (or constant) warmup times
    ``gamma ** bisect_right(milestones, step)`` (reference utils.py:241-254)."""
    ms = jnp.asarray(sorted(milestones), dtype=jnp.int32)

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.int32)
        if warmup_method == "linear":
            alpha = jnp.minimum(step.astype(jnp.float32) / warmup_iters, 1.0)
            warm = jnp.where(
                step < warmup_iters, warmup_factor * (1 - alpha) + alpha, 1.0
            )
        else:  # constant
            warm = jnp.where(step < warmup_iters, warmup_factor, 1.0)
        # bisect_right: count milestones <= step
        n_passed = (ms <= step).sum()
        return base_lr * warm * gamma**n_passed

    return schedule


def cosine(base_lr: float, total_steps: int):
    """CosineAnnealingLR with eta_min=0 (reference train_mvs4.py:128)."""
    return optax.cosine_decay_schedule(base_lr, decay_steps=total_steps)


def onecycle(base_lr: float, total_steps: int):
    """OneCycleLR with max_lr=base_lr (reference train_mvs4.py:130)."""
    return optax.cosine_onecycle_schedule(
        transition_steps=total_steps, peak_value=base_lr
    )


def exponent(base_lr: float, gamma: float = 0.17):
    """Per-epoch exponential decay (reference train_mvs4.py:136); the caller
    supplies steps-per-epoch granularity by stepping it once per epoch."""

    def schedule(step):
        return base_lr * gamma ** jnp.asarray(step, dtype=jnp.float32)

    return schedule


def make_schedule(
    name: str,
    base_lr: float,
    *,
    milestones_iters: Sequence[int] = (),
    gamma: float = 0.5,
    total_steps: int = 0,
    warmup_iters: int = 500,
):
    if name == "MS":
        return warmup_multistep(
            base_lr, milestones_iters, gamma, warmup_iters=warmup_iters
        )
    if name == "cos":
        return cosine(base_lr, total_steps)
    if name == "onecycle":
        return onecycle(base_lr, total_steps)
    if name == "exponent":
        return exponent(base_lr)
    raise ValueError(f"unknown lr scheduler {name!r}")
