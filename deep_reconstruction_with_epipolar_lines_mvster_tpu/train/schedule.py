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


def exponent(base_lr: float, steps_per_epoch: int, gamma: float = 0.17):
    """Per-EPOCH exponential decay, ``lr = base * 0.17 ** epoch``.

    The reference's branch (train_mvs4.py:136) constructs ``ExponentialLR``
    but assigns it to the wrong name, so it never steps — the *intended*
    semantics (ExponentialLR stepped once per epoch) are implemented here.
    The schedule is a pure function of the optimizer step, so it converts
    step -> epoch via ``steps_per_epoch``.
    """
    spe = max(1, int(steps_per_epoch))

    def schedule(step):
        epoch = jnp.asarray(step, dtype=jnp.int32) // spe
        return base_lr * gamma ** epoch.astype(jnp.float32)

    return schedule


def cyclic_tri2(base_lr: float, max_lr: float, step_size_up: int = 4):
    """CyclicLR ``mode="triangular2"`` (reference train_mvs4.py:131-134:
    ``base_lr=lr, max_lr=lr*100, step_size_up=4``), stepped per iteration
    like the reference's ``lr_scheduler.step()`` in the batch loop
    (train_mvs4.py:157).

    torch formula: ``cycle = floor(1 + step/(2*up))``,
    ``x = |step/up - 2*cycle + 1|``,
    ``lr = base + (max-base) * max(0, 1-x) / 2**(cycle-1)``.
    """
    up = float(step_size_up)

    def schedule(step):
        s = jnp.asarray(step, dtype=jnp.float32)
        cycle = jnp.floor(1.0 + s / (2.0 * up))
        x = jnp.abs(s / up - 2.0 * cycle + 1.0)
        amp = jnp.maximum(0.0, 1.0 - x) * 2.0 ** (1.0 - cycle)
        return base_lr + (max_lr - base_lr) * amp

    return schedule


def make_schedule(
    name: str,
    base_lr: float,
    *,
    milestones_iters: Sequence[int] = (),
    gamma: float = 0.5,
    total_steps: int = 0,
    warmup_iters: int = 500,
    steps_per_epoch: int = 1,
):
    if name == "MS":
        return warmup_multistep(
            base_lr, milestones_iters, gamma, warmup_iters=warmup_iters
        )
    if name == "cos":
        return cosine(base_lr, total_steps)
    if name == "onecycle":
        return onecycle(base_lr, total_steps)
    if name == "CyclicLR_tri2":
        return cyclic_tri2(base_lr, base_lr * 100.0, step_size_up=4)
    if name == "exponent":
        return exponent(base_lr, steps_per_epoch)
    raise ValueError(f"unknown lr scheduler {name!r}")
