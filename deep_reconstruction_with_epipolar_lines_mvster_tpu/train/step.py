"""Jitted train / eval steps.

Functional equivalent of the reference ``train_sample`` / ``test_sample_depth``
(``train_mvs4.py:299-462``): forward -> loss -> grads -> Adam update, plus the
scalar metric set. Designed for ``jax.jit`` with donated state; the same step
runs under a data-parallel mesh by sharding the batch (see ``parallel``).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from ..config import LossConfig
from ..models.losses import mvs4net_loss
from .metrics import depth_metrics


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    @classmethod
    def create(cls, variables, tx):
        params = variables["params"]
        return cls(
            step=jnp.zeros((), dtype=jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", FrozenDict({})),
            opt_state=tx.init(params),
        )


def make_optimizer(schedule, weight_decay: float = 0.0) -> optax.GradientTransformation:
    """Adam(betas=(0.9, 0.999)) with torch-style (L2-in-gradient) weight decay
    (reference train_mvs4.py:528)."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.adam(schedule, b1=0.9, b2=0.999))
    return optax.chain(*parts)


def image_summaries(
    outputs: Dict[str, Any], batch: Dict[str, Any], num_stages: int = 4
) -> Dict[str, jnp.ndarray]:
    """The reference's TB image set (train_mvs4.py:319-331,368-379), batch
    element 0 only (``save_images``/``make_grid`` logs ``img[:1]``,
    utils.py:82-91): masked/unmasked depth, GT, ref image, mask, abs error
    map and the 1/2/4/8 mm error masks."""
    last = f"stage{num_stages}"
    depth_est = outputs[last]["depth"][0]
    gt = batch["depth"][last][0]
    mask = batch["mask"][last][0]
    err = jnp.abs(depth_est - gt) * mask
    images = {
        "depth_est": depth_est * mask,
        "depth_est_nomask": depth_est,
        "depth_gt": batch["depth"]["stage2"][0],
        "ref_img": batch["imgs"][0, 0],
        "mask": batch["mask"]["stage1"][0],
        "errormap": err,
    }
    for t in (1, 2, 4, 8):
        images[f"errormap_{t}mm_mask"] = (
            (err < float(t)) & (mask > 0.5)
        ).astype(jnp.float32)
    # f16 halves the D2H transfer (the TB writer min-max normalizes on the
    # host anyway, so visualization precision is unaffected)
    return {k: v.astype(jnp.float16) for k, v in images.items()}


def make_train_step(
    model,
    loss_cfg: LossConfig,
    tx: optax.GradientTransformation,
    *,
    num_stages: int = 4,
    axis_name: str | None = None,
    with_images: bool = False,
) -> Callable[[TrainState, Dict[str, Any]], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the (jittable) train step.

    ``axis_name`` is set when the step runs under ``shard_map`` and gradients
    must be psum-averaged over the data axis (the DDP all-reduce equivalent,
    reference train_mvs4.py:344 + NCCL hook). Under plain ``jit`` with sharded
    inputs, XLA inserts the collectives automatically and ``axis_name`` stays
    None.
    """

    last = f"stage{num_stages}"

    def step_fn(state: TrainState, batch: Dict[str, Any]):
        def loss_fn(params):
            outputs, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["imgs"],
                batch["proj_matrices"],
                batch["depth_values"],
                train=True,
                mutable=["batch_stats"],
            )
            total, aux = mvs4net_loss(outputs, batch["depth"], batch["mask"], loss_cfg)
            return total, (aux, mutated["batch_stats"], outputs)

        (loss, (aux, new_stats, outputs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
            # sync the BN running stats across shards: each shard updates
            # them from its LOCAL batch, and without this the "replicated"
            # updated state would silently hold per-device values (torch DDP
            # keeps buffers synced too — broadcast_buffers=True rank-0
            # broadcast every forward; the pmean here instead folds every
            # shard's batch into the EMA, documented in parallel/mesh.py)
            new_stats = jax.lax.pmean(new_stats, axis_name)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )

        depth_est = outputs[last]["depth"]
        gt = batch["depth"][last]
        mask = batch["mask"][last] > 0.5
        scalars = {"loss": loss, **aux, **depth_metrics(depth_est, gt, mask)}
        if axis_name is not None:
            scalars = jax.lax.pmean(scalars, axis_name)
        if with_images:
            return new_state, scalars, image_summaries(outputs, batch, num_stages)
        return new_state, scalars

    return step_fn


def make_eval_step(
    model, loss_cfg: LossConfig, *, num_stages: int = 4, with_images: bool = False
) -> Callable[[TrainState, Dict[str, Any]], Dict[str, jnp.ndarray]]:
    """Validation step (reference test_sample_depth, train_mvs4.py:387-462):
    train-mode forward semantics but no grads/update, mono loss disabled."""

    import dataclasses

    eval_loss_cfg = dataclasses.replace(loss_cfg, mono=False)
    last = f"stage{num_stages}"

    def step_fn(state: TrainState, batch: Dict[str, Any]):
        outputs = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["imgs"],
            batch["proj_matrices"],
            batch["depth_values"],
            train=False,
        )
        # wrap-padded samples (uneven trailing val batch under a mesh,
        # parallel/mesh.py:pad_batch_to_multiple) are excluded from every
        # reduction: zeroing their pixel masks makes the masked loss/range
        # sums exact, and `valid` weights the per-image metric means
        valid = batch.get("valid")
        masks = batch["mask"]
        if valid is not None:
            masks = {k: v * valid[:, None, None] for k, v in masks.items()}
        total, aux = mvs4net_loss(outputs, batch["depth"], masks, eval_loss_cfg)
        depth_est = outputs[last]["depth"]
        gt = batch["depth"][last]
        mask = masks[last] > 0.5
        scalars = {
            "loss": total, **aux,
            **depth_metrics(depth_est, gt, mask, valid),
        }
        if with_images:
            return scalars, image_summaries(outputs, batch, num_stages)
        return scalars

    return step_fn
