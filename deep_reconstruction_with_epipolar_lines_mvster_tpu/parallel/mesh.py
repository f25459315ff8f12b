"""Device mesh + sharding setup (the DDP/NCCL replacement — SURVEY.md §2.8).

One ``jax.sharding.Mesh`` over the slice with axes ``('data', 'space')``:

- ``data``: batch sharding for training (gradients psum over ICI inside the
  jitted step — replaces ``DistributedDataParallel`` + NCCL all-reduce,
  reference train_mvs4.py:479-484,562-570);
- ``space``: optional spatial (image-row) sharding for high-res eval — the
  closest thing this workload has to context parallelism (SURVEY.md §5.7).

Parameters/optimizer state are replicated; batches are sharded on ``data``.
XLA inserts the gradient all-reduce automatically under ``jit`` with these
shardings — no hand-written collectives needed for DP.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Sequence | None = None,
    *,
    data: int | None = None,
    space: int = 1,
) -> Mesh:
    """Mesh over ``devices`` (default: all) with ``data x space`` layout.

    On multi-host slices, callers should pass
    ``mesh_utils.create_hybrid_device_mesh`` output so the data axis rides
    DCN and space rides ICI; on a single host any contiguous layout works.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // space
    if data * space != n:
        raise ValueError(f"data({data}) * space({space}) != #devices({n})")
    arr = np.asarray(devices).reshape(data, space)
    return Mesh(arr, axis_names=("data", "space"))


def batch_spec(*, with_valid: bool = False) -> Dict[str, Any]:
    """PartitionSpecs for the sample-dict pytree: batch axis over 'data'.
    ``with_valid`` adds the per-sample validity mask pad_batch_to_multiple
    attaches to uneven trailing val batches."""
    stage_dict = {f"stage{i}": P("data") for i in range(1, 5)}
    spec = {
        "imgs": P("data"),
        "proj_matrices": dict(stage_dict),
        "depth": dict(stage_dict),
        "depth_values": P("data"),
        "mask": dict(stage_dict),
    }
    if with_valid:
        spec["valid"] = P("data")
    return spec


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch onto the mesh, sharded along the batch axis.
    Extra keys outside the sample spec (e.g. test-fixture extras) are
    dropped."""
    specs = batch_spec(with_valid="valid" in batch)

    def place(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    out: Dict[str, Any] = {}
    for k, spec in specs.items():
        if k not in batch:
            continue
        if isinstance(spec, dict):
            out[k] = {kk: place(batch[k][kk], ss) for kk, ss in spec.items()}
        else:
            out[k] = place(batch[k], spec)
    return out


def pad_batch_to_multiple(batch: Dict[str, Any], mult: int) -> Dict[str, Any]:
    """Pad every leaf's batch axis up to a multiple of ``mult`` by wrapping
    indices (sample i pads as sample ``i % n``), attaching a per-sample
    ``"valid"`` float mask (1 real, 0 padded).

    Used for the validation loop under a device mesh: the reference keeps
    ``drop_last=False`` on the val loader (train_mvs4.py:595,598), so the
    trailing batch can be smaller than the data-axis size; padding satisfies
    GSPMD's divisibility rule. The eval step consumes ``valid`` to exclude
    padded samples from every loss/metric reduction (train/step.py,
    train/metrics.py), so the trailing batch's scalars equal an unpadded
    single-device run exactly (tests/test_parallel.py)."""
    leaves = jax.tree_util.tree_leaves(batch)
    n = leaves[0].shape[0]
    pad = (-n) % mult
    if pad == 0:
        return batch
    idx = np.arange(n + pad) % n
    out = jax.tree_util.tree_map(lambda x: np.asarray(x)[idx], batch)
    out["valid"] = (np.arange(n + pad) < n).astype(np.float32)
    return out


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (params / optimizer state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def shard_eval_forward(forward, mesh: Mesh):
    """Jit an eval forward with the image height sharded over the ``space``
    axis (and batch over ``data``) — the spatial-sharding path for high-res
    eval (SURVEY.md §5.7: the closest thing this workload has to context
    parallelism). The homography warp gathers across row shards; GSPMD
    resolves them with ICI collectives automatically.

    ``forward(variables, imgs, proj_matrices, depth_values)``;
    imgs ``[B, V, H, W, 3]`` with H sharded.
    """
    repl = NamedSharding(mesh, P())
    img_sharding = NamedSharding(mesh, P("data", None, "space", None, None))
    proj_sharding = {f"stage{i}": NamedSharding(mesh, P("data")) for i in range(1, 5)}
    dv_sharding = NamedSharding(mesh, P("data"))
    out_sharding = NamedSharding(mesh, P("data", "space", None))
    return jax.jit(
        forward,
        in_shardings=(repl, img_sharding, proj_sharding, dv_sharding),
        out_shardings=(out_sharding, out_sharding),
    )


def shard_eval_forward_shard_map(forward, mesh: Mesh):
    """shard_map eval forward: batch sharded over ``data``, params
    replicated, the model body executed per shard on LOCAL shapes — so the
    eval-path Pallas kernels (v3 warp forward, fused top-down level) shard
    across chips instead of being gathered/replicated by the GSPMD
    partitioner (which cannot partition ``pallas_call``).

    Same signature as :func:`shard_eval_forward`. For spatial (row) sharding
    of Pallas-kernel configs use :func:`shard_eval_forward_space`, which
    drives the model's halo-windowed row decomposition over the ``space``
    axis; this wrapper shards the batch only (a custom ``forward`` may still
    use the ``space`` axis itself — inputs are replicated over it).
    """
    fn = jax.shard_map(
        forward,
        mesh=mesh,
        in_specs=(
            P(),
            P("data"),
            {f"stage{i}": P("data") for i in range(1, 5)},
            P("data"),
        ),
        out_specs=(P("data"), P("data")),
        check_vma=False,
    )
    return jax.jit(fn)


def shard_eval_forward_space(model, mesh: Mesh, *, space_halo: int = 48):
    """shard_map eval forward over the 2-D ``(data, space)`` mesh with the
    model's row-sharded cost-volume pipeline (models/mvs4net.py
    ``space_axis`` — backbone replicated over ``space``, warp/reg/readout
    windowed by output rows with a U-Net-receptive-field halo, depth rows
    all-gathered between stages). Pallas kernels execute on per-shard local
    row windows, so the flagship eval config spatially shards — the case
    GSPMD cannot partition (it would gather/replicate ``pallas_call``).

    Returns a jitted ``fn(variables, imgs, projs, dv) -> (depth, conf)``
    with batch sharded over ``data`` and rows computed over ``space``;
    results are bit-identical to the unsharded forward
    (tests/test_spatial_sharding.py).
    """
    n_space = mesh.shape["space"]
    last = f"stage{model.cfg.num_stages}"

    def forward(variables, imgs, projs, dv):
        out = model.apply(
            variables, imgs, projs, dv, train=False,
            space_axis="space", space_shards=n_space, space_halo=space_halo,
        )
        return out[last]["depth"], out[last]["photometric_confidence"]

    fn = jax.shard_map(
        forward,
        mesh=mesh,
        in_specs=(
            P(),
            P("data"),
            {f"stage{i}": P("data") for i in range(1, 5)},
            P("data"),
        ),
        out_specs=(P("data"), P("data")),
        check_vma=False,
    )
    return jax.jit(fn)


def shard_train_step(train_step, mesh: Mesh, *, with_images: bool = False):
    """Jit the train step with replicated state and data-sharded batches.

    The gradient all-reduce over the ``data`` axis is inserted by XLA (GSPMD)
    because the loss reduces over a sharded batch while parameters are
    replicated — the TPU-native equivalent of DDP's backward hook.
    ``with_images``: the step also returns the TB image-summary dict
    (batch element 0 — replicated out so host 0 can fetch it whole).

    NOTE: GSPMD cannot partition ``pallas_call`` custom kernels — under this
    wrapper the x-banded warp backward's operands get gathered/replicated
    (correct, but it stops scaling). For multi-chip training of configs that
    use the Pallas kernels, prefer :func:`shard_train_step_shard_map`.
    """
    state_sharding = NamedSharding(mesh, P())
    batch_shardings = jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), batch_spec()
    )
    out_shardings = (state_sharding,) * (3 if with_images else 2)
    return jax.jit(
        train_step,
        in_shardings=(state_sharding, batch_shardings),
        out_shardings=out_shardings,
        donate_argnums=(0,),
    )


def shard_train_step_shard_map(train_step, mesh: Mesh, *, with_images: bool = False):
    """shard_map version of :func:`shard_train_step` (the scaling-book
    recipe): the step body runs per shard on its LOCAL batch slice with an
    explicit gradient ``pmean`` over the ``data`` axis — build the step with
    ``make_train_step(..., axis_name="data")``.

    Unlike GSPMD jit, everything inside — including ``pallas_call`` kernels
    (the x-banded warp backward) — executes on per-shard local shapes, so
    custom kernels shard instead of being replicated. State is replicated;
    since the pmean'd gradients are identical on every shard, the updated
    state is replicated by construction (``check_rep=False`` because the
    checker cannot prove that through the optimizer update).

    BatchNorm semantics: train-mode NORMALIZATION uses the LOCAL batch
    shard's statistics — exactly the reference's per-GPU DDP BatchNorm —
    while the RUNNING stats are pmean-synced across shards inside the step
    (train/step.py), keeping the updated state truly replicated (torch DDP
    likewise keeps buffers synced via its default rank-0 broadcast; the
    pmean folds every shard's batch into the EMA instead of only rank 0's).
    The GSPMD variant instead normalizes over the GLOBAL batch (SyncBN-like)
    because the batch dimension is merely sharded, not split. Both are
    valid DP trainings; they differ numerically on distinct samples.
    """
    n_out = 3 if with_images else 2
    fn = jax.shard_map(
        train_step,
        mesh=mesh,
        in_specs=(P(), batch_spec()),
        out_specs=(P(),) * n_out,
        # replication of the updated state can't be proven through the
        # optimizer update; it holds by construction (pmean'd grads)
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(0,))
