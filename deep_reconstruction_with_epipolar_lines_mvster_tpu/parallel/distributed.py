"""Multi-host runtime helpers (SURVEY.md §2.8, §5.8).

Replaces the reference's NCCL process-group bootstrap
(``train_mvs4.py:479-484``: env-var init, barrier, rank gating) with the
JAX-native equivalents:

- ``init_distributed``: ``jax.distributed.initialize`` from env (no-op when
  single-process) — the ``init_method="env://"`` analog;
- ``host_mesh``: hybrid DCN x ICI mesh for multi-host slices
  (``mesh_utils.create_hybrid_device_mesh``) falling back to a flat mesh on
  one host;
- ``reduce_scalars_across_hosts``: global mean of a host-local scalar dict
  (the ``reduce_scalar_outputs`` analog, utils.py:187-205);
- ``sync_hosts``: barrier (utils.synchronize analog, utils.py:166-178);
- ``is_host0`` rank gating for logging/checkpointing.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def init_distributed(**kwargs) -> None:
    """Initialize the multi-process JAX runtime when launched multi-host
    (coordinator address etc. from env / TPU metadata). Safe no-op when the
    runtime is already initialized or single-process."""
    import jax

    if jax.process_count() > 1:
        return
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass  # single-process or already initialized


def is_host0() -> bool:
    import jax

    return jax.process_index() == 0


def host_mesh(space: int = 1):
    """Device mesh for the whole slice: data axis across hosts (DCN), space
    axis within a host (ICI) when requested."""
    import jax
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh

    n_local = jax.local_device_count()
    n_proc = jax.process_count()
    if n_proc > 1:
        try:
            devices = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(n_local // space, space),
                dcn_mesh_shape=(n_proc, 1),
            )
        except ValueError:
            # backends without slice topology (multi-process CPU/GPU): group
            # devices by owning process so the leading axis still maps
            # host-locality-first
            devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
            devices = np.asarray(devs).reshape(n_proc, n_local // space, space)
        return Mesh(devices.reshape(n_proc * (n_local // space), space),
                    axis_names=("data", "space"))
    from .mesh import make_mesh

    return make_mesh(space=space)


def sync_hosts(name: str = "barrier") -> None:
    import jax

    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def reduce_scalars_across_hosts(scalars: Dict[str, float]) -> Dict[str, float]:
    """Mean of each scalar over hosts (rank-0 result everywhere)."""
    import jax

    if jax.process_count() == 1:
        return {k: float(v) for k, v in scalars.items()}
    from jax.experimental import multihost_utils

    keys = sorted(scalars)
    vec = np.asarray([float(scalars[k]) for k in keys], dtype=np.float32)
    summed = multihost_utils.process_allgather(vec).sum(axis=0)
    world = jax.process_count()
    return {k: float(summed[i] / world) for i, k in enumerate(keys)}
