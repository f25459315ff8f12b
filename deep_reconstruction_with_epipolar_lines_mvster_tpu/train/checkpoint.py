"""Checkpoint save / resume / warm-start.

Reference semantics (train_mvs4.py:193-201, 532-555):
- save ``{logdir}/model_{epoch:02d}.ckpt`` every ``save_freq`` epochs with
  model + optimizer state + epoch;
- ``--resume``: pick the latest ckpt by epoch suffix, restore model AND
  optimizer, continue at epoch+1 (the reference also rewrites the
  scheduler's initial LR — our schedules are pure functions of the step
  counter, which is restored, so that hack is unnecessary);
- ``--loadckpt`` warm start: model weights only.

Format: flax msgpack serialization of the full TrainState pytree (single
file, host-local). Multihost callers should gate saving on process 0.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import jax
import numpy as np
from flax import serialization

from .step import TrainState

_CKPT_RE = re.compile(r"model_(\d+)\.ckpt$")


def checkpoint_path(logdir: str, epoch: int) -> str:
    return os.path.join(logdir, f"model_{epoch:02d}.ckpt")


def save_checkpoint(logdir: str, epoch: int, state: TrainState) -> str:
    os.makedirs(logdir, exist_ok=True)
    payload = {
        "epoch": np.asarray(epoch, dtype=np.int32),
        "state": jax.tree_util.tree_map(np.asarray, state),
    }
    path = checkpoint_path(logdir, epoch)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(payload))
    os.replace(tmp, path)
    return path


def find_latest_checkpoint(logdir: str) -> Optional[str]:
    if not os.path.isdir(logdir):
        return None
    best = None
    best_epoch = -1
    for fn in os.listdir(logdir):
        m = _CKPT_RE.search(fn)
        if m and int(m.group(1)) > best_epoch:
            best_epoch = int(m.group(1))
            best = os.path.join(logdir, fn)
    return best


def restore_checkpoint(path: str, state_template: TrainState) -> Tuple[TrainState, int]:
    """Full resume: restores the TrainState (params + batch stats + optimizer
    + step) and returns (state, start_epoch)."""
    template = {
        "epoch": np.asarray(0, dtype=np.int32),
        "state": state_template,
    }
    with open(path, "rb") as f:
        payload = serialization.from_bytes(template, f.read())
    return payload["state"], int(payload["epoch"]) + 1


def load_weights(path: str, variables_template: Any, model_cfg: Any = None) -> Any:
    """Warm start (reference --loadckpt): model params + batch stats only, no
    optimizer/epoch. ``variables_template`` is a {'params', 'batch_stats'}
    dict; restore is strict (structure must match).

    Reference PyTorch checkpoints (``torch.save`` zip/pickle files, e.g. the
    released DTU weights) are detected by magic bytes and transplanted
    through ``utils.torch_port`` when ``model_cfg`` is provided."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] == b"PK\x03\x04" or data[:2] == b"\x80\x02":
        if model_cfg is None:
            raise ValueError(
                f"{path} is a PyTorch checkpoint; pass model_cfg so it can "
                "be transplanted (utils.torch_port.load_reference_checkpoint)"
            )
        from ..utils.torch_port import load_reference_checkpoint

        converted = load_reference_checkpoint(path, variables_template, model_cfg)
        return {**dict(variables_template), **converted}
    # opt_state structure is unknown to the caller; deserialize leniently by
    # reading the raw dict and picking the model subtrees.
    raw = serialization.msgpack_restore(data)
    out = dict(variables_template)
    out["params"] = serialization.from_state_dict(
        variables_template["params"], raw["state"]["params"]
    )
    if "batch_stats" in variables_template:
        out["batch_stats"] = serialization.from_state_dict(
            variables_template["batch_stats"], raw["state"]["batch_stats"]
        )
    return out
