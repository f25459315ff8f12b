#!/usr/bin/env python
"""Throughput-scaling harness: train-step steps/s at 1, 2, ..., N devices
(data-parallel mesh). Run on a multi-chip slice; prints a JSON line per mesh
size with scaling efficiency vs 1 device (BASELINE.md target: >= 80%).

On a single-chip machine this degenerates to the 1-device row.
"""

import json
import time


def main(argv=None):
    import sys

    args = (argv if argv is not None else sys.argv[1:]) or []
    import jax
    import jax.numpy as jnp

    from deep_reconstruction_with_epipolar_lines_mvster_tpu.config import (
        LossConfig,
        ModelConfig,
    )
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.data.synthetic import (
        batch_samples,
        make_plane_scene,
    )
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.models import MVS4Net
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.parallel import (
        make_mesh,
        replicate,
        shard_batch,
        shard_train_step,
    )
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.train import (
        TrainState,
        make_optimizer,
        make_train_step,
    )
    from deep_reconstruction_with_epipolar_lines_mvster_tpu.train.schedule import (
        warmup_multistep,
    )

    cfg = ModelConfig(
        group_cor=True, group_cor_dim=(8, 8, 4, 4), inverse_depth=True,
        mono=True, dtype="bfloat16",
    )
    lcfg = LossConfig(inverse_depth=True, mono=True, l1_lw=0.003, ot_iter=3)
    # optional overrides: H W V per_device_batch (small shapes let the table
    # run functionally on the virtual CPU mesh; efficiency numbers are only
    # meaningful on real multi-chip hardware)
    H = int(args[0]) if len(args) > 0 else 512
    W = int(args[1]) if len(args) > 1 else 640
    V = int(args[2]) if len(args) > 2 else 5
    per_device_batch = int(args[3]) if len(args) > 3 else 2

    model = MVS4Net(cfg)
    devices = jax.devices()
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    base_rate = None
    for n in sizes:
        B = per_device_batch * n
        batch = batch_samples(
            [make_plane_scene(V=V, H=H, W=W, seed=i) for i in range(B)]
        )
        for k in ("view_depths", "intrinsics", "extrinsics"):
            batch.pop(k)
        mesh = make_mesh(devices[:n], space=1)
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(batch["imgs"][:1]),
            jax.tree_util.tree_map(lambda x: jnp.asarray(x[:1]), batch["proj_matrices"]),
            jnp.asarray(batch["depth_values"][:1]),
            train=True,
        )
        tx = make_optimizer(warmup_multistep(1e-3, [100000], 0.5), 1e-4)
        state = replicate(TrainState.create(variables, tx), mesh)
        sharded = shard_batch(batch, mesh)
        step = shard_train_step(make_train_step(model, lcfg, tx), mesh)
        with mesh:
            state, sc = step(state, sharded)
            jax.block_until_ready(sc)
            t0 = time.perf_counter()
            iters = 5
            for _ in range(iters):
                state, sc = step(state, sharded)
            jax.block_until_ready(sc)
        dt = (time.perf_counter() - t0) / iters
        rate = B / dt  # samples/s
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * n)
        print(json.dumps({
            "devices": n, "global_batch": B, "step_s": round(dt, 4),
            "samples_per_s": round(rate, 2), "scaling_efficiency": round(eff, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
