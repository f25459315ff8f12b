"""Benchmark: eval-forward depth-map generation rate on one chip.

Measures the reference's headline eval speed metric — forward time per view /
depth-maps per second (reference prints this per run, test_mvs4.py:408-427,600;
BASELINE.md) — at the canonical eval shape: 512x640, NviewGen=4 views, the
DTU recipe model (group_cor 8,8,4,4 / inverse depth / attn_temp 2).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no number for this metric (BASELINE.json published={})
so vs_baseline is the ratio against the first recorded bench of this repo if
available, else 1.0.
"""

from __future__ import annotations

import json
import os
import time


def main():
    import jax

    import __graft_entry__ as ge

    model = ge._dtu_model()
    batch = ge._example_batch(B=1, V=4, H=512, W=640)
    variables = model.init(
        jax.random.PRNGKey(0),
        batch["imgs"],
        batch["proj_matrices"],
        batch["depth_values"],
        train=False,
    )

    @jax.jit
    def fn(variables, imgs, projs, dv):
        out = model.apply(variables, imgs, projs, dv, train=False)
        return out["stage4"]["depth"], out["stage4"]["photometric_confidence"]

    args = (variables, batch["imgs"], batch["proj_matrices"], batch["depth_values"])

    # warmup / compile
    for _ in range(2):
        d, c = fn(*args)
        jax.block_until_ready((d, c))

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        d, c = fn(*args)
    jax.block_until_ready((d, c))
    dt = time.perf_counter() - t0
    maps_per_s = iters / dt

    baseline = None
    for fname in sorted(os.listdir(".")):
        if fname.startswith("BENCH_r") and fname.endswith(".json"):
            try:
                with open(fname) as f:
                    rec = json.load(f)
                baseline = rec.get("value", baseline)
                break  # earliest round
            except Exception:
                pass
    vs = maps_per_s / baseline if baseline else 1.0

    print(
        json.dumps(
            {
                "metric": "depth_maps_per_s_512x640_v4",
                "value": round(maps_per_s, 3),
                "unit": "maps/s",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
