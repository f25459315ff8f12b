"""Benchmark: eval-forward depth-map generation rate on one chip.

Measures the reference's headline eval speed metric — forward time per view /
depth-maps per second (reference prints this per run, test_mvs4.py:408-427,600;
BASELINE.md) — at the canonical eval shape: 512x640, NviewGen=4 views, the
DTU recipe model (group_cor 8,8,4,4 / inverse depth / attn_temp 2).

Measurement method: CHAIN data-dependent forward passes chained inside ONE
jitted ``lax.scan`` (each iteration perturbs the input with the previous
result so the device must execute them sequentially), then a scalar fetch.
This is robust on backends where ``block_until_ready`` acks dispatch rather
than completion (the remote-tunnel backend here does exactly that — probed)
and avoids timing host<->device transfer of full depth maps.

Statistics (round 5, VERDICT #4): the compiled program stays pinned at
B=4/CHAIN=5 for cross-round comparability, but each timing GROUP threads a
scalar carry through ROUNDS=10 back-to-back dispatches of that program (the
carry makes each dispatch data-depend on the previous, so the device runs
them sequentially with no host sync between them) and fetches ONE scalar at
the end. This amortizes the per-fetch HTTP-tunnel round trip (~30 ms, the
round-4 driver-vs-builder 3% gap) to <1% of the group. The metric is the
median over GROUPS=3 groups; the max-min RANGE of the group rates is
reported alongside as ``spread_maps_per_s``.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"spread_maps_per_s", "groups_maps_per_s"}.
The reference publishes no number for this metric (BASELINE.json published={})
so vs_baseline is the ratio against the first recorded bench of this repo if
available, else 1.0.
"""

from __future__ import annotations

import json
import os
import time


def _require_backend(timeout_s: float = 300.0):
    """Fail fast with a diagnosable message if the tunnel backend is down
    (observed failure mode: ``jax.devices()`` blocks for minutes and then
    raises "Unable to initialize backend 'axon'"). Probe device init in a
    subprocess so a hang cannot stall the whole bench run."""
    import subprocess
    import sys

    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, check=True, capture_output=True,
        )
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as e:
        raise SystemExit(
            f"bench: TPU backend unavailable ({type(e).__name__}); "
            "the axon tunnel is down — retry when it recovers"
        )


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge

    _require_backend()
    model = ge._dtu_model()
    B = 4
    CHAIN = 5
    batch = ge._example_batch(B=B, V=4, H=512, W=640)
    variables = ge._init_on_cpu(model, batch)

    @jax.jit
    def chained(carry0, variables, imgs, projs, dv):
        def body(carry, _):
            out = model.apply(
                variables, imgs + carry * 1e-12, projs, dv, train=False
            )
            d = out["stage4"]["depth"]
            return d.mean().astype(imgs.dtype), None

        c, _ = jax.lax.scan(body, carry0, length=CHAIN)
        return c

    args = (variables, batch["imgs"], batch["proj_matrices"], batch["depth_values"])

    ROUNDS, GROUPS = 10, 3
    # warmup: compile + four full dispatches (first-dispatch effects AND
    # clock ramp excluded — r5 groups showed 77.6 then 80.9/81.1 with only
    # two warmup dispatches)
    c = jnp.zeros((), batch["imgs"].dtype)
    for _ in range(4):
        c = chained(c, *args)
    float(c)  # host read of the scalar = true completion

    group_rates = []
    for _ in range(GROUPS):
        c = jnp.zeros((), batch["imgs"].dtype)
        t0 = time.perf_counter()
        for _ in range(ROUNDS):
            c = chained(c, *args)  # data-dependent: device serializes
        float(c)  # one completion fetch per group
        dt = time.perf_counter() - t0
        group_rates.append((B * CHAIN * ROUNDS) / dt)
    group_rates.sort()
    maps_per_s = group_rates[len(group_rates) // 2]
    spread = group_rates[-1] - group_rates[0]

    baseline = None
    for fname in sorted(os.listdir(".")):
        if fname.startswith("BENCH_r") and fname.endswith(".json"):
            try:
                with open(fname) as f:
                    rec = json.load(f)
                # the driver wraps the metric under "parsed"
                baseline = rec.get("value") or rec.get("parsed", {}).get("value")
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
                "spread_maps_per_s": round(spread, 3),
                "groups_maps_per_s": [round(r, 3) for r in group_rates],
            }
        )
    )


if __name__ == "__main__":
    main()
