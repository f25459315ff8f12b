"""Parse a jax.profiler trace.json.gz into per-category / per-op tables
with FLOPs and bytes (usage: python _trace_table.py <logdir> <chain> [top]).
"""
import glob
import gzip
import json
import sys
from collections import defaultdict


def table(logdir, chain, top=30):
    paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace found", flush=True)
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        tr = json.load(f)
    by_cat = defaultdict(float)
    by_op = defaultdict(lambda: [0.0, 0.0, 0.0])  # dur_us, flops, bytes
    for e in tr["traceEvents"]:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        a = e.get("args") or {}
        cat = a.get("hlo_category")
        if not cat:
            continue
        d = float(a.get("device_duration_ps", 0)) / 1e6 or float(e["dur"])
        by_cat[cat] += d
        rec = by_op[(cat, e["name"])]
        rec[0] += d
        rec[1] += float(a.get("model_flops", 0) or 0)
        rec[2] += float(a.get("bytes_accessed", 0) or 0)
    tot = sum(by_cat.values())
    print(f"device total {tot/1e3/chain:.1f} ms/iter; by category:")
    for c, d in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"    {d/1e3/chain:6.2f}  {c}")
    print(f"top ops (ms/iter, TFLOP/s, GB/s):")
    for (c, nm), (d, fl, by) in sorted(
        by_op.items(), key=lambda kv: -kv[1][0]
    )[:top]:
        ds = d / 1e6  # seconds total
        tf = fl / ds / 1e12 if ds else 0
        gb = by / ds / 1e9 if ds else 0
        print(f"    {d/1e3/chain:6.2f} {tf:6.1f} {gb:6.0f}  "
              f"{c[:14]:14s} {nm}")


if __name__ == "__main__":
    table(sys.argv[1], int(sys.argv[2]),
          int(sys.argv[3]) if len(sys.argv) > 3 else 30)
