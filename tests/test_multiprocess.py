"""Two-process multihost smoke (VERDICT round-1 item 9): launch two real
``jax.distributed`` processes over the CPU backend and exercise the actual
collective paths that single-process tests can only stub:

- ``reduce_scalars_across_hosts`` (process_allgather mean),
- ``host_mesh`` (hybrid DCN x ICI mesh) + a pjit'ed global-array reduction,
- per-host DataLoader sharding (disjoint, complete cover),
- ``sync_hosts`` barrier.

Reference analog: the NCCL process-group bootstrap + reduce_scalar_outputs
(train_mvs4.py:479-484, utils.py:166-205).
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest

CHILD = r"""
import os, sys
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

rank = int(sys.argv[1])
port = sys.argv[2]
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=rank
)
assert jax.process_count() == 2, jax.process_count()

from deep_reconstruction_with_epipolar_lines_mvster_tpu.parallel.distributed import (
    host_mesh,
    reduce_scalars_across_hosts,
    sync_hosts,
)

# 1. cross-host scalar mean: rank 0 reports 0.0, rank 1 reports 1.0 -> 0.5
out = reduce_scalars_across_hosts({"loss": float(rank), "n": 1.0})
assert abs(out["loss"] - 0.5) < 1e-6, out
assert abs(out["n"] - 1.0) < 1e-6, out

# 2. hybrid mesh + a global sharded reduction through it
mesh = host_mesh(space=1)
n_global = mesh.devices.size
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils

local = np.arange(
    rank * 4 * jax.local_device_count(), (rank + 1) * 4 * jax.local_device_count(),
    dtype=np.float32,
)
garr = multihost_utils.host_local_array_to_global_array(local, mesh, P("data"))
total = jax.jit(
    lambda x: jnp.sum(x),
    in_shardings=NamedSharding(mesh, P("data")),
    out_shardings=NamedSharding(mesh, P()),
)(garr)
expect = sum(range(8 * jax.local_device_count()))
got = float(total)  # out_shardings P() -> fully replicated, host-readable
assert abs(got - expect) < 1e-3, (got, expect)

# 3. per-host loader sharding covers the index space disjointly
from deep_reconstruction_with_epipolar_lines_mvster_tpu.data.loader import DataLoader

class Idx:
    def __len__(self):
        return 16
    def __getitem__(self, i):
        return {"i": np.asarray([i])}

dl = DataLoader(Idx(), 2, shuffle=False, num_workers=0, num_hosts=2, host_id=rank)
mine = sorted(int(b["i"][j, 0]) for b in dl for j in range(b["i"].shape[0]))
allidx = multihost_utils.process_allgather(
    np.asarray(mine, dtype=np.int32)
)
merged = sorted(int(x) for x in np.asarray(allidx).ravel())
assert merged == list(range(16)), merged

sync_hosts("done")
print(f"RANK{rank}_OK", flush=True)
"""


def test_two_process_cpu_smoke(tmp_path):
    script = tmp_path / "child.py"
    script.write_text(CHILD)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(rank), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, cwd=repo_root,
        )
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out.decode(errors="replace"))
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"RANK{rank}_OK" in out, out
