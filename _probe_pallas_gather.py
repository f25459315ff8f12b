"""Probe: does Mosaic support dynamic vector gathers inside a pallas kernel?"""
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def kernel(src_ref, idx_ref, out_ref):
    src = src_ref[:]            # [S, C]
    idx = idx_ref[:]            # [N, 1] int32
    out_ref[:] = jnp.take_along_axis(src, jnp.broadcast_to(idx, (idx.shape[0], src.shape[1])), axis=0)

S, C, N = 256, 128, 128
src = jnp.arange(S*C, dtype=jnp.float32).reshape(S, C)
idx = jnp.asarray(np.random.default_rng(0).integers(0, S, (N,1)), dtype=jnp.int32)
try:
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(src, idx)
    expect = np.asarray(src)[np.asarray(idx)[:,0]]
    print("GATHER-OK", np.abs(np.asarray(out)-expect).max())
except Exception as e:
    print("GATHER-FAIL", type(e).__name__, str(e)[:500])

# also probe take along last axis (lane gather)
def kernel2(src_ref, idx_ref, out_ref):
    src = src_ref[:]            # [R, S]
    idx = idx_ref[:]            # [R, N]
    out_ref[:] = jnp.take_along_axis(src, idx, axis=1)
R, S2, N2 = 8, 512, 256
src2 = jnp.arange(R*S2, dtype=jnp.float32).reshape(R, S2)
idx2 = jnp.asarray(np.random.default_rng(1).integers(0, S2, (R, N2)), dtype=jnp.int32)
try:
    out2 = pl.pallas_call(
        kernel2,
        out_shape=jax.ShapeDtypeStruct((R, N2), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(src2, idx2)
    expect2 = np.take_along_axis(np.asarray(src2), np.asarray(idx2), axis=1)
    print("LANE-GATHER-OK", np.abs(np.asarray(out2)-expect2).max())
except Exception as e:
    print("LANE-GATHER-FAIL", type(e).__name__, str(e)[:500])
