"""PROTOTYPE: banded-matmul small-C 3x3 conv in the warp-kernel layout.

The reg U-Net's convs execute width-packed (ops/packed_conv.py) at
~190 TFLOP/s on 16x pack-inflated FLOPs. The alternative this prototype
measures (BENCH_NOTES r5 close-out; VERDICT r4 #2) is a hand kernel in the
channels-in-sublanes layout ``[N, H*C, W]`` whose row/channel contraction
is a static block-banded matmul:

    Y[r*Co + co, w] = sum_{dy, dx, ci} A_dx[r*Co+co, (r+dy)*Ci+ci]
                                        * X[(r0-1+r+dy)*Ci+ci, w+dx-1]

Per (image, row-tile) grid cell: one halo DMA of ``(TR+2)*Ci`` rows, the
dx in {-1,0,+1} column taps via static lane rolls + border masks, THREE
matmuls ``[TR*Co, (TR+2)*Ci] @ [(TR+2)*Ci, W]`` (banded-A FLOP inflation
(TR+2)/3 vs the true conv — 2.5x at TR=8 against width-packing's 16x),
fused scale/bias/ReLU epilogue, one output write.

Eligibility contract of the prototype: stride 1, 3x3, symmetric pad 1 in
H and W, H % TR == 0, input pre-padded by one zero row top AND bottom
(``Hp = H + 2``), W a 128-lane multiple with zero column padding (the
roll wrap-around then lands on zeros; the dx masks kill the one
remaining wrong column at each border).

Measured on chip at the bench conv0 shape — see _probe_r5o.out and the
BENCH_NOTES round-5 close-out — as the go/no-go datum for a round-6
banded reg U-Net. NOT wired into the model.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def band_matrices(K: jnp.ndarray, TR: int) -> jnp.ndarray:
    """Expand a ``[3, 3, Ci, Co]`` HWIO kernel into the three static
    banded-A matrices ``A[dx] = [TR*Co, (TR+2)*Ci]`` (trace-time set_index
    updates on a tiny constant — runs once per jit trace)."""
    Ci, Co = K.shape[2], K.shape[3]
    A = jnp.zeros((3, TR * Co, (TR + 2) * Ci), K.dtype)
    for dy in range(3):
        blk = jnp.transpose(K[dy], (0, 2, 1))  # [3(dx), Co, Ci]
        for r in range(TR):
            A = A.at[
                :, r * Co : (r + 1) * Co,
                (r + dy) * Ci : (r + dy + 1) * Ci
            ].set(blk)
    return A


def _kernel(x_ref, a_ref, sb_ref, out_ref, halo_vmem, sem, *, TR: int,
            Ci: int, Co: int, W: int):
    n = pl.program_id(0)
    t = pl.program_id(1)
    # halo DMA: rows (t*TR) .. (t*TR + TR+2) of the H+2-padded input
    cp = pltpu.make_async_copy(
        x_ref.at[n, pl.ds(t * TR * Ci, (TR + 2) * Ci)], halo_vmem, sem
    )
    cp.start()
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, x_ref.shape[2]), 1)
    mask_l = (lane >= 1).astype(jnp.float32)       # dx=-1 invalid at w=0
    mask_r = (lane < W - 1).astype(jnp.float32)    # dx=+1 invalid at w=W-1
    cp.wait()
    x = halo_vmem[:].astype(jnp.float32)
    acc = jax.lax.dot_general(
        a_ref[1].astype(jnp.float32), x, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    xl = pltpu.roll(x, 1, 1) * mask_l              # x[w-1] at column w
    acc += jax.lax.dot_general(
        a_ref[0].astype(jnp.float32), xl, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    xr = pltpu.roll(x, x.shape[1] - 1, 1) * mask_r  # x[w+1] at column w
    acc += jax.lax.dot_general(
        a_ref[2].astype(jnp.float32), xr, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scale = sb_ref[0]  # [TR*Co, 1]-broadcastable rows? stored [2, TRCo, 1]
    bias = sb_ref[1]
    out_ref[0] = jnp.maximum(acc * scale + bias, 0.0).astype(out_ref.dtype)


def band_conv3x3(
    x: jnp.ndarray,          # [N, H, Ci, W] channels-in-sublanes, W 128-mult
    K: jnp.ndarray,          # [3, 3, Ci, Co] HWIO
    scale: jnp.ndarray,      # [Co] fused BN scale
    bias: jnp.ndarray,       # [Co] fused BN bias
    *,
    w_real: int,             # logical width (<= padded lane width)
    tile_rows: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:            # [N, H, Co, W]
    N, H, Ci, Wp = x.shape
    TR = tile_rows
    Co = K.shape[3]
    assert H % TR == 0
    # one zero halo row top+bottom, flattened to [N, (H+2)*Ci, W]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    xf = xp.reshape(N, (H + 2) * Ci, Wp)
    A = band_matrices(K, TR)                       # [3, TR*Co, (TR+2)*Ci]
    sb = jnp.stack([
        jnp.tile(scale, TR)[:, None].astype(jnp.float32),
        jnp.tile(bias, TR)[:, None].astype(jnp.float32),
    ])                                             # [2, TR*Co, 1]
    out = pl.pallas_call(
        functools.partial(_kernel, TR=TR, Ci=Ci, Co=Co, W=w_real),
        grid=(N, H // TR),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((3, TR * Co, (TR + 2) * Ci),
                         lambda n, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, TR * Co, 1), lambda n, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TR * Co, Wp), lambda n, t: (n, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((N, (H // TR) * TR * Co, Wp),
                                       x.dtype),
        scratch_shapes=[
            pltpu.VMEM(((TR + 2) * Ci, Wp), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xf, A.astype(x.dtype), sb)
    return out.reshape(N, H, Co, Wp)
