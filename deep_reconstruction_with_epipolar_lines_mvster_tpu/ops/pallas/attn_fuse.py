"""Pallas TPU kernel: cross-view attention accumulation over KERNEL-NATIVE
correlation volumes.

The fused warp+group-cor kernels emit per-view volumes in the native layout
``[B, D, T, TR, G, W]`` (ops/pallas/warp_fwd_v3). The reference attention
accumulation (mvs4net_utils.py:1078-1100)

    w_v  = softmax_D(sum_G cor_v / attn_temp) / sqrt(C)
    acc += w_v * cor_v ;  norm += w_v ;  out = acc / (1e-8 + norm)

ran as an XLA elementwise chain between the per-view kernel calls — ~2.8 ms
of loop fusions plus acc/norm round-trips per eval iter at the bench config
(r5e trace). This kernel runs the WHOLE chain in one pass: per (b, t) grid
cell it holds all D hypothesis slabs of every source view in VMEM, computes
the per-view depth softmax in f32 and writes the fused volume once. Traffic
drops to (V-1) reads + 1 write of the volume.

Layout discipline (the G=4-minor lesson): the volume is viewed as
``[B, D, T, TR*G, W]`` (a free major-dim merge) so every in-kernel value is
a natural ``[TR*G, W]`` or ``[TR, W]`` tile. The G-sum and the per-row
weight broadcast cross the G-in-sublanes structure, so both ride tiny
static 0/1 MXU matmuls (``S[TR, TR*G]`` group-sum / its transpose as row
expand — the ``foldT`` pattern of the bwd kernels) instead of strided
sublane slicing, which Mosaic refuses ("unsupported shape cast", probed
r5h).

Eval-only (no VJP): the train path keeps the differentiable two-step
warp + XLA chain. f32 softmax/accumulation differs from the XLA bf16 chain
by rounding only.

MEASURED NEGATIVE on chip (r5h, bench config): 50.85 vs 49.57 ms/iter.
The hypothesis (the 2.8 ms XLA loop-fusion bucket is separable overhead)
was wrong: XLA streams each per-view volume into the chain fusions as it
is produced, while this separate pass must re-read all three volumes from
HBM (+0.4 ms of traffic) and its many [TR, W]-granular VPU ops don't beat
XLA's fusions. Kept OPT-IN (ModelConfig.fuse_attn) for the record and for
memory-constrained shapes where the acc/norm XLA intermediates matter.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(*refs, views: int, depths: int, tile_rows: int, groups: int,
            attn_temp: float, inv_sqrt_c: float):
    cor_refs = refs[:views]
    out_ref = refs[views]
    acc_vmem, norm_vmem = refs[views + 1], refs[views + 2]
    D, TR, G = depths, tile_rows, groups

    # static selectors: S[r, r*G+g] = 1 (group sum); S^T broadcasts a
    # per-row weight back over its G group rows
    rows = jax.lax.broadcasted_iota(jnp.int32, (TR, TR * G), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TR, TR * G), 1)
    S = (cols // G == rows).astype(jnp.float32)          # [TR, TR*G]

    def gsum_of(x):                                      # [TR*G,W]->[TR,W]
        return jax.lax.dot_general(
            S, x, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def expand(w):                                       # [TR,W]->[TR*G,W]
        return jax.lax.dot_general(
            S, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    for s in range(views):
        x = [cor_refs[s][0, d, 0].astype(jnp.float32) for d in range(D)]
        gs = [gsum_of(x[d]) for d in range(D)]           # [TR, W] each
        m = functools.reduce(jnp.maximum, gs)
        e = [jnp.exp((gs[d] - m) * (1.0 / attn_temp)) for d in range(D)]
        esum = functools.reduce(lambda a, b: a + b, e)
        for d in range(D):
            w = e[d] / esum * inv_sqrt_c                 # [TR, W]
            wx = expand(w)                               # [TR*G, W]
            if s == 0:
                norm_vmem[pl.ds(d * TR, TR), :] = 1e-8 + w
                acc_vmem[pl.ds(d * TR * G, TR * G), :] = wx * x[d]
            else:
                norm_vmem[pl.ds(d * TR, TR), :] += w
                acc_vmem[pl.ds(d * TR * G, TR * G), :] += wx * x[d]
    for d in range(D):
        inv = expand(1.0 / norm_vmem[pl.ds(d * TR, TR), :])
        out_ref[0, d, 0] = (
            acc_vmem[pl.ds(d * TR * G, TR * G), :] * inv
        ).astype(out_ref.dtype)


def attn_fuse_native(
    cors,                    # list of [B, D, T, TR, G, W] per source view
    *,
    attn_temp: float,
    channels: int,           # C of the stage features (the 1/sqrt(C) scale)
    interpret: bool = False,
) -> jnp.ndarray:            # [B, D, T, TR, G, W] fused volume
    """Fused cross-view attention accumulation (module docstring)."""
    B, D, T, TR, G, W = cors[0].shape
    cors_m = [c.reshape(B, D, T, TR * G, W) for c in cors]  # free merge
    spec = pl.BlockSpec(
        (1, D, 1, TR * G, W), lambda b, t: (b, 0, t, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, views=len(cors), depths=D, tile_rows=TR, groups=G,
            attn_temp=attn_temp, inv_sqrt_c=1.0 / math.sqrt(channels),
        ),
        grid=(B, T),
        in_specs=[spec] * len(cors),
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(cors_m[0].shape, cors[0].dtype),
        scratch_shapes=[
            pltpu.VMEM((D * TR * G, W), jnp.float32),
            pltpu.VMEM((D * TR, W), jnp.float32),
        ],
        interpret=interpret,
    )(*cors_m)
    return out.reshape(B, D, T, TR, G, W)
