"""Width-packed (space-to-depth) convolution execution.

TPU rationale: XLA's lowering of small-channel NHWC convolutions (C = 4..32,
the entire cost-regularization side of this model — reference reg2d
``mvs4net_utils.py:884-926`` and the FPN stem ``:426-450``) runs ~5-8x off
the bandwidth roofline on TPU: the MXU contraction sees only C of 128 lanes.
Measured on v5e at the stage-4 eval shape (N=16, 512x640): a 3x3 conv 8->8
takes ~2.8 ms while a 3x3 conv 128->128 on the width-packed layout — with
144x the FLOPs — takes ~0.36 ms (BENCH_NOTES.md).

The fix is a layout change that is *free* under XLA: packing ``k``
neighboring width columns into the channel dimension,

    x[N, H, W, C]  ->  xp[N, H, W/k, k*C],    xp[n,h,q,j*C+c] = x[n,h,q*k+j,c]

is a pure ``reshape`` (row-major minor dims untouched), and any strided 2-D
(or depth-extended 3-D) convolution on the logical tensor equals a dense
block-banded convolution on the packed tensor:

    y[wo] = sum_dx  x[s*wo + dx - p] * K[dx]
    wo = bo*k_out + jo,   wi = bi*k_in + ji,
    wi = s*(bo*k_out + jo) + dx - p  =  (bo*R + t)*k_in + ji,
    R = s*k_out/k_in (integer by construction),
    t(jo,dx) = floor((s*jo + dx - p)/k_in),  ji = (s*jo + dx - p) mod k_in.

So the packed kernel ``Kp[.., t, ji*Ci+ci, jo*Co+co] = K[.., dx, ci, co]``
(zeros elsewhere) applied with window ``T = t_max - t_min + 1`` blocks,
block stride ``R`` and explicit zero block-padding reproduces the logical
convolution bit-for-bit up to matmul summation order. FLOPs inflate by
``k`` (the packed kernel is block-banded but stored dense) — a ~16x paper
inflation that is far cheaper than the lane under-fill it removes.

Transposed convolutions route through :func:`zero_stuff` (the logical
``lhs_dilation`` materialized by a reshape-interleave, which cannot be
expressed inside the packed layout) followed by a stride-1 packed conv.

Used by ``models/layers.py`` blocks when ``pack > 1``; parameters keep
their logical shapes, so checkpoints, the torch transplant and the parity
suite are unaffected by the execution layout.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from jax import lax


def pack_w(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """[..., W, C] -> [..., W//k, k*C] (pure reshape)."""
    if k == 1:
        return x
    *lead, W, C = x.shape
    assert W % k == 0, f"width {W} not divisible by pack factor {k}"
    return x.reshape(*lead, W // k, k * C)


def unpack_w(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """[..., W//k, k*C] -> [..., W, C] (pure reshape)."""
    if k == 1:
        return x
    *lead, Wq, KC = x.shape
    assert KC % k == 0
    return x.reshape(*lead, Wq * k, KC // k)


@functools.lru_cache(maxsize=None)
def _pack_geometry(kw: int, stride: int, pad: int, k_in: int, k_out: int):
    """Block-conv geometry + the (dx, jo) -> (t, ji) one-hot map.

    Returns (T, R, t_min, M) with M[dx, jo, t - t_min, ji] in {0, 1}.
    """
    assert (stride * k_out) % k_in == 0, (
        f"stride*k_out ({stride}*{k_out}) must be a multiple of k_in ({k_in})"
    )
    R = (stride * k_out) // k_in
    ts = [
        (stride * jo + dx - pad) // k_in
        for jo in range(k_out)
        for dx in range(kw)
    ]
    t_min, t_max = min(ts), max(ts)
    T = t_max - t_min + 1
    M = np.zeros((kw, k_out, T, k_in), np.float32)
    for jo in range(k_out):
        for dx in range(kw):
            w = stride * jo + dx - pad
            M[dx, jo, w // k_in - t_min, w % k_in] = 1.0
    return T, R, t_min, M


def packed_kernel(
    K: jnp.ndarray, stride: int, pad: int, k_in: int, k_out: int
) -> jnp.ndarray:
    """Transform a logical kernel ``[..., kw, Ci, Co]`` (leading dims = any
    non-packed spatial extents, e.g. kh or (kd, kh)) into the packed
    block-banded kernel ``[..., T, k_in*Ci, k_out*Co]``."""
    kw, Ci, Co = K.shape[-3:]
    T, _, _, M = _pack_geometry(kw, stride, pad, k_in, k_out)
    Mj = jnp.asarray(M, K.dtype)
    # out[..., t, q(=ji), i, j(=jo), o] = sum_d K[..., d, i, o] M[d, j, t, q]
    Kp = jnp.einsum("...dio,djtq->...tqijo", K, Mj)
    return Kp.reshape(*K.shape[:-3], T, k_in * Ci, k_out * Co)


def packed_conv_w(
    xp: jnp.ndarray,
    K: jnp.ndarray,
    *,
    strides: tuple,
    pads: tuple,
    k_in: int,
    k_out: int,
    W: int,
) -> jnp.ndarray:
    """N-D conv on a width-packed activation.

    ``xp``: [N, *spatial, Wq, k_in*Ci] (spatial = () for 1-D, (H,) for 2-D,
    (D, H) for 3-D). ``K``: logical [*kspatial, kw, Ci, Co]. ``strides`` /
    ``pads``: per spatial dim incl. width last (symmetric torch-style pads).
    ``W``: the logical width (for output-geometry checks).
    Returns [N, *out_spatial, WoutQ, k_out*Co].
    """
    kw = K.shape[-3]
    sw, pw = strides[-1], pads[-1]
    T, R, t_min, _ = _pack_geometry(kw, sw, pw, k_in, k_out)
    Wout = (W + 2 * pw - kw) // sw + 1
    assert Wout % k_out == 0, f"output width {Wout} not divisible by {k_out}"
    Wq_in, Bo = xp.shape[-2], Wout // k_out
    PL = -t_min
    PR = max(0, (Bo - 1) * R + T - Wq_in - PL)
    n_space = len(strides) - 1
    assert (Wq_in + PL + PR - T) // R + 1 == Bo

    Kp = packed_kernel(K, sw, pw, k_in, k_out)
    dn = {
        1: ("NWC", "WIO", "NWC"),
        2: ("NHWC", "HWIO", "NHWC"),
        3: ("NDHWC", "DHWIO", "NDHWC"),
    }[n_space + 1]
    pad_cfg = [(p, p) for p in pads[:-1]] + [(PL, PR)]
    return lax.conv_general_dilated(
        xp,
        Kp,
        window_strides=(*strides[:-1], R),
        padding=pad_cfg,
        dimension_numbers=dn,
    )


@functools.lru_cache(maxsize=None)
def _depth_band_map(kd: int, D: int):
    """One-hot depth band: M[z, di, do] = 1 iff di == do + z - kd//2 (the
    stride-1, pad=kd//2 depth tap structure; out-of-range di simply has no
    block — exactly the conv's zero padding)."""
    M = np.zeros((kd, D, D), np.float32)
    for z in range(kd):
        for do in range(D):
            di = do + z - kd // 2
            if 0 <= di < D:
                M[z, di, do] = 1.0
    return M


def depth_band_kernel(K: jnp.ndarray, D: int) -> jnp.ndarray:
    """Expand a 3-D conv kernel ``[kd, kh, kw, Ci, Co]`` (stride-1,
    pad=kd//2 in depth) into the depth-in-channels 2-D kernel
    ``[kh, kw, D*Ci, D*Co]``: Kd[h, w, (di, ci), (do, co)] =
    K[di - do + kd//2, h, w, ci, co] (zero outside the band).

    TPU rationale: for the cost-volume mid blocks D is 4-8, so the depth
    contraction is ALREADY nearly dense (each output depth reads kd=3 of D
    slices -> D/kd = 1.3-2.7x paper FLOPs); executing it as a dense 2-D
    NHWC conv on ``[B, H, W, D*C]`` fills the MXU lanes with D*C >= 64
    channels at far lower inflation than the width-packed 3-D conv
    (T*k/kw = 2-8x) the folded layout needs. Math-exact: same taps, same
    zero padding, only f32 summation order differs.
    """
    kd = K.shape[0]
    M = jnp.asarray(_depth_band_map(kd, D), K.dtype)
    Kd = jnp.einsum("zhwio,zde->hwdieo", K, M)
    kh, kw, Ci, Co = K.shape[1], K.shape[2], K.shape[3], K.shape[4]
    return Kd.reshape(kh, kw, D * Ci, D * Co)


def mid_pack_plan(W: int, C: int, D: int, k_w: int,
                  margin: float = 0.75) -> int:
    """Static execution choice for a stride-1 3x3x3 mid block at logical
    width ``W``, channels ``C``, depth ``D``, given the width-pack factor
    ``k_w`` the folded path would use. Returns the depth-packed width
    factor ``kp`` (>= 1) when depth-in-channels execution has lower paper
    FLOPs than the width-packed path by at least ``margin`` (covering the
    two layout transposes it adds), else 0 (keep width packing).

    Inflations vs the true 3-D conv FLOPs:
      width-packed:     T_w * k_w / kw          (kw = 3 width taps)
      depth-in-channel: T_d * kp * D / (kd*kw)  (depth dense, kd = 3)
    """
    kp = pick_pack(W, D * C)
    T_d = _pack_geometry(3, 1, 1, kp, kp)[0] if kp > 1 else 3
    infl_d = T_d * kp * D / 9.0
    T_w = _pack_geometry(3, 1, 1, k_w, k_w)[0] if k_w > 1 else 3
    infl_w = T_w * k_w / 3.0
    return kp if infl_d < margin * infl_w else 0


def zero_stuff(x: jnp.ndarray, axes: tuple) -> jnp.ndarray:
    """Interleave zeros along ``axes`` (each length L -> 2L, data at even
    indices) — the materialized ``lhs_dilation`` (+1 trailing zero) used to
    express transposed convs as stride-1 convs."""
    for ax in axes:
        ax = ax % x.ndim
        zeros = jnp.zeros_like(x)
        y = jnp.stack([x, zeros], axis=ax + 1)
        x = y.reshape(
            *x.shape[:ax], 2 * x.shape[ax], *x.shape[ax + 1:]
        )
    return x


def pick_pack_levels(W: int, C0: int, n_levels: int) -> list:
    """Per-level pack factors for a stride-2 U-Net pyramid: level l has
    width ``W >> l`` and channels ``C0 << l``; consecutive factors keep the
    stride-2 handoff representable (``2*k_next % k_prev == 0`` — for powers
    of two, ``k_prev/2 <= k_next <= 2*k_prev``). Caller must ensure
    ``(1 << (n_levels-1)) | W``."""
    ks = [pick_pack(W, C0)]
    for lvl in range(1, n_levels):
        k = pick_pack(W >> lvl, C0 << lvl)
        k = max(k, ks[-1] // 2)
        ks.append(min(k, ks[-1] * 2))
    return ks


def pick_pack(W: int, C: int, target: int = 128, cap: int = 16) -> int:
    """Largest power-of-two pack factor k <= cap with k*C <= 2*target,
    k | W, preferring the smallest k with k*C >= target. Returns 1 when no
    factor divides W (caller falls back to the unpacked path)."""
    best = 1
    k = 1
    while k <= cap:
        if W % k == 0:
            best = k
            if k * C >= target:
                break
        k *= 2
    return best
