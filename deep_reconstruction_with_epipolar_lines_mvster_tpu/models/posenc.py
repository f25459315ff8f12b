"""Cost-volume positional encodings.

The reference defines these (mvs4net_utils.py:981-1015) but never wires them
(``--pos_enc`` is parsed and dropped, MVS4Net.py:51-52 — dead flag). Here they
are actually applied to the fused cost volume when ``pos_enc != 0``, gated off
by default so default behaviour matches the reference.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn


class PosEncSine(nn.Module):
    """Sine/cosine encoding of the depth hypothesis values
    (reference PosEncSine, mvs4net_utils.py:981-995).

    ``x``: ``[B, D, H, W, C]`` cost volume; ``depth``: ``[B, D, H, W]``.
    """

    temperature: float = 1000.0

    @nn.compact
    def __call__(self, x, depth):
        C = x.shape[-1]
        d = jax.lax.stop_gradient(depth) / self.temperature  # [B, D, H, W]
        freqs = jnp.arange(C // 2, dtype=x.dtype)            # [C/2]
        angle = d[..., None] * freqs * math.pi               # [B, D, H, W, C/2]
        pos = jnp.concatenate([jnp.sin(angle), jnp.cos(angle)], axis=-1)
        return x + pos.astype(x.dtype)


class PosEncLearned(nn.Module):
    """Learned per-(depth-bin, channel) embedding (reference PosEncLearned,
    mvs4net_utils.py:997-1015)."""

    ndepth: int
    channels: int

    @nn.compact
    def __call__(self, x, depth=None):
        emb = self.param(
            "depth_embed",
            nn.initializers.uniform(scale=1.0),
            (self.ndepth, self.channels),
        )
        return x + emb[None, :, None, None, :].astype(x.dtype)
