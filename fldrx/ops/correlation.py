"""Correlation cost volume — TPU-native equivalent of the reference's CuPy
kernels (OpticalFlow/correlation.py:17-242).

Semantics: 81-channel cost volume over ±4 integer displacements,
    corr[b, y, x, d] = mean_c( f1[b, y, x, c] * f2[b, y+dy, x+dx, c] )
with zero padding outside the frame (the reference rearranges into a +4-padded
buffer, correlation.py:17-42, then reduces over channels, :44-112), followed by
leaky-relu in PWC-Net usage.

TPU-first: the displacement loop is a static 81-way unroll of elementwise
multiply-reduce ops on the VPU — XLA fuses the shifts into one loop nest; no
scatter, no shared-memory reduction needed. Gradients come free via autodiff
(the CUDA backward kernels, correlation.py:114-242, are the manual transpose
of this same computation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["correlation_cost_volume", "MAX_DISPLACEMENT"]

MAX_DISPLACEMENT = 4


def correlation_cost_volume(f1: jnp.ndarray, f2: jnp.ndarray,
                            max_disp: int = MAX_DISPLACEMENT) -> jnp.ndarray:
    """f1, f2: [B, H, W, C] → [B, H, W, (2*max_disp+1)²].

    Channel order matches the reference kernel's row-major (dy, dx) layout
    (top = dy index 0 ≙ displacement -4), i.e. output channel
    k = (dy+4)*9 + (dx+4).
    """
    B, H, W, C = f1.shape
    d = max_disp
    f2p = jnp.pad(f2, [(0, 0), (d, d), (d, d), (0, 0)])
    outs = []
    for dy in range(-d, d + 1):
        for dx in range(-d, d + 1):
            shifted = jax.lax.dynamic_slice(
                f2p, (0, dy + d, dx + d, 0), (B, H, W, C))
            outs.append(jnp.mean(f1 * shifted, axis=-1))
    return jnp.stack(outs, axis=-1)
