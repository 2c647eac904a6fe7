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

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["correlation_cost_volume", "correlation_cost_volume_pallas",
           "MAX_DISPLACEMENT"]

MAX_DISPLACEMENT = 4
_INTERPRET = bool(os.environ.get("FLDRX_PALLAS_INTERPRET"))


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


# ---------------------------------------------------------------------------
# Pallas kernel (the north-star replacement for the reference's shared-memory
# CUDA reduction, OpticalFlow/correlation.py:44-112)
#
# Layout: channel-planar [C, H, W] so the 81 displacement shifts are static
# slices of a padded VMEM block and the channel reduction is a page-wise
# accumulate on the VPU — no lane-padding waste for any C, no scatter/gather.
# ---------------------------------------------------------------------------

def _corr_kernel(C, BH, W, d, f1_ref, f2p_ref, out_ref):
    """One row-block: f1 block [C, BH, W]; f2p stays whole in VMEM (the ±d
    row window overlaps across blocks, which BlockSpec can't express) and is
    sliced at a dynamic row offset per displacement."""
    i = pl.program_id(0)
    n = 2 * d + 1
    f1 = f1_ref[...]                       # [C, BH, W]
    row = i * BH
    for dy in range(n):
        for dx in range(n):
            s = f2p_ref[:, pl.ds(row + dy, BH), dx:dx + W]
            out_ref[dy * n + dx] = jnp.sum(f1 * s, axis=0) * (1.0 / C)


def _corr_one(f1T: jnp.ndarray, f2T: jnp.ndarray, d: int) -> jnp.ndarray:
    """f1T/f2T: [C, H, W] → [(2d+1)², H, W]."""
    C, H, W = f1T.shape
    BH = 8 if H % 8 == 0 else H
    n_blocks = H // BH if H % 8 == 0 else 1
    f2p = jnp.pad(f2T, [(0, 0), (d, d), (d, d)])
    n = 2 * d + 1
    out = pl.pallas_call(
        functools.partial(_corr_kernel, C, BH, W, d),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((C, BH, W), lambda i: (0, i, 0)),
            pl.BlockSpec(f2p.shape, lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((n * n, BH, W), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((n * n, H, W), jnp.float32),
        interpret=_INTERPRET,
    )(f1T, f2p)
    return out


def correlation_cost_volume_pallas(f1: jnp.ndarray, f2: jnp.ndarray,
                                   max_disp: int = MAX_DISPLACEMENT
                                   ) -> jnp.ndarray:
    """Pallas cost volume, same semantics/channel order as
    `correlation_cost_volume`. Forward-only kernel; gradients route through
    the XLA formulation via custom_vjp (the PWC teacher is used no-grad in
    the shipped model, useful.py:112-117)."""
    return _corr_vjp(f1, f2, max_disp)


def correlation_auto(f1: jnp.ndarray, f2: jnp.ndarray,
                     max_disp: int = MAX_DISPLACEMENT) -> jnp.ndarray:
    """Backend-dispatching cost volume: Pallas kernel on TPU (or in interpret
    mode), XLA unroll elsewhere."""
    if jax.default_backend() == "tpu" or _INTERPRET:
        return correlation_cost_volume_pallas(f1, f2, max_disp)
    return correlation_cost_volume(f1, f2, max_disp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _corr_vjp(f1, f2, max_disp):
    B, H, W, C = f1.shape
    d = max_disp
    f1T = jnp.moveaxis(f1.astype(jnp.float32), -1, 1)    # [B, C, H, W]
    f2T = jnp.moveaxis(f2.astype(jnp.float32), -1, 1)
    outs = [_corr_one(f1T[b], f2T[b], d) for b in range(B)]
    return jnp.moveaxis(jnp.stack(outs, 0), 1, -1)        # [B, H, W, 81]


def _corr_vjp_fwd(f1, f2, max_disp):
    return _corr_vjp(f1, f2, max_disp), (f1, f2)


def _corr_vjp_bwd(max_disp, res, g):
    f1, f2 = res
    _, vjp = jax.vjp(
        lambda a, b: correlation_cost_volume(a, b, max_disp), f1, f2)
    return vjp(g)


_corr_vjp.defvjp(_corr_vjp_fwd, _corr_vjp_bwd)
