"""Pallas 3x3 conv for the refine UNet's packed-domain layers.

Why: XLA's conv on TPU reaches only ~2-5% MXU utilization for these shapes
(measured 14.9 ms for a 141-GMAC 416→64 conv at [576,1024]). This kernel
expresses the 3x3 stride-1 conv as 3 row-shifted [pixels, 3·Cin] @
[3·Cin, K] matmuls accumulated in f32 — proper MXU shapes.

Layout: the padded image is flattened pixel-major with the row width padded
to a multiple of 8, so a ky tap shift is a row offset of ky·Wp8 — an
8-aligned (sublane-aligned) static slice, which Mosaic handles without
relayout copies. The three kx taps are pre-folded into the channel axis in
the XLA prologue (X3[p] = (x[p−1], x[p], x[p+1]) — one concat of row-shifted
views, since flat-row neighbours ARE x neighbours). Junk columns from the
width padding are sliced away at the end. Rows stream through VMEM in
double-buffered blocks.

Used by model.fldrnet.refine_unet_s2d on TPU; the XLA conv remains the
fallback (CPU / non-interpret paths) and the parity reference.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = bool(os.environ.get("FLDRX_PALLAS_INTERPRET"))

_BH = 8          # image rows per grid step


def _conv_kernel(Wp8, C3, K, x_hbm, w_ref, b_ref, out_ref, xbuf, sem):
    """One step: output rows [i·BH, i·BH+BH); input block = X3 rows
    [i·BH·Wp8, (i·BH+BH+2)·Wp8)."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    rows = (_BH + 2) * Wp8

    def dma(step, slot):
        start = pl.multiple_of(step * _BH * Wp8, 8)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(start, rows)], xbuf.at[slot], sem.at[slot])

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < n)
    def _():
        dma(i + 1, (i + 1) % 2).start()

    dma(i, i % 2).wait()
    x = xbuf[i % 2]
    res = None
    for ky in range(3):
        off = ky * Wp8                        # 8-aligned static slice
        s = x[off:off + _BH * Wp8]
        contrib = jax.lax.dot_general(
            s, w_ref[ky], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        res = contrib if ky == 0 else res + contrib
    out_ref[...] = (res + b_ref[...]).astype(out_ref.dtype)


def conv3x3_pixrows(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                    out_dtype=None) -> jnp.ndarray:
    """3x3 stride-1 pad-1 conv, NHWC x [B, H, W, Cin], HWIO w [3,3,Cin,K].

    Requires H % 8 == 0; falls back to lax conv otherwise or off-TPU.
    """
    B, H, W, Cin = x.shape
    K = w.shape[-1]
    out_dtype = out_dtype or x.dtype
    if (H % _BH or (jax.default_backend() != "tpu" and not _INTERPRET)):
        prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec)
        return (y + b.astype(y.dtype)).astype(out_dtype)

    Wp8 = -(-(W + 2) // 8) * 8                # padded row width, 8-aligned
    # weights: [ky][kx·Cin + c, k] with channels padded so the contraction
    # lane dim is a 128 multiple (HBM slice alignment); zero rows are exact
    C3 = 3 * Cin
    C3p = -(-C3 // 128) * 128
    wk = jnp.transpose(w, (0, 1, 2, 3)).reshape(3, 3 * Cin, K)
    wk = jnp.pad(wk.astype(jnp.bfloat16), ((0, 0), (0, C3p - C3), (0, 0)))
    bk = b.astype(jnp.float32).reshape(1, K)
    outs = []
    for bidx in range(B):
        xp = jnp.pad(x[bidx], ((1, 1), (1, Wp8 - W - 1), (0, 0))
                     ).astype(jnp.bfloat16)
        x2 = xp.reshape((H + 2) * Wp8, Cin)
        # fold the kx taps into channels: X3[p] = (x2[p], x2[p+1], x2[p+2]);
        # flat-row neighbours are x neighbours (width-padded rows)
        R = x2.shape[0]
        x3 = jnp.concatenate([x2[0:R - 2], x2[1:R - 1], x2[2:R]], axis=1)
        x3 = jnp.pad(x3, ((0, 2), (0, C3p - C3)))
        out = pl.pallas_call(
            functools.partial(_conv_kernel, Wp8, C3p, K),
            grid=(H // _BH,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                pl.BlockSpec((3, C3p, K), lambda i: (0, 0, 0)),
                pl.BlockSpec((1, K), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((_BH * Wp8, K), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((H * Wp8, K), out_dtype),
            scratch_shapes=[
                pltpu.VMEM((2, (_BH + 2) * Wp8, C3p), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=127 * 1024 * 1024),
            interpret=_INTERPRET,
        )(x3, wk, bk)
        out = out.reshape(H, Wp8, K)[:, :W]
        outs.append(out)
    return jnp.stack(outs, 0)
