"""Pallas 3x3 conv for the refine UNet's packed-domain layers.

Why: XLA's conv on TPU reaches only ~2-5% MXU utilization for these shapes
(measured 14.9 ms for a 141-GMAC 416→64 conv at [576,1024]). This kernel
expresses the 3x3 stride-1 conv as 9 shifted [pixels, Cin] @ [Cin, K]
matmuls accumulated in f32 — proper MXU shapes with channels on lanes.

Layout: the image is flattened pixel-major with 1-pixel W padding so a
(dy, dx) tap shift is a pure ROW OFFSET of dy*(W+2)+dx in the flat array;
the W-pad columns absorb cross-row wraparound and are sliced away by the
caller. Rows stream through VMEM in double-buffered blocks.

Used by model.fldrnet.refine_unet_s2d on TPU; the XLA conv remains the
fallback (CPU / interpret-less paths) and the parity reference.
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


def _block_rows(Wp: int) -> int:
    """Flat rows per input block: (BH+2) padded image rows plus the slack the
    junk output columns' taps reach into, rounded to the 8-sublane DMA
    alignment Mosaic requires."""
    need = (_BH + 2) * Wp + 2
    return -(-need // 8) * 8


def _conv_kernel(Wp, Cin, K, x_hbm, w_ref, b_ref, out_ref, xbuf, sem):
    """One step: rows [i*BH, i*BH+BH) of the output; the input block spans
    [i*BH, i*BH+BH+2) rows of the (H+2)-row padded image, flattened to
    [(BH+2)*Wp, Cin]."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    rows = _block_rows(Wp)

    def dma(step, slot):
        start = pl.multiple_of(step * _BH * Wp, 8)
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
    first = True
    res = None
    for ky in range(3):
        for kx in range(3):
            off = ky * Wp + kx
            s = x[off:off + _BH * Wp]         # static offset (Python int)
            contrib = jax.lax.dot_general(
                s, w_ref[ky * 3 + kx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            res = contrib if first else res + contrib
            first = False
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

    Wp = W + 2
    # HBM row slices need the lane dim 128-aligned — pad channels (the
    # padded weight rows are zero, so the result is exact)
    Cp = -(-Cin // 128) * 128
    wk = w.reshape(9, Cin, K).astype(jnp.bfloat16)
    if Cp != Cin:
        wk = jnp.pad(wk, ((0, 0), (0, Cp - Cin), (0, 0)))
    bk = b.astype(jnp.float32).reshape(1, K)
    outs = []
    for bidx in range(B):
        xb = x[bidx]
        if Cp != Cin:
            xb = jnp.pad(xb, ((0, 0), (0, 0), (0, Cp - Cin)))
        xp = jnp.pad(xb, ((1, 1), (1, 1), (0, 0))).astype(jnp.bfloat16)
        # slack rows: the junk output columns at a block's end reach taps
        # just past the block (they are sliced away afterwards); the last
        # block's DMA must stay in bounds
        slack = _block_rows(Wp) + (H - _BH) * Wp - (H + 2) * Wp
        x2 = jnp.pad(xp.reshape((H + 2) * Wp, Cp), ((0, max(slack, 0)), (0, 0)))
        out = pl.pallas_call(
            functools.partial(_conv_kernel, Wp, Cp, K),
            grid=(H // _BH,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                pl.BlockSpec((9, Cp, K), lambda i: (0, 0, 0)),
                pl.BlockSpec((1, K), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((_BH * Wp, K), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((H * Wp, K), out_dtype),
            scratch_shapes=[
                pltpu.VMEM((2, _block_rows(Wp), Cp), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=127 * 1024 * 1024),
            interpret=_INTERPRET,
        )(x2, wk, bk)
        out = out.reshape(H, Wp, K)[:, :W]
        outs.append(out)
    return jnp.stack(outs, 0)
