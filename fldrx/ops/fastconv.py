"""Pallas 3x3 conv for the refine UNet's packed-domain layers.

Why: XLA's conv on TPU reaches only ~2-5% MXU utilization for these shapes
(measured 14.9 ms for a 141-GMAC 416→64 conv at [576,1024]). This kernel
expresses the 3x3 stride-1 conv as 9 row-shifted [pixels, Cin] @ [Cin, K]
matmuls accumulated in f32 — proper MXU shapes with channels on lanes.

Layout: the padded image is flattened pixel-major with the row width padded
to a multiple of 8, so a ky tap shift is an 8-aligned (sublane-aligned)
static slice — Mosaic handles those without relayout copies. The kx = 1, 2
taps come from two in-VMEM sublane rolls of the block (flat-row neighbours
ARE x neighbours); roll wraparound lands only in the slack rows / junk
columns, which are sliced away. No im2col is ever materialized (a previous
variant that concatenated 3x shifted copies in XLA lost its matmul gains to
the prologue traffic). Rows stream through VMEM double-buffered.

Used by model.fldrnet.refine_unet_s2d on TPU under bf16; the XLA conv
remains the fallback (CPU / f32 parity path) and the parity reference.
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


def _rows_per_block(Wp8: int) -> int:
    return (_BH + 2) * Wp8 + 8          # +8 slack: junk-column tap overrun


def _conv_kernel(Wp8, Cp, K, x_hbm, w_ref, b_ref, out_ref, xbuf, sem):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    rows = _rows_per_block(Wp8)

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
    x0 = xbuf[i % 2]
    N = _BH * Wp8
    res = None
    for ky in range(3):
        off = ky * Wp8                      # 8-aligned static slice
        s = x0[off:off + N + 8]             # +8 rows: kx taps, 8-mult length
        for kx in range(3):
            # matmul on the aligned extended slice; the kx shift is taken on
            # the SMALL output instead of the operand (an unaligned sublane
            # slice of [N, K] is a cheap relayout; on the [N, Cp] operand it
            # forced a full-block copy per tap — measured)
            contrib = jax.lax.dot_general(
                s, w_ref[ky * 3 + kx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            res = (contrib[kx:kx + N] if res is None
                   else res + contrib[kx:kx + N])
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

    Wp8 = -(-(W + 2) // 8) * 8              # padded row width, 8-aligned
    Cp = -(-Cin // 128) * 128               # HBM slice lane alignment
    wk = w.reshape(9, Cin, K).astype(jnp.bfloat16)
    if Cp != Cin:
        wk = jnp.pad(wk, ((0, 0), (0, Cp - Cin), (0, 0)))
    bk = b.astype(jnp.float32).reshape(1, K)
    outs = []
    for bidx in range(B):
        xb = x[bidx]
        if Cp != Cin:
            xb = jnp.pad(xb, ((0, 0), (0, 0), (0, Cp - Cin)))
        xp = jnp.pad(xb, ((1, 1), (1, Wp8 - W - 1), (0, 0))
                     ).astype(jnp.bfloat16)
        x2 = xp.reshape((H + 2) * Wp8, Cp)
        slack = _rows_per_block(Wp8) + (H - _BH) * Wp8 - (H + 2) * Wp8
        x2 = jnp.pad(x2, ((0, max(slack, 0)), (0, 0)))
        out = pl.pallas_call(
            functools.partial(_conv_kernel, Wp8, Cp, K),
            grid=(H // _BH,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                pl.BlockSpec((9, Cp, K), lambda i: (0, 0, 0)),
                pl.BlockSpec((1, K), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((_BH * Wp8, K), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((H * Wp8, K), out_dtype),
            scratch_shapes=[
                pltpu.VMEM((2, _rows_per_block(Wp8), Cp), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=127 * 1024 * 1024),
            interpret=_INTERPRET,
        )(x2, wk, bk)
        out = out.reshape(H, Wp8, K)[:, :W]
        outs.append(out)
    return jnp.stack(outs, 0)
