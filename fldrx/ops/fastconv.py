"""Pallas 3x3 conv for the refine UNet's packed-domain layers.

Why: XLA's conv on TPU reaches only ~2-5% MXU utilization for these shapes
(measured 14.9 ms for a 141-GMAC 416→64 conv at [576,1024]). This kernel
expresses the 3x3 stride-1 conv as 3 row-shifted [pixels, Cin] @ [Cin, 3K]
matmuls accumulated in f32 — proper MXU shapes with channels on lanes.

Layout: the padded image is flattened pixel-major with the row width padded
to a multiple of 16 (bf16 Mosaic tile alignment: the r5 matrix measured
align=16 −8..13% over the old 8 — an 8-but-not-16-aligned ky offset made
each tap slice a relayout copy). The 3 ky-shifted operand slices are
concatenated on the LANE dim (offsets 0/Cp/2Cp — 128-multiples) and
contracted in ONE dot over 3·Cp, letting the MXU's f32 pass chain
accumulate the ky taps (the r4 'ky' form's two full-width [N, 3K] f32
strip adds were the bulk of per-step VMEM traffic; r5 matrix: kcat
enc1 16.56 vs ky 17.61 ms at align=16). The kx taps ride the OUTPUT side:
one matmul against the 3 kx weight blocks concatenated on the output axis
([3Cp, 3K] — filling the MXU's 128-wide output), then each kx block is
shifted by its tap offset as an unaligned slice of the small [N, K] result
(cheap relayout; the same shift on the operand forces a full-block copy
per tap, and pltpu.roll fails to compile at these block sizes — both
measured). An XLA-epilogue variant of the kx shift-adds (FLDRX_CONV_KX=
xla) measured 26-27 ms enc1 / 18.6-19 dec3 across the whole r5 matrix AND
crashed the remote compiler on ky-enc1 — deleted. No im2col is
materialized (a variant concatenating 3x shifted copies in XLA lost its
matmul gains to the prologue traffic). Rows stream through VMEM
double-buffered.

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

_BH = 8   # image rows per grid step (r4 sweep: 8 = 19.1 ms enc1 pairconv;
          # BH ≥ 16 exceeds the 128 MB VMEM budget at 4K — frozen, no knob)


def _align() -> int:
    # Padded-row-width alignment, default 16 (bf16 Mosaic tile (16, 128)
    # alignment for the ky tap offsets; r5 matrix: 16 beats the old 8 at
    # every shape — enc1 16.56 vs 19.1 ms. Bitwise-safe: the extra columns
    # are zero pad and outputs crop to W). FLDRX_CONV_ALIGN stays as a
    # probe override.
    a = int(os.environ.get("FLDRX_CONV_ALIGN", "16"))
    # the kernel hard-requires align>=2 (kx-tap overrun slack) and a
    # multiple of 8 (sublane-aligned ky slices); bad values would die with
    # an opaque Mosaic trace error deep in a chip run
    if a < 8 or a % 8:
        raise ValueError(f"FLDRX_CONV_ALIGN must be a multiple of 8 >= 8 "
                         f"(got {a}); measured values: 16 (default), 8")
    return a


def _rows_per_block(Wp8: int, align: int) -> int:
    return (_BH + 2) * Wp8 + align      # +align slack: junk-col tap overrun


def _conv_kernel(Wp8, Cp, K, align, x_hbm, w_ref, b_ref, out_ref,
                 xbuf, sem):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    rows = _rows_per_block(Wp8, align)

    def dma(step, slot):
        start = pl.multiple_of(step * _BH * Wp8, align)
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
    K = w_ref.shape[2] // 3
    Cp = x0.shape[1]
    # lane-concat ky contraction (the only form after the r5 matrix — see
    # module docstring): one dot over 3·Cp, MXU accumulates the ky taps in
    # its f32 pass chain; no full-width f32 strip adds. (The per-ky 'ky'
    # form with explicit adds measured 17.61 vs 16.56 ms enc1 and was
    # deleted; git history keeps it.)
    xcat = jnp.concatenate(
        [x0[ky * Wp8:ky * Wp8 + N + align] for ky in range(3)], axis=1)
    w3 = w_ref[...].reshape(3 * Cp, 3 * K)
    acc = jax.lax.dot_general(
        xcat, w3, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    res = None
    for kx in range(3):
        part = acc[kx:kx + N, kx * K:(kx + 1) * K]
        res = part if res is None else res + part
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

    align = _align()
    Wp8 = -(-(W + 2) // align) * align      # padded row width, align-mult
    Cp = -(-Cin // 128) * 128               # HBM slice lane alignment
    # [ky][Cin, 3K]: kx weight blocks concatenated on the output axis
    wk = jnp.transpose(w, (0, 2, 1, 3)).reshape(3, Cin, 3 * K)
    wk = wk.astype(jnp.bfloat16)
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
        slack = _rows_per_block(Wp8, align) + (H - _BH) * Wp8 - (H + 2) * Wp8
        x2 = jnp.pad(x2, ((0, max(slack, 0)), (0, 0)))
        out = pl.pallas_call(
            functools.partial(_conv_kernel, Wp8, Cp, K, align),
            grid=(H // _BH,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                pl.BlockSpec((3, Cp, 3 * K), lambda i: (0, 0, 0)),
                pl.BlockSpec((1, K), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((_BH * Wp8, K), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((H * Wp8, K), out_dtype),
            scratch_shapes=[
                pltpu.VMEM((2, _rows_per_block(Wp8, align), Cp),
                           jnp.bfloat16),
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
