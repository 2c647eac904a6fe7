"""Pallas 3x3 conv for the refine UNet's packed-domain layers.

Why: XLA's conv on TPU reaches only ~2-5% MXU utilization for these shapes
(measured 14.9 ms for a 141-GMAC 416→64 conv at [576,1024]). This kernel
expresses the 3x3 stride-1 conv as 3 row-shifted [pixels, Cin] @ [Cin, 3K]
matmuls accumulated in f32 — proper MXU shapes with channels on lanes.

Layout: the padded image is flattened pixel-major with the row width padded
to a multiple of 8, so a ky tap shift is an 8-aligned (sublane-aligned)
static slice — Mosaic handles those without relayout copies. The kx taps
ride the OUTPUT side: per ky, one matmul against the 3 kx weight blocks
concatenated on the output axis ([Cin, 3K] — filling the MXU's 128-wide
output), then each kx block is shifted by its tap offset as an unaligned
slice of the small [N, K] result (cheap relayout; the same shift on the
[N, Cin] operand forces a full-block copy per tap, and pltpu.roll fails to
compile at these block sizes — both measured). No im2col is materialized (a
variant concatenating 3x shifted copies in XLA lost its matmul gains to the
prologue traffic). Rows stream through VMEM double-buffered.

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
    # FLDRX_CONV_ALIGN (measurement gate): padded-row-width alignment. 8 is
    # sublane-aligned for f32 tiles; the input block is BF16, whose Mosaic
    # tile is (16, 128) — with an 8-but-not-16-aligned row width the ky tap
    # offsets (ky·Wp8) fall mid-tile and the slice is a relayout copy of the
    # whole ~10 MB block per tap. 16 makes every ky offset tile-aligned.
    # Bitwise-safe: the extra columns are zero pad and outputs crop to W.
    a = int(os.environ.get("FLDRX_CONV_ALIGN", "8"))
    # the kernel hard-requires align>=2 (kx-tap overrun slack) and a
    # multiple of 8 (sublane-aligned ky slices); bad values would die with
    # an opaque Mosaic trace error deep in a chip run
    if a < 8 or a % 8:
        raise ValueError(f"FLDRX_CONV_ALIGN must be a multiple of 8 >= 8 "
                         f"(got {a}); measured values: 8 (default), 16")
    return a


def _rows_per_block(Wp8: int, align: int) -> int:
    return (_BH + 2) * Wp8 + align      # +align slack: junk-col tap overrun


def _conv_kernel(Wp8, Cp, K, emit_raw, align, x_hbm, w_ref, b_ref, out_ref,
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
    # FLDRX_CONV_FORM=kcat (measurement gate): concatenate the 3 ky-shifted
    # operand slices on the LANE dim (offsets 0/Cp/2Cp — 128-multiples) and
    # contract once over 3·Cp, letting the MXU accumulate the ky taps in its
    # f32 pass chain. Same passes, but the two full-width [N, 3K] f32
    # accumulator adds disappear — for small-Cin/large-K convs (64→416:
    # adds touch 82 MB/step vs a 6 MB operand copy) that is the bulk of the
    # per-step VMEM traffic. 'auto' picks kcat exactly there (copy bytes
    # 3·N·Cp·2 < saved add bytes 4·N·3K·4 ⇔ Cp < 8K). Default 'ky' until
    # TPU-measured.
    form = os.environ.get("FLDRX_CONV_FORM", "ky")
    kcat = form == "kcat" or (form == "auto" and Cp < 8 * K)
    if kcat:
        xcat = jnp.concatenate(
            [x0[ky * Wp8:ky * Wp8 + N + align] for ky in range(3)], axis=1)
        w3 = w_ref[...].reshape(3 * Cp, 3 * K)
        acc = jax.lax.dot_general(
            xcat, w3, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        acc = None
        for ky in range(3):
            off = ky * Wp8                  # align-multiple static slice
            s = x0[off:off + N + align]     # +align rows: kx-tap slack
            # one matmul per ky with the 3 kx weight blocks concatenated on
            # the output axis (3K lanes fill the MXU's 128-wide output; a
            # K=64-wide result wastes half of it). The ky contributions
            # accumulate FULL WIDTH (aligned f32 adds) and the kx tap
            # shifts are taken ONCE on the summed [N+8, 3K] result — the
            # kx shift is ky-independent, so this is the same sum in a
            # different association, and it pays 3 unaligned-slice
            # relayouts per step instead of 9. (Shifting the [N, Cp]
            # operand instead forced a full-block copy per tap, measured.)
            contrib = jax.lax.dot_general(
                s, w_ref[ky], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = contrib if acc is None else acc + contrib
    if emit_raw:
        # FLDRX_CONV_KX=xla: ship the ky-summed [N, 3K] f32 accumulator to
        # HBM untouched; the kx shift-adds run as an XLA fused epilogue
        # (offset reads fuse near-free there, while the in-kernel unaligned
        # sublane slices below are Mosaic relayout copies). Strip overlap
        # makes acc_i[N+j] == acc_{i+1}[j], so emitting rows [0, N) per
        # strip loses nothing — bitwise the same sum, different place.
        out_ref[...] = acc[:N]
        return
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
    # FLDRX_CONV_KX=xla (measurement gate): the kernel emits the ky-summed
    # [·, 3K] f32 accumulator and the kx shift-adds run as an XLA epilogue
    # instead of in-kernel relayout slices. Requires 3 junk columns so the
    # +2-row reads past the last real pixel stay in-bounds (Wp8 >= W+2 by
    # construction; guard anyway).
    kx_xla = (os.environ.get("FLDRX_CONV_KX", "kernel") == "xla"
              and Wp8 - W >= 2)
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
        out_cols = 3 * K if kx_xla else K
        out_dt = jnp.float32 if kx_xla else out_dtype
        out = pl.pallas_call(
            functools.partial(_conv_kernel, Wp8, Cp, K, kx_xla, align),
            grid=(H // _BH,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                pl.BlockSpec((3, Cp, 3 * K), lambda i: (0, 0, 0)),
                pl.BlockSpec((1, K), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((_BH * Wp8, out_cols), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((H * Wp8, out_cols), out_dt),
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
        if kx_xla:
            HWr = H * Wp8
            y = jnp.pad(out, ((0, 2), (0, 0)))
            res = (y[0:HWr, 0:K] + y[1:HWr + 1, K:2 * K]
                   + y[2:HWr + 2, 2 * K:3 * K] + bk)
            out = res.astype(out_dtype)
        out = out.reshape(H, Wp8, K)[:, :W]
        outs.append(out)
    return jnp.stack(outs, 0)
