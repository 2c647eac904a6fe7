"""Layout repacking between plain row-major images and the u-plane
space-to-depth form used by the packed-domain synthesis.

The u-plane representation of a [H, W, C] image is 4 "planes", plane u
holding rows {y : y % 4 == u} as a flat [H/4, W*C] tensor. Why this shape:

  * every elementwise consumer views a plane as [H/4, W/4, 4, C] — a pure
    reshape (lanes stay (4S+v)*C+c, exactly the plain row order), so cell
    (u*4+v) channel views come for free;
  * XLA transposes that interleave 4x4 cells into channel-minor layouts cost
    10-35 ms per 4K tensor on TPU (measured; worst case a 32x lane-padding
    blowup when XLA picks a C-minor layout) — the u-plane form never asks
    for one: packing = 4 strided ROW slices, unpacking = row interleave,
    which is pure DMA work (this module's kernel);
  * the warp kernels emit it natively (the splat strip flushes rows; a row's
    plane is its y % 4).

`interleave_planes` is the single final unpack of the synthesis: a Pallas
kernel that issues one row-DMA per output row (HBM→HBM, ~50 KB each at 4K —
ideal DMA granularity), ~roofline vs the ~18 ms XLA d2s alternatives.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = bool(os.environ.get("FLDRX_PALLAS_INTERPRET"))

_BLK = 32      # output rows per grid step


def _interleave_kernel(H, WC, Hp4, planes_ref, out_ref, sems):
    # 1-D refs: Mosaic allows only 8-aligned sublane slices of 2-D HBM
    # memrefs, but 1-D slices need only 1024-element alignment — WC is a
    # multiple of 1024 at the 4K widths, so whole rows move as one DMA.
    # Grid over 32-row blocks with the row loop UNROLLED: a scalar
    # fori_loop over all H rows serializes on the scalar core (~14 ms in
    # context, measured); 32 unrolled in-flight DMAs per step stream at
    # DMA-engine speed.
    g = pl.program_id(0)
    base = g * _BLK
    dmas = []
    for j in range(_BLK):
        i = base + j
        u = j % 4                       # base is a multiple of 4
        src = (u * Hp4) * WC + (base // 4 + j // 4) * WC
        d = pltpu.make_async_copy(
            planes_ref.at[pl.ds(pl.multiple_of(src, 1024), WC)],
            out_ref.at[pl.ds(pl.multiple_of(i * WC, 1024), WC)],
            sems.at[j])
        d.start()
        dmas.append(d)
    for d in dmas:
        d.wait()


def interleave_planes(planes: jnp.ndarray) -> jnp.ndarray:
    """[4, H/4, W*C] u-planes → [H, W*C] plain rows (row y ← planes[y%4, y//4]).

    Pure DMA kernel (no compute); falls back to an XLA stack/reshape off-TPU.
    """
    _, Hp4, WC = planes.shape
    H = 4 * Hp4
    # 1-D HBM refs tile at 1024 elements: row starts must be provably
    # 1024-divisible, so rows (WC) must be a 1024-multiple (true at the 4K
    # eval widths: 4096*3; others take the XLA fallback)
    if (WC % 1024 or H % _BLK
            or (jax.default_backend() != "tpu" and not _INTERPRET)):
        s = jnp.stack([planes[0], planes[1], planes[2], planes[3]], axis=1)
        return s.reshape(H, WC)
    out = pl.pallas_call(
        functools.partial(_interleave_kernel, H, WC, Hp4),
        grid=(H // _BLK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        out_shape=jax.ShapeDtypeStruct((H * WC,), planes.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_BLK,))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), has_side_effects=True),
        interpret=_INTERPRET,
    )(planes.reshape(-1))
    return out.reshape(H, WC)


def _deinterleave_kernel(H, WC, Hp4, img_ref, out_ref, sems):
    g = pl.program_id(0)
    base = g * _BLK
    dmas = []
    for j in range(_BLK):
        i = base + j
        u = j % 4
        dst = (u * Hp4 + base // 4 + j // 4) * WC
        d = pltpu.make_async_copy(
            img_ref.at[pl.ds(pl.multiple_of(i * WC, 1024), WC)],
            out_ref.at[pl.ds(pl.multiple_of(dst, 1024), WC)],
            sems.at[j])
        d.start()
        dmas.append(d)
    for d in dmas:
        d.wait()


def extract_planes(img: jnp.ndarray) -> jnp.ndarray:
    """[H, W, C] plain image → [4, H/4, W*C] u-planes. Row-DMA kernel on
    TPU when rows are 1024-element multiples; XLA strided row slices
    otherwise (still cheap: rows stay contiguous)."""
    H, W, C = img.shape
    WC = W * C
    flat = img.reshape(H, WC)
    if (WC % 1024 or H % _BLK
            or (jax.default_backend() != "tpu" and not _INTERPRET)):
        return jnp.stack([flat[u::4] for u in range(4)], axis=0)
    out = pl.pallas_call(
        functools.partial(_deinterleave_kernel, H, WC, H // 4),
        grid=(H // _BLK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        out_shape=jax.ShapeDtypeStruct((H * WC,), img.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_BLK,))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), has_side_effects=True),
        interpret=_INTERPRET,
    )(flat.reshape(-1))
    return out.reshape(4, H // 4, WC)
