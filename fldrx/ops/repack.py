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

_BLK = 32      # output rows per grid step (row-DMA fallback kernel)
_BLK2 = 128    # output rows per grid step (perm-matmul kernel)


def _lane_block(WC: int) -> int:
    """Largest multiple-of-128 divisor of WC ≤ 4096 (keeps a 128×WCB f32
    block ≤ 2 MB — in+out double-buffered stays under the 16 MB scoped
    VMEM limit)."""
    for cand in (4096, 3072, 2048, 1536, 1024, 768, 512, 384, 256, 128):
        if WC % cand == 0:
            return cand
    return 0


def _split3(x):
    """Triple-bf16 split of an f32 array: x == hi + mid + lo BITWISE
    (each residual is exactly representable — x − bf16(x) drops exactly
    the top mantissa bits — and the final 8 leftover bits fit lo)."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _perm_dot(P, X):
    """P @ X with P a 0/1 one-hot permutation (one nonzero per row): exact
    for bf16 X (1·x products, single-nonzero sums), and bitwise-exact for
    f32 X via the triple-bf16 split — the splat/gather kernels established
    this trick (fastwarp.py); DEFAULT precision, so full MXU rate."""
    if X.dtype == jnp.float32:
        acc = None
        for part in _split3(X):
            t = jax.lax.dot_general(P, part, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
        return acc
    t = jax.lax.dot_general(P, X, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return t.astype(X.dtype)


def _interleave_kernel2(WC, planes_ref, out_ref):
    """Sublane-permutation interleave: the [4, Q, WC] plane block (Pallas
    auto-pipelines it) reshapes to [128, WC] with X[u·Q+k] = plane u row k;
    output row 4k+u ← X[u·Q+k] is a one-hot MXU matmul. Replaces the
    per-row DMA kernel whose ~2300 row copies were issue-rate bound
    (~15 ms in context at 4K, measured)."""
    Q = _BLK2 // 4
    X = planes_ref[...].reshape(_BLK2, WC)
    jj = jax.lax.broadcasted_iota(jnp.int32, (_BLK2, _BLK2), 0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (_BLK2, _BLK2), 1)
    P = ((jj % 4) * Q + jj // 4 == ii).astype(jnp.bfloat16)
    out_ref[...] = _perm_dot(P, X)


def _deinterleave_kernel2(WC, img_ref, out_ref):
    """Inverse: [128, WC] contiguous rows → [4, Q, WC] planes via the
    inverse sublane permutation (row u·Q+k ← X[4k+u])."""
    Q = _BLK2 // 4
    X = img_ref[...]
    jj = jax.lax.broadcasted_iota(jnp.int32, (_BLK2, _BLK2), 0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (_BLK2, _BLK2), 1)
    P = ((jj // Q) + 4 * (jj % Q) == ii).astype(jnp.bfloat16)
    out_ref[...] = _perm_dot(P, X).reshape(4, Q, WC)


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
    on_tpu = jax.default_backend() == "tpu" or _INTERPRET
    WCB = _lane_block(WC)
    if on_tpu and H % _BLK2 == 0 and WCB:
        Q = _BLK2 // 4
        return pl.pallas_call(
            functools.partial(_interleave_kernel2, WCB),
            grid=(H // _BLK2, WC // WCB),
            in_specs=[pl.BlockSpec((4, Q, WCB), lambda g, j: (0, g, j))],
            out_specs=pl.BlockSpec((_BLK2, WCB), lambda g, j: (g, j)),
            out_shape=jax.ShapeDtypeStruct((H, WC), planes.dtype),
            interpret=_INTERPRET,
        )(planes)
    # 1-D HBM refs tile at 1024 elements: row starts must be provably
    # 1024-divisible, so rows (WC) must be a 1024-multiple (true at the 4K
    # eval widths: 4096*3; others take the XLA fallback)
    if WC % 1024 or H % _BLK or not on_tpu:
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


def planes_to_plain_np(a: "np.ndarray") -> "np.ndarray":
    """HOST-side u-plane unpack: [..., 4, H/4, W·3] → [..., H, W, 3].

    cfg.planes_out keeps the packed synthesis output in u-plane form on
    device (skipping the ~12 ms/t interleave_planes DMA kernel) because
    eval consumers fetch frames to the host anyway — this numpy reshape
    (one memcpy, runs on the evaluator's metric worker threads) replaces
    the device kernel bit-exactly."""
    import numpy as np
    lead, (_, hp4, wc) = a.shape[:-3], a.shape[-3:]
    W = wc // 3
    a = a.reshape(*lead, 4, hp4, W, 3)
    a = np.moveaxis(a, -4, -3)                 # [..., hp4, 4, W, 3]
    return np.ascontiguousarray(a).reshape(*lead, hp4 * 4, W, 3)


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
    on_tpu = jax.default_backend() == "tpu" or _INTERPRET
    WCB = _lane_block(WC)
    if on_tpu and H % _BLK2 == 0 and WCB:
        Q = _BLK2 // 4
        return pl.pallas_call(
            functools.partial(_deinterleave_kernel2, WCB),
            grid=(H // _BLK2, WC // WCB),
            in_specs=[pl.BlockSpec((_BLK2, WCB), lambda g, j: (g, j))],
            out_specs=pl.BlockSpec((4, Q, WCB), lambda g, j: (0, g, j)),
            out_shape=jax.ShapeDtypeStruct((4, H // 4, WC), img.dtype),
            interpret=_INTERPRET,
        )(flat)
    if WC % 1024 or H % _BLK or not on_tpu:
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
