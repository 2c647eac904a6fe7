"""Pallas TPU warp engine: fast bilinear gather (backward warp) and
scatter-add splat (forward warp) for the 4K synthesis hot path.

Why: XLA's per-element gather/scatter on TPU is scalarized — at 4K the
reference pipeline spends ~9.5s/frame in 6 gathers + 2 splats (measured,
v5e). This module reformulates both as MXU work:

  * The frame is cut into TILE×TILE tiles. For the GATHER each tile's
    samples land in a bounded window around the tile's mean flow → that
    window is DMA'd into VMEM at a dynamic, lane-aligned origin
    (scalar-prefetched; row origins 8-quantized, column origins
    Qx-quantized so origin·C is a multiple of the 128-lane tiling), K tiles
    per grid step with double-buffered DMAs. The SPLAT accumulates into a
    VMEM strip swept down the image (finalized rows flush to HBM exactly
    once — no read-modify-write DMA); the target's vertical position is
    absorbed into a strip-height one-hot so the accumulate stays
    sublane-static.
  * Within a tile, bilinear interpolation is separable one-hot/hat
    contractions on the MXU:
        out   = (hat(u−x) ⊙ (RYT @ win)) @ M          (gather)
        strip += RYT_strip @ (hat(u−x) ⊙ (vals @ Rep)) (splat)
    where the y one-hots have 2 nonzeros per column (the bilinear taps,
    iota-compares) and hat(u−x) = max(0, 1−|u−x|) reproduces the two x taps
    exactly — no per-element addressing anywhere.
  * Pixels whose sample/target falls outside the window ("spills", e.g. at
    motion boundaries) are fixed up exactly by a compacted XLA path over at
    most SPILL_CAP pixels; more spills than that triggers a full exact
    fallback via lax.cond — every pixel is computed from the true taps.

Precision: the in-kernel matmuls run at the MXU's native bf16 pass (Mosaic
supports only DEFAULT/HIGHEST and 6-pass HIGHEST costs more than the op
saves), so fast-path values carry ~1e-3 absolute error vs the exact XLA ops —
measured PSNR impact < 0.01 dB. Strict bit-level parity runs use
cfg.fast_warp=False (the exact XLA path).

The splat kernel accumulates into a VMEM strip swept down the image
(sequential "arbitrary" grid; finalized rows flush to HBM exactly once) — the
deterministic TPU replacement for the reference's CUDA atomicAdd
(softSplat.py:40-49) with no read-modify-write DMA at all.

The `*_diff` wrappers attach custom VJPs mirroring the reference's CUDA
backward kernels (gradient-as-gather / gradient-as-splat built from the same
fast cores), so training runs on this engine too; the exact XLA versions in
ops/splat.py / ops/warp.py remain the strict-parity and CPU fallback.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# interpreter mode lets the CPU test suite exercise the kernel logic
_INTERPRET = bool(os.environ.get("FLDRX_PALLAS_INTERPRET"))

TILE = 32                  # splat tile side → N = 1024 rows for the MXU
GTILE = 32                 # gather tile side. Frozen after the r3/r4 sweeps:
                           # GTILE=16 loses to grid/DMA overhead (122 vs
                           # 97 ms), GTILE=64 loses to window FLOPs (36.2 vs
                           # 22.6 ms/gather probe).
WINY_G = 128               # gather window rows (8-quantized adaptive origin
                           # → guaranteed y-halo ±(WINY_G−GTILE)/2−4; kernel
                           # MXU cost scales with WINY_G while every spilled
                           # tile costs ~0.1µs/px in the exact fixup tiers).
                           # 256 measured slower (29.97 vs 22.6 ms), 96 is a
                           # no-op (MXU K-dim pads to 128).
WINY_S = 96                # splat window rows (coarse-adaptive strip origin
                           # → vertical reach ±(OYR_S−TILE); spills → fixup)
CHUNK = 8                  # max channels per kernel call (VMEM budget)
MIN_FAST_PIXELS = 1 << 16  # below this the XLA ops win (kernel/grid overhead
                           # dominates) and compile-time variants multiply
SPILL_CAP = 1 << 16        # max exactly-fixed spill pixels before fallback
_WINX_G = 128              # gather x window (qx-mult; 160→128 was +5% e2e
                           # r3, WINX_S=96 stays rejected)
_WINX_S = 128              # splat x window (qx-mult)


def _row_to_col(row):
    """[1, N] f32 row -> [N, 1] f32 column, bitwise-exact: a DEFAULT-
    precision 1-pass MXU dot over a triple-bf16 split (hi = bf16(x);
    mid = bf16(x - hi); lo = bf16 of the rest — each 1.0-product is exact
    and the MXU accumulates in f32, so the total error < half an f32 ulp,
    i.e. the result rounds back to x exactly). The narrow-minor transpose
    this replaces is unsupported on Mosaic, and the HIGHEST-precision
    1-wide dot used before cost ~7 ms/launch (measured)."""
    hi = row.astype(jnp.bfloat16)
    r1 = row - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    hml = jnp.concatenate([hi, mid, lo], axis=0)
    return jax.lax.dot_general(hml, jnp.ones((3, 1), jnp.bfloat16),
                               (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


_GK_CAP = 8                # max tiles per grid step (K=16 measured +10%
                           # per-gather in r3; the r4 group-mode K sweep
                           # agreed — frozen, no knob)
# r4 TPU measurements removed three whole kernel variants (recorded so they
# are not re-built): a shared-window "group" gather (one DMA per K-tile grid
# step) was +12% per-gather on smooth content but catastrophic under motion
# (673 vs 59 ms at a 300 px pan — group-mean origins spill whole frames) and
# lost end-to-end (4.23 vs 4.58 fps); bf16 wide weight pipelines (PIPE_BF16)
# were neutral (28.31 vs 28.52 ms/splat probe, quality-gate unneeded); the
# in-kernel z-metric reduction (ZKERNEL) was slightly slower than the XLA
# chain it replaced (113 vs 109 ms z-stage/pair).


def _pick_k(tx: int) -> int:
    """Tiles per grid step: largest of 8/4/2/1 dividing the tile-row
    length (K=16 measured +10% per-gather). K-groups never span image rows
    (the shared splat strip windows require it)."""
    for k in (16, 8, 4, 2, 1):
        if tx % k == 0 and k <= _GK_CAP:
            return k
    return 1


def _hat(iv, coord):
    """Bilinear hat max(0, 1−|iv−coord|) as one wide f32 pipeline (the
    bilinear taps are the hat's only nonzeros; f32 keeps exact tap
    support — a bf16 variant measured neutral and was removed)."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(iv - coord))


def _x_fold(t1, ufl, xcol, wC):
    """Gather epilogue: weight the y-contracted window t1 [N, wC] by the x
    hat taps and fold the wC/128 lane tiles into one [N, 128] bf16 block
    for the channel-condense matmul."""
    tw = t1 * _hat(ufl, xcol)
    s = tw[:, 0:128]                     # lane-tile fold (partial sums)
    for lt in range(1, wC // 128):
        s = s + tw[:, 128 * lt:128 * (lt + 1)]
    return s.astype(jnp.bfloat16)


def _splat_contrib(RYT, CXe, v128, wC):
    """Splat tile contribution RYT @ (CXe ⊙ Ve), Ve = v128 lane-replicated
    to the window width (weights f32 until the MXU rounds both operands
    to bf16)."""
    Ve = jnp.concatenate([v128] * (wC // 128), axis=1)
    return jnp.dot(RYT.astype(jnp.bfloat16), (CXe * Ve).astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def _win_geom(C: int, wide: bool = True):
    """(C_padded, winx, qx): channels are padded to 4 or 8 so the column
    quantum qx = 128/C stays small (a 3-channel window would need 128-px
    column quantization); winx·C is a multiple of the 128-lane tile. The
    wide geometry (gather) buys x-halo ±48 — every spilled tile costs
    ~0.1µs/px in the exact fixup tiers, so windows are sized for real 4K
    motion; the splat keeps ±32 (its vertical reach comes from the strip's
    coarse-adaptive origins and its spill rate is far lower, measured)."""
    cp = 4 if C <= 4 else 8
    qx = 128 // math.gcd(cp, 128)          # 32 or 16
    if wide:
        winx = _WINX_G if cp == 4 else 144   # gather x window
    else:
        winx = _WINX_S if cp == 4 else 112   # splat x window
    assert (winx * cp) % 128 == 0 and winx % qx == 0
    return cp, winx, qx


# ---------------------------------------------------------------------------
# tiling helpers (XLA prologue/epilogue)
# ---------------------------------------------------------------------------

def _tile_flatten(a: jnp.ndarray, H: int, W: int,
                  tile: int = TILE) -> jnp.ndarray:
    """[H, W, ...] → [ntiles, tile*tile, ...] (row-major tiles)."""
    ty, tx = H // tile, W // tile
    lead = a.shape[2:]
    a = a.reshape(ty, tile, tx, tile, *lead)
    a = jnp.moveaxis(a, 2, 1)
    return a.reshape(ty * tx, tile * tile, *lead)


def _tile_unflatten(a: jnp.ndarray, H: int, W: int,
                    tile: int = TILE) -> jnp.ndarray:
    ty, tx = H // tile, W // tile
    lead = a.shape[2:]
    a = a.reshape(ty, tx, tile, tile, *lead)
    a = jnp.moveaxis(a, 1, 2)
    return a.reshape(H, W, *lead)


# ---------------------------------------------------------------------------
# u-plane layout (packed-domain synthesis)
#
# The u-plane form of a [H, W, C] image is [4, H/4, W·C]: plane u holds rows
# {y : y % 4 == u} flat. Every 4x4-cell view is then a PURE reshape of a
# plane (lanes keep the plain row order (4S+v)·C+c), so the s2d4 packing
# that the refine UNet consumes costs strided row slices + minor-preserving
# transposes only — never the 10-35 ms (worst case 32x lane-padded) XLA
# transposes that interleave cells into a channel-minor layout (measured).
# The warp kernels cooperate: the gather takes coords in "us-order"
# (u, Rsub, Ssub, v) so its epilogue splits into planes minor-preserved;
# the splat accumulates its VMEM strip u-major and flushes rows straight
# into planes. See ops/repack.py for the plain↔planes DMA kernels.
# ---------------------------------------------------------------------------

def _tile_flatten_us(a: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """[H, W] field → [ntiles, N] with in-tile pixel order (u, Rsub, Ssub, v)
    (u = r%4, Rsub = r//4, Ssub = s//4, v = s%4). Built from strided row
    slices so no narrow-minor transpose materializes (measured 7.7 vs 11.2
    ms for the direct 6-D transpose at 4K)."""
    ty, tx = H // GTILE, W // GTILE
    q = GTILE // 4
    parts = []
    for u in range(4):
        p = a[u::4].reshape(ty, q, tx, q, 4)
        parts.append(jnp.transpose(p, (0, 2, 1, 3, 4)).reshape(ty * tx, -1))
    return jnp.stack(parts, axis=1).reshape(ty * tx, GTILE * GTILE)


def tile_us_from_planes(pf: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """[4, H/4, W] plane-form field → [ntiles, N] us-order tiled coords —
    the strided row slices of _tile_flatten_us come pre-separated, so the
    packed path feeds gather coords straight from plane fields."""
    ty, tx = H // GTILE, W // GTILE
    q = GTILE // 4
    parts = []
    for u in range(4):
        p = pf[u].reshape(ty, q, tx, q, 4)
        parts.append(jnp.transpose(p, (0, 2, 1, 3, 4)).reshape(ty * tx, -1))
    return jnp.stack(parts, axis=1).reshape(ty * tx, GTILE * GTILE)


def _tile_planes_us(a: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """[ntiles, N(us-order), C] → u-planes [4, H/4, (W/4)·4·C]. Each plane's
    transpose keeps a (Ssub, v, C) ≥ 32-element contiguous minor run."""
    ty, tx = H // GTILE, W // GTILE
    q = GTILE // 4
    C = a.shape[-1]
    a = a.reshape(ty, tx, 4, q, q, 4, C)
    planes = []
    for u in range(4):
        p = jnp.transpose(a[:, :, u], (0, 2, 1, 3, 4, 5))
        planes.append(p.reshape(H // 4, (W // 4) * 4 * C))
    return jnp.stack(planes, axis=0)


def _planes_from_plain(img: jnp.ndarray) -> jnp.ndarray:
    """[H, W, C] → [4, H/4, W·C] (fallback-path packing, XLA slices)."""
    H, W, C = img.shape
    flat = img.reshape(H, W * C)
    return jnp.stack([flat[u::4] for u in range(4)], axis=0)


def _origins(sx_t, sy_t, H, W, winy, winx, qx, pady, padx):
    """Quantized per-tile window origins, clamped into the padded canvas."""
    cx = jnp.mean(sx_t, axis=1)
    cy = jnp.mean(sy_t, axis=1)
    # round (not floor): quantization drift ±q/2 keeps the guaranteed halo at
    # (win - TILE)/2 - q/2 on BOTH sides; floor would drop a whole quantum
    ox = jnp.round((cx - winx / 2) / qx).astype(jnp.int32) * qx
    oy = jnp.round((cy - winy / 2) / 8).astype(jnp.int32) * 8
    ox = jnp.clip(ox, -padx, ((W + padx - winx) // qx) * qx)
    oy = jnp.clip(oy, -pady, ((H + pady - winy) // 8) * 8)
    return oy, ox


OYR_S = 128                # strip back-reach below the tile row (rows).
                           # 128 (vs 96) is MXU-free — the [STRIPH, N]
                           # one-hot K-dim pads to 256 either way — and
                           # buys +32 px of vertical splat reach; r4 bench
                           # measured it FASTER end-to-end (4.643 vs 4.577
                           # fps: fewer spill-fixup branches taken), so it
                           # is both the speed and the spill-margin choice.


def _origins_strip(sx_t, sy_t, tx, W, winy, winx, qx, padx):
    """Per-tile origins for the strip-accumulator splat. The y origin is the
    STRIP BASE itself (32r − OYR_S): the vertical position of each target is
    absorbed into the [STRIPH, N] one-hot (full continuous ±OYR_S reach), so
    the strip add stays sublane-static (a dynamic sublane offset costs
    ~12µs/tile on Mosaic, and predicated static branches cost ~2ms/launch
    each — both measured). The x origin adapts per tile freely (128-aligned
    lane offsets are cheap)."""
    n_tiles = sx_t.shape[0]
    cx = jnp.mean(sx_t, axis=1)
    r32 = (jnp.arange(n_tiles, dtype=jnp.int32) // tx) * TILE
    ox = jnp.round((cx - winx / 2) / qx).astype(jnp.int32) * qx
    ox = jnp.clip(ox, -padx, ((W + padx - winx) // qx) * qx)
    oy = r32 - OYR_S
    return oy, ox


def _ok_mask(sx_t, sy_t, oy, ox, winy, winx):
    rx = sx_t - ox[:, None].astype(sx_t.dtype)
    ry = sy_t - oy[:, None].astype(sy_t.dtype)
    x0 = jnp.floor(rx)
    y0 = jnp.floor(ry)
    return ((x0 >= 0) & (x0 <= winx - 2) & (y0 >= 0) & (y0 <= winy - 2))


# ---------------------------------------------------------------------------
# gather (backward warp)
# ---------------------------------------------------------------------------

def _gather_kernel(C, winx, K, winy, origins_ref, img_hbm, coords_ref,
                   out_ref, win_ref, sem):
    """K output tiles per grid step; per-tile window DMAs double-buffered
    across steps (the next step's K windows stream in while this step's
    tiles compute).

    Layout discipline (all 2-D, no narrow-minor tensors — a [.., N, 1] array
    costs 128x lane padding in HBM): coords arrive window-relative as rows
    [2, N] (rx, ry); the x-row is turned into a column vector with an exact
    1-wide MXU contraction; the output leaves transposed [C, N].

    The x taps use the bilinear HAT function max(0, 1−|u−x|) instead of
    iota-compare one-hots — bitwise identical on in-window pixels (the two
    taps are the hat's only nonzeros) and ~15% faster (the mask pipeline on
    [N, winx·C] is the kernel's VPU bottleneck, measured).

    """
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def window_dma(step, slot, j):
        row = pl.multiple_of(origins_ref[2 * (step * K + j)] + winy, 8)
        col = pl.multiple_of(
            (origins_ref[2 * (step * K + j) + 1] + winx) * C, 128)
        return pltpu.make_async_copy(
            img_hbm.at[pl.ds(row, winy), pl.ds(col, winx * C)],
            win_ref.at[slot, j], sem.at[slot, j])

    @pl.when(i == 0)
    def _():
        for j in range(K):
            window_dma(i, 0, j).start()

    @pl.when(i + 1 < n)
    def _():
        for j in range(K):
            window_dma(i + 1, (i + 1) % 2, j).start()

    N = coords_ref.shape[2]
    wC = winx * C
    ivT = jax.lax.broadcasted_iota(jnp.int32, (winy, N), 0)
    ufl = (jax.lax.broadcasted_iota(jnp.int32, (N, wC), 1)
           // C).astype(jnp.float32)
    # channel-condense one-hot over ONE lane tile: the [N, wC] weighted
    # window first folds its wC/128 lane tiles into one with cheap VPU adds
    # (128-aligned slices; 128 % C == 0 keeps the u-stride-C groups intact),
    # then a [128, C] matmul condenses u → c. The former [wC, C] one-hot
    # spent as many MXU passes as the window matmul itself at C/128
    # utilization (measured: this fold cut the fused-gather kernel ~25%).
    jc = jax.lax.broadcasted_iota(jnp.int32, (128, C), 0) % C
    cc = jax.lax.broadcasted_iota(jnp.int32, (128, C), 1)
    M = (jc == cc).astype(jnp.bfloat16)

    for j in range(K):
        rxr = coords_ref[j, 0:1, :]                        # [1, N]
        ryr = coords_ref[j, 1:2, :]
        # y taps via the HAT function too (max(0, 1−|v−ry|)): bitwise equal
        # to the two-tap one-hot for every pixel of a spill-free tile, and
        # spilled tiles are overwritten whole by the exact fixup — so the
        # okyr mask, clip, and fractional split all drop out (the hat
        # pipeline is the kernel's VPU bottleneck, measured).
        # Weights stay f32 (bf16 weights amplify through the softmax-splat
        # normalisation downstream) — values round to bf16 once, at the MXU
        RYT = _hat(ivT.astype(jnp.float32), ryr)

        # x side needs column vectors: exact row->col transpose on the MXU
        # (triple-bf16 split, 1 DEFAULT pass — see _row_to_col)
        xcol = _row_to_col(rxr)
        window_dma(i, i % 2, j).wait()
        # t1[p, uc] = sum_v RYT[v, p] * win[v, uc]  (contract dim0 x dim0)
        t1 = jax.lax.dot_general(RYT.astype(jnp.bfloat16), win_ref[i % 2, j],
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # outT[c, p] = sum_l M[l, c] * s[p, l]
        out_ref[j] = jax.lax.dot_general(M, _x_fold(t1, ufl, xcol, wC),
                                         (((0,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32)


def _gather_fast(img_pad2d, rel_coords, origins, n_tiles, C, winx, K,
                 winy=None, tile=None):
    winy = winy or WINY_G
    tile = tile or GTILE
    N = tile * tile
    kernel = functools.partial(_gather_kernel, C, winx, K, winy)
    scratch = [pltpu.VMEM((2, K, winy, winx * C), jnp.bfloat16),
               pltpu.SemaphoreType.DMA((2, K))]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles // K,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((K, 2, N), lambda i, o: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((K, C, N), lambda i, o: (i, 0, 0)),
        scratch_shapes=scratch,
    )
    out_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, C, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=_INTERPRET,
    )(origins, img_pad2d, rel_coords)
    return jnp.moveaxis(out_t, 1, 2)                       # [ntiles, N, C]


def _gather_origins(sx_t, sy_t, H, W, winy, winx, qx, pady, padx, K,
                    tile, row_base=0):
    """Per-tile adaptive gather window origins.

    Returns (origins_flat for the kernel's scalar prefetch, oy/ox per tile
    for rel-coord and spill-mask computation); row_base (gather_multi's
    stacked-image row offset) is added to the STORED oy only. (A per-K-group
    shared-origin mode was measured in r4 and removed — see the header
    note.)"""
    oy, ox = _origins(sx_t, sy_t, H, W, winy, winx, qx, pady, padx)
    return jnp.stack([oy + row_base, ox], axis=1).reshape(-1), oy, ox


def _sample_coords(flow: jnp.ndarray, H: int, W: int):
    """Reference bwarp sampling positions: p*S/(S-1) - 0.5 (ops/warp.py)."""
    xs = jnp.arange(W, dtype=flow.dtype)
    ys = jnp.arange(H, dtype=flow.dtype)
    sx = (xs[None, :] + flow[..., 0]) * (W / max(W - 1, 1)) - 0.5
    sy = (ys[:, None] + flow[..., 1]) * (H / max(H - 1, 1)) - 0.5
    return sx, sy


_GS = (32 * 32) / (GTILE * GTILE)   # tile-count scale vs the 32-px baseline
GATHER_SPILL_TIERS = (max(8, int(32 * _GS)), max(128, int(512 * _GS)))
                                 # exact-refix capacities (tiles), then full
                                 # (each chosen tier costs ~0.1µs/px of
                                 # exact XLA gather — caps sized to typical
                                 # motion-boundary spill counts)


def _tiered_fix(tile_bad, tiers, fix_with_cap, full, state):
    """Shared spill-fixup tier ladder: no bad tiles → no-op; otherwise the
    smallest tier whose capacity covers the bad count runs its exact refix;
    beyond the last tier the fully exact path takes over. The static cost
    is proportional to the CHOSEN tier, not the worst case — a handful of
    bad tiles pays the small tier, never the full recompute."""
    n_bad = jnp.sum(tile_bad)

    def chain(i):
        if i == len(tiers):
            return full
        return lambda s: jax.lax.cond(
            n_bad <= tiers[i], fix_with_cap(tiers[i]), chain(i + 1), s)

    return jax.lax.cond(n_bad == 0, lambda s: s, chain(0), state)


def _tile_gather_fix(img, sx_t, sy_t, out_t, ok_t, n_tiles, C):
    """Exact fixup at TILE granularity: tiles containing any spilled pixel
    are recomputed with the exact per-element gather and overwritten whole
    (the exact gather agrees with the fast path on in-window pixels, so
    overwriting is safe). Tile-level compaction keeps the machinery cheap
    (nonzero over ~9k tiles, not ~9.4M pixels); tier ladder: _tiered_fix.
    """
    from .warp import grid_sample_bilinear

    tile_bad = ~jnp.all(ok_t, axis=1)              # [ntiles]

    def fix_with_cap(cap):
        def fix(o):
            idx = jnp.nonzero(tile_bad, size=cap, fill_value=n_tiles)[0]
            safe = jnp.minimum(idx, n_tiles - 1)
            px = sx_t[safe]                        # [cap, N] row gather
            py = sy_t[safe]
            vals = grid_sample_bilinear(img[None], px[None], py[None])[0]
            return o.at[idx].set(vals, mode="drop")
        return fix

    def full(o):
        return grid_sample_bilinear(img[None], sx_t.reshape(1, n_tiles, -1),
                                    sy_t.reshape(1, n_tiles, -1))[0]

    return _tiered_fix(tile_bad, GATHER_SPILL_TIERS, fix_with_cap, full,
                       out_t)


def ones_mask_sep(sx, sy, H, W):
    """The bwarp 0.999 validity mask (sampled all-ones image ≥ 0.999) in
    SEPARABLE closed form: valid(x,y) = vx(x)·vy(y) over the rectangular
    frame, so the 4-corner weighted sum factors as gx·gy with
    g = clip(min(s+1, S−s), 0, 1) — ~13 elementwise passes instead of ~35
    (floor/int-casts/4 corner tests all drop out). Fp-identical to the
    corner sum up to 1 ulp at the frame border (Sterbenz: s−floor(s) and
    S−s are exact there); the 0.999 threshold makes flips content-measure-
    zero. The strict-parity path (ops/warp.py) keeps the corner-sum form."""
    gx = jnp.clip(jnp.minimum(sx + 1.0, W - sx), 0.0, 1.0)
    gy = jnp.clip(jnp.minimum(sy + 1.0, H - sy), 0.0, 1.0)
    return (gx * gy >= 0.999).astype(sx.dtype)


def _bwarp_mask_tiled(sx_t, sy_t, H, W):
    """ones_mask_sep on TILED coords [ntiles, N] — lets the packed gather
    apply the mask before its epilogue transpose, with no full-res mask
    tensor materialized."""
    return ones_mask_sep(sx_t, sy_t, H, W)


def gather_at(img: jnp.ndarray, sx: jnp.ndarray, sy: jnp.ndarray,
              planes_out: bool = False,
              bwarp_mask: bool = False) -> jnp.ndarray:
    """Bilinear gather of [H,W,C] `img` at absolute pixel coords sx/sy [H,W]
    (zeros padding) — the tiled fast core shared by bwarp_fast and the
    splat backward pass. Falls back to the exact XLA gather off-TPU or on
    non-TILE-divisible shapes.

    planes_out=True returns the u-plane form [4, H/4, W·C] (the kernel runs
    with us-ordered coords so the epilogue splits into planes with
    minor-preserving transposes only); bwarp_mask=True multiplies by the
    0.999 validity mask in the tiled domain (the bwarp semantics).
    """
    H, W, C = img.shape
    if (H % GTILE or W % GTILE or H < GTILE or W < GTILE
            or (H * W < MIN_FAST_PIXELS and not _INTERPRET)
            or (jax.default_backend() != "tpu" and not _INTERPRET)):
        from .warp import grid_sample_bilinear
        out = grid_sample_bilinear(img[None], sx[None], sy[None])[0]
        if bwarp_mask:
            mask = _bwarp_mask_tiled(sx, sy, H, W)
            out = out * mask[..., None]
        return _planes_from_plain(out) if planes_out else out
    if C > CHUNK:
        # wide images (e.g. feature-splat cotangents, 48+1 ch) chunk along
        # channels: the one-hot matrices scale with winx*C (VMEM budget)
        assert not planes_out, "planes_out requires C <= CHUNK"
        return jnp.concatenate(
            [gather_at(img[..., i:i + CHUNK], sx, sy,
                       bwarp_mask=bwarp_mask)
             for i in range(0, C, CHUNK)], axis=-1)
    cp, winx, qx = _win_geom(C)
    if cp != C:
        img = jnp.pad(img, ((0, 0), (0, 0), (0, cp - C)))
    pady, padx = WINY_G, winx
    tf = (_tile_flatten_us if planes_out
          else functools.partial(_tile_flatten, tile=GTILE))
    sx_t = tf(sx, H, W)
    sy_t = tf(sy, H, W)
    K = _pick_k(W // GTILE)
    origins, oy, ox = _gather_origins(sx_t, sy_t, H, W, WINY_G, winx, qx,
                                      pady, padx, K, GTILE)
    ok_t = _ok_mask(sx_t, sy_t, oy, ox, WINY_G, winx)
    img_pad = jnp.pad(img, ((pady, pady), (padx, padx), (0, 0)))
    Hp, Wp = img_pad.shape[0], img_pad.shape[1]
    n_tiles = (H // GTILE) * (W // GTILE)
    rel = jnp.stack([sx_t - ox[:, None].astype(sx_t.dtype),
                     sy_t - oy[:, None].astype(sy_t.dtype)], axis=1)
    out_t = _gather_fast(
        img_pad.reshape(Hp, Wp * cp).astype(jnp.bfloat16), rel,
        origins, n_tiles, cp, winx, K)[..., :C]
    out_t = _tile_gather_fix(img[..., :C], sx_t, sy_t, out_t, ok_t,
                             n_tiles, C)
    if bwarp_mask:
        out_t = out_t * _bwarp_mask_tiled(sx_t, sy_t, H, W)[..., None]
    return (_tile_planes_us(out_t, H, W) if planes_out
            else _tile_unflatten(out_t, H, W, tile=GTILE))


def gather_multi(imgs, problems, planes_out=False, coords_tiled=False,
                 tiled_out=False):
    """N independent bilinear gathers in ONE kernel launch.

    imgs: list of [H, W, C] source images (same shape); problems: list of
    (img_idx, sx, sy, bwarp_mask) — sx/sy either plain [H, W] fields or
    PRE-TILED [ntiles, N] coords (us-order when planes_out; the packed
    path builds them straight from plane fields via tile_us_from_planes).
    The padded sources stack vertically in HBM and each problem's window
    origins carry its image's base row — the kernel is completely
    unchanged; only the per-launch prologue/epilogue cost is paid once
    instead of N times. Returns a list of per-problem outputs.

    tiled_out=True returns [ntiles, N, C] in GTILE row-major tile order
    (mask + spill fixups applied) with NO untile epilogue — for consumers
    that reduce in tile domain (z_metrics) or feed the splat's tiling
    directly (requires GTILE == TILE there).
    """
    assert not (tiled_out and planes_out)
    H, W, C = imgs[0].shape
    n_tiles = (H // GTILE) * (W // GTILE)
    fallback = (H % GTILE or W % GTILE or H < GTILE or W < GTILE
                or (H * W < MIN_FAST_PIXELS and not _INTERPRET)
                or (jax.default_backend() != "tpu" and not _INTERPRET))
    if fallback:
        outs = []
        for idx, sx, sy, m in problems:
            if coords_tiled:
                # pre-tiled coords: recover plain fields for the fallback
                ty_, tx_ = H // GTILE, W // GTILE
                q = GTILE // 4

                def unt(a):
                    a = a.reshape(ty_ * tx_, 4, q, q, 4)
                    ps = []
                    for u in range(4):
                        p = a[:, u].reshape(ty_, tx_, q, q, 4)
                        p = jnp.transpose(p, (0, 2, 1, 3, 4))
                        ps.append(p.reshape(H // 4, W))
                    flat = jnp.stack(ps, 1)            # [H/4, 4, W]
                    return flat.reshape(H, W)
                sx, sy = unt(sx), unt(sy)
            out = gather_at(imgs[idx], sx, sy, planes_out=planes_out,
                            bwarp_mask=m)
            if tiled_out:
                out = _tile_flatten(out, H, W, tile=GTILE)
            outs.append(out)
        return outs
    assert C <= CHUNK
    cp, winx, qx = _win_geom(C)
    pady, padx = WINY_G, winx
    imgs_p = []
    for img in imgs:
        if cp != C:
            img = jnp.pad(img, ((0, 0), (0, 0), (0, cp - C)))
        imgs_p.append(jnp.pad(img, ((pady, pady), (padx, padx), (0, 0))))
    Hp, Wp = imgs_p[0].shape[0], imgs_p[0].shape[1]
    stack = jnp.concatenate(imgs_p, axis=0)            # [n_img·Hp, Wp, cp]

    tf = (_tile_flatten_us if planes_out
          else functools.partial(_tile_flatten, tile=GTILE))
    K = _pick_k(W // GTILE)
    per = []
    all_origins, all_rel = [], []
    for idx, sx, sy, m in problems:
        sx_t = sx if coords_tiled else tf(sx, H, W)
        sy_t = sy if coords_tiled else tf(sy, H, W)
        origins, oy, ox = _gather_origins(sx_t, sy_t, H, W, WINY_G, winx,
                                          qx, pady, padx, K, GTILE,
                                          row_base=idx * Hp)
        ok_t = _ok_mask(sx_t, sy_t, oy, ox, WINY_G, winx)
        all_origins.append(origins)
        all_rel.append(jnp.stack(
            [sx_t - ox[:, None].astype(sx_t.dtype),
             sy_t - oy[:, None].astype(sy_t.dtype)], axis=1))
        per.append((idx, sx_t, sy_t, ok_t, m))

    P = len(problems)
    out_all = _gather_fast(
        stack.reshape(len(imgs) * Hp, Wp * cp).astype(jnp.bfloat16),
        jnp.concatenate(all_rel, 0), jnp.concatenate(all_origins, 0),
        P * n_tiles, cp, winx, K)[..., :C]

    outs = []
    for pi, (idx, sx_t, sy_t, ok_t, m) in enumerate(per):
        out_t = out_all[pi * n_tiles:(pi + 1) * n_tiles]
        out_t = _tile_gather_fix(imgs[idx][..., :C], sx_t, sy_t, out_t,
                                 ok_t, n_tiles, C)
        if m:
            out_t = out_t * _bwarp_mask_tiled(sx_t, sy_t, H, W)[..., None]
        if tiled_out:
            outs.append(out_t)
        else:
            outs.append(_tile_planes_us(out_t, H, W) if planes_out
                        else _tile_unflatten(out_t, H, W, tile=GTILE))
    return outs


def gather_z_multi(imgs, problems):
    """The z-metric warps in ONE gather launch + XLA reduce.

    problems: list of (img_idx, sx, sy, self_img); each returns the row
    z = Σ_c |self_c − m·gather(imgs[img_idx])_c| as [ntiles, N] in GTILE
    row-major tile order, with m the bwarp 0.999 validity mask (callers
    apply z_alpha/C to the returned sum, which reorders the z_alpha
    multiply vs the reference mean(α·|d|) by ~1 ulp). An in-kernel
    reduction variant (ZKERNEL) measured slightly SLOWER than this chain
    (113 vs 109 ms z-stage/pair, r4) and was removed — XLA fuses the
    mask/diff/abs/sum passes well enough that skipping the warped frame's
    HBM round trip did not pay.
    Reference: softsplat importance z = α·mean|x0 − bwarp(x1, flow)|
    (/root/reference/fLDRnet.py:439-446).
    """
    H, W, C = imgs[0].shape
    # tiled-domain API: the [ntiles, N] return form only exists for
    # GTILE-divisible shapes (callers reach this via the packed path, which
    # can_use_packed already restricts to %32 geometry)
    if H % GTILE or W % GTILE:
        raise ValueError(f"gather_z_multi needs GTILE({GTILE})-divisible "
                         f"shapes, got {H}x{W}")
    outs = gather_multi(imgs,
                        [(i, sx, sy, True) for i, sx, sy, _ in problems],
                        tiled_out=True)
    return [jnp.sum(jnp.abs(_tile_flatten(s, H, W, tile=GTILE) - o),
                    axis=-1)
            for o, (_, _, _, s) in zip(outs, problems)]


def bwarp_fast(x: jnp.ndarray, flow: jnp.ndarray,
               with_mask: bool = True,
               planes_out: bool = False) -> jnp.ndarray:
    """Drop-in fast replacement for ops.warp.bwarp (inference path).

    x: [B, H, W, C] f32; flow: [B, H, W, 2]. Exact semantics (zeros padding,
    0.999 ones-mask threshold). H, W must be TILE-divisible (callers in the
    model guarantee this; otherwise falls back to the XLA path).
    planes_out=True returns the u-plane form [B, 4, H/4, W·C].
    """
    B, H, W, C = x.shape
    if (H % GTILE or W % GTILE or H < GTILE or W < GTILE
            or (H * W < MIN_FAST_PIXELS and not _INTERPRET)
            or (jax.default_backend() != "tpu" and not _INTERPRET)):
        from .warp import bwarp
        out = bwarp(x, flow, with_mask)
        if planes_out:
            out = jnp.stack([_planes_from_plain(out[b]) for b in range(B)], 0)
        return out
    in_dtype = x.dtype
    x = x.astype(jnp.float32)
    flow = flow.astype(jnp.float32)

    def one(img, fl):
        sx, sy = _sample_coords(fl, H, W)
        if planes_out:
            return gather_at(img, sx, sy, planes_out=True,
                             bwarp_mask=with_mask)
        out = gather_at(img, sx, sy)
        if not with_mask:
            return out
        # the ones-mask needs no gather: separable closed form
        return out * ones_mask_sep(sx, sy, H, W)[..., None]

    # B is small (1 at eval); unrolling avoids vmap's SMEM-prefetch blowup
    return jnp.stack([one(x[b], flow[b]) for b in range(B)], 0).astype(in_dtype)


# ---------------------------------------------------------------------------
# splat (forward warp, summation mode)
# ---------------------------------------------------------------------------

STRIPH = OYR_S + TILE + WINY_S   # strip rows in VMEM (256); while row r is
                                 # processed it covers canvas rows
                                 # [32r−OYR_S, 32r+TILE+WINY_S)

_YWIN = 128                # y-window rows for the factored-placement splat


def _ywin_on() -> bool:
    """Factored-placement splat (both splat kernels), DEFAULT since r5
    (R5E-1: 4.847 vs 4.807 fps A/B on otherwise-final defaults; goldenclip
    44.1027 == the ZH anchor, R5D-1). FLDRX_SPLAT_YWIN=0 restores the
    strip-wide contribution. Factor the
    [STRIPH, N] strip contribution into a [_YWIN, N] window matmul plus a
    one-hot PLACEMENT matmul. The window follows each tile's mean target
    (gather-style per-tile adaptive origin, clamped into the strip), so the
    N-contraction runs at 128 output rows instead of 256: per tile
    32 + 16 passes (window + 2-split placement) replace the 64-pass
    strip-wide contribution — −22% kernel MXU. The placement splits the f32
    contribution into hi/lo bf16 halves (error ≤ ~2⁻¹⁶ relative, far inside
    the fast path's existing bf16 envelope); reach for coherent motion is
    unchanged (the window tracks the tile mean) but intra-tile target
    spread beyond ~126 rows now spills to the exact fixup tiers (the
    strip-wide form handled ~222). Measure before defaulting."""
    return bool(int(os.environ.get("FLDRX_SPLAT_YWIN", "1")))


def _ywin_origin(ty_t: jnp.ndarray, oy: jnp.ndarray) -> jnp.ndarray:
    """Per-tile adaptive y-window origin, STRIP-RELATIVE (canvas-offset
    rows), clamped so the whole window lies inside the strip."""
    cy = jnp.mean(ty_t, axis=1) - oy.astype(ty_t.dtype)
    return jnp.clip(jnp.round(cy - _YWIN / 2).astype(jnp.int32),
                    0, STRIPH - _YWIN)


def _splat_kernel(C, winx, K, tx, ty, n_problems, ywin, origins_ref,
                  coords_ref, vals_ref, out_hbm, strip_ref, sem):
    """Strip-accumulator splat: NO read-modify-write DMA at all.

    Tiles stream row-major; a [STRIPH, Wp·C] f32 strip in VMEM covers canvas
    rows [32r−OYR_S, 32r−OYR_S+STRIPH) while tile-row r is processed; every
    tile adds its [WINY_S, winx·C] contribution at one of SPLAT_M
    sublane-STATIC row offsets (predicated branches — a dynamic sublane
    offset costs ~12µs/tile on Mosaic, measured) and a 128-aligned dynamic
    lane offset. On row advance the TILE finalized rows flush to HBM as ONE
    contiguous full-width write (the next row's windows start ≥ TILE lower,
    so those rows can no longer change), the strip shifts down TILE rows
    (forward-ordered chunked copy — reads stay ahead of writes), and the
    fresh tail zeroes. The old per-window RMW serialized two strided DMAs
    per tile; this writes each output byte exactly once.

    n_problems > 1: the grid sweeps N stacked problems continuously (one
    [seg, WpC] output segment each); at a problem boundary the whole strip
    drains into the previous problem's tail and resets — same structure as
    _splat_kernel_up, PLAIN row layout (the flow recurrence's feature warps
    need plain outputs for the convs that follow; the u-plane form would
    round-trip through interleaves, measured slower in context).
    n_problems == 1 keeps the original two-branch flush codegen (predicated
    static branches cost ~2 ms/launch each, measured).
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)
    spr = tx // K                      # grid steps per tile-row
    N = coords_ref.shape[2]
    wC = winx * C
    seg = ty * TILE + STRIPH - TILE    # output rows per problem

    @pl.when(i == 0)
    def _():
        strip_ref[...] = jnp.zeros_like(strip_ref)

    def shift_strip():
        for c in range((STRIPH - TILE) // TILE):
            strip_ref[c * TILE:(c + 1) * TILE] = (
                strip_ref[(c + 1) * TILE:(c + 2) * TILE])
        strip_ref[STRIPH - TILE:STRIPH] = jnp.zeros(
            (TILE, strip_ref.shape[1]), jnp.float32)

    if n_problems == 1:
        @pl.when((i % spr == 0) & (i > 0))
        def _():
            r = i // spr
            # rows [32(r-1)-TILE, 32r-TILE) are final → buffer row 32(r-1)
            dst = pl.multiple_of((r - 1) * TILE, 8)
            flush = pltpu.make_async_copy(
                strip_ref.at[0:TILE], out_hbm.at[pl.ds(dst, TILE)], sem)
            flush.start()
            flush.wait()
            shift_strip()
    else:
        @pl.when((i % spr == 0) & (i > 0))
        def _():
            r = i // spr
            lr = r % ty
            p = r // ty

            @pl.when(lr == 0)
            def _():
                # problem boundary: drain the previous problem's strip
                dst = pl.multiple_of((p - 1) * seg + (ty - 1) * TILE, 8)
                flush = pltpu.make_async_copy(
                    strip_ref, out_hbm.at[pl.ds(dst, STRIPH)], sem)
                flush.start()
                flush.wait()
                strip_ref[...] = jnp.zeros_like(strip_ref)

            @pl.when(lr != 0)
            def _():
                dst = pl.multiple_of(p * seg + (lr - 1) * TILE, 8)
                flush = pltpu.make_async_copy(
                    strip_ref.at[0:TILE], out_hbm.at[pl.ds(dst, TILE)], sem)
                flush.start()
                flush.wait()
                shift_strip()

    if ywin:
        # factored placement (see _ywin_on): window + placement one-hots;
        # the plain kernel's row map is the identity
        iv128 = jax.lax.broadcasted_iota(
            jnp.int32, (_YWIN, N), 0).astype(jnp.float32)
        ysP = jax.lax.broadcasted_iota(jnp.int32, (STRIPH, _YWIN), 0)
        rP = jax.lax.broadcasted_iota(jnp.int32, (STRIPH, _YWIN), 1)
    else:
        ivT = jax.lax.broadcasted_iota(jnp.int32, (STRIPH, N), 0)
    ufl = (jax.lax.broadcasted_iota(jnp.int32, (N, wC), 1)
           // C).astype(jnp.float32)

    # Ve via ONE one-lane-tile one-hot matmul + lane-tile copies:
    # v128[p, u*C+c (u<128/C)] = vals[p, c] straight from the transposed
    # vals rows (rep128 contracts the C dim, transposing and replicating in
    # one 8-pass matmul; DEFAULT precision rounds values to bf16 exactly as
    # the former [C, wC] rep matmul did, and the contrib matmul re-rounds to
    # bf16 regardless). The wide Ve is then wC/128 cheap VPU copies.
    # (pltpu.repeat lowers to winx sequential copies — measured ~11µs/tile;
    # the former full-width rep matmul cost 32 MXU passes/tile.)
    rep128 = (jax.lax.broadcasted_iota(jnp.int32, (C, 128), 1) % C
              == jax.lax.broadcasted_iota(jnp.int32, (C, 128), 0)).astype(
                  jnp.float32)

    for j in range(K):
        g = i * K + j
        if ywin:
            colC = pl.multiple_of(origins_ref[2 * g], 128)
            yw = origins_ref[2 * g + 1]
        else:
            colC = pl.multiple_of(origins_ref[g], 128)
        txr = coords_ref[j, 0:1, :]                       # strip-relative
        tyr = coords_ref[j, 1:2, :]
        # STRIP-wide hat one-hot: the target's vertical position is absorbed
        # here (full ±OYR_S continuous reach, sublane-static strip add).
        # Hat form needs no okyr/clip: spilled tiles' X coords are pushed to
        # −1e6 on the XLA side (CXe hats them to zero), and for surviving
        # tiles _ok_mask guarantees floor(ty) ∈ [0, STRIPH−2] — including
        # the (STRIPH−2, STRIPH−1) fractional band, which the former
        # iota-compare + okyr ≤ STRIPH−2 mask wrongly dropped (its x twin
        # okx ≤ winx−2 dropped the (winx−2, winx−1) band the same way).
        if ywin:
            RYT = _hat(iv128, tyr - yw.astype(jnp.float32))
        else:
            RYT = _hat(ivT.astype(jnp.float32), tyr)

        xcol = _row_to_col(txr)  # exact row->col, 1 DEFAULT MXU pass
        # hat taps; spilled tiles' pushed coords hat to zero and are
        # re-added exactly by the fixup
        CXe = _hat(ufl, xcol)

        # transpose + lane-replicate vals in ONE matmul (see rep128 note)
        v128 = jax.lax.dot_general(vals_ref[j], rep128,
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        contrib = _splat_contrib(RYT, CXe, v128, wC)
        if ywin:
            P = (ysP == rP + yw).astype(jnp.bfloat16)
            chi = contrib.astype(jnp.bfloat16)
            clo = (contrib - chi.astype(jnp.float32)).astype(jnp.bfloat16)
            placed = (
                jax.lax.dot_general(P, chi, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(P, clo, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32))
            strip_ref[:, pl.ds(colC, wC)] = (
                strip_ref[:, pl.ds(colC, wC)] + placed)
        else:
            strip_ref[:, pl.ds(colC, wC)] = (
                strip_ref[:, pl.ds(colC, wC)] + contrib)

    @pl.when(i == n - 1)
    def _():
        dst = pl.multiple_of((n_problems - 1) * seg + (ty - 1) * TILE, 8)
        flush = pltpu.make_async_copy(
            strip_ref, out_hbm.at[pl.ds(dst, STRIPH)], sem)
        flush.start()
        flush.wait()


def _splat_fast(valsT, rel_coords, origins, H, W, C, winx, K,
                n_problems=1, n_vals=None):
    """Output buffer rows map canvas rows [−OYR_S, H+STRIPH−TILE−OYR_S) →
    [0, H+STRIPH−TILE); image rows = buffer [OYR_S, OYR_S+H). With
    n_problems > 1 returns a LIST of per-problem [H, W, C] plain images
    (one continuous strip sweep; see _splat_kernel); n_vals routes problem
    p to vals set p % n_vals via the index_map (cross-problem sharing)."""
    N = TILE * TILE
    ty, tx = H // TILE, W // TILE
    n_tiles = ty * tx
    padx = winx
    WpC = (W + 2 * padx) * C
    seg = H + STRIPH - TILE
    spp = n_tiles // K                 # grid steps per problem
    if n_vals:
        vspec = pl.BlockSpec(
            (K, C, N),
            lambda i, o: (((i // spp) % n_vals) * spp + i % spp, 0, 0))
    else:
        vspec = pl.BlockSpec((K, C, N), lambda i, o: (i, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_problems * n_tiles // K,),
        in_specs=[
            pl.BlockSpec((K, 2, N), lambda i, o: (i, 0, 0)),     # coords
            vspec,                                               # values^T
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[
            pltpu.VMEM((STRIPH, WpC), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    acc = pl.pallas_call(
        functools.partial(_splat_kernel, C, winx, K, tx, ty, n_problems,
                          _ywin_on()),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_problems * seg, WpC), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=_INTERPRET,
    )(origins, rel_coords, valsT)
    acc = acc.reshape(n_problems * seg, W + 2 * padx, C)
    outs = [acc[p * seg + OYR_S:p * seg + OYR_S + H, padx:padx + W]
            for p in range(n_problems)]
    return outs[0] if n_problems == 1 else outs


def _splat_kernel_up(C, winx, K, tx, ty_local, n_problems, ywin, *refs):
    """Strip-accumulator splat with a u-MAJOR strip that flushes directly
    into u-planes (see the u-plane layout note above), processing
    N_PROBLEMS independent splats in one continuous sweep.

    The strip's physical row r' = u·Q + k holds canvas-offset row 4k + u
    (Q = STRIPH/4): the y one-hot is built against that row→offset map (a
    free iota transform), row-advance shifts move TILE/4 rows per u-group,
    and each flush is four 8-row contiguous DMAs into the per-u output
    planes — every slice stays 8-aligned, every DMA row-contiguous. At a
    problem boundary the whole strip drains into the previous problem's
    tail region and resets, so problems never bleed into each other. The
    hat-form one-hot needs no okx/okyr: sources of spilled tiles are
    zeroed on the XLA side and re-added exactly by the fixup.

    (A `scaled` cross-t coord-sharing variant — tiled base flow + per-
    problem t scalars, coords rebuilt in-kernel — was removed with the
    cross-t t_fuse path it served: t_fuse measured neutral twice on TPU.)
    """
    origins_ref, coords_ref, vals_ref, out_hbm, strip_ref, sems = refs
    i = pl.program_id(0)
    n = pl.num_programs(0)
    spr = tx // K                      # grid steps per tile-row
    N = coords_ref.shape[2]
    wC = winx * C
    Q = STRIPH // 4
    G = TILE // 4                      # flushed rows per u-group per advance
    seg4 = (ty_local * TILE + STRIPH - TILE) // 4   # plane rows per problem

    def full_drain(dst):
        flushes = []
        for u in range(4):
            f = pltpu.make_async_copy(
                strip_ref.at[u * Q:(u + 1) * Q],
                out_hbm.at[u, pl.ds(pl.multiple_of(dst, 8), Q)],
                sems.at[u])
            f.start()
            flushes.append(f)
        for f in flushes:
            f.wait()

    @pl.when(i == 0)
    def _():
        strip_ref[...] = jnp.zeros_like(strip_ref)

    @pl.when((i % spr == 0) & (i > 0))
    def _():
        r = i // spr
        lr = r % ty_local
        p = r // ty_local

        @pl.when(lr == 0)
        def _():
            # problem boundary: drain the previous problem's whole strip
            full_drain((p - 1) * seg4 + (ty_local - 1) * G)
            strip_ref[...] = jnp.zeros_like(strip_ref)

        @pl.when(lr != 0)
        def _():
            dst = p * seg4 + (lr - 1) * G
            flushes = []
            for u in range(4):
                f = pltpu.make_async_copy(
                    strip_ref.at[u * Q:u * Q + G],
                    out_hbm.at[u, pl.ds(pl.multiple_of(dst, 8), G)],
                    sems.at[u])
                f.start()
                flushes.append(f)
            for f in flushes:
                f.wait()
            for u in range(4):
                base = u * Q
                for c in range((Q - G) // G):
                    strip_ref[base + c * G:base + (c + 1) * G] = (
                        strip_ref[base + (c + 1) * G:base + (c + 2) * G])
                strip_ref[base + Q - G:base + Q] = jnp.zeros(
                    (G, strip_ref.shape[1]), jnp.float32)

    # physical strip row u*Q+k ↔ canvas offset 4k+u
    if ywin:
        # factored placement (see _ywin_on): [_YWIN, N] window one-hot +
        # [STRIPH, _YWIN] placement one-hot built from the same row map
        iv128 = jax.lax.broadcasted_iota(
            jnp.int32, (_YWIN, N), 0).astype(jnp.float32)
        sP = jax.lax.broadcasted_iota(jnp.int32, (STRIPH, _YWIN), 0)
        ysP = (sP % Q) * 4 + sP // Q          # canvas offset of phys row s
        rP = jax.lax.broadcasted_iota(jnp.int32, (STRIPH, _YWIN), 1)
    else:
        ivp = jax.lax.broadcasted_iota(jnp.int32, (STRIPH, N), 0)
        ivT = ((ivp % Q) * 4 + ivp // Q).astype(jnp.float32)
    ufl = (jax.lax.broadcasted_iota(jnp.int32, (N, wC), 1)
           // C).astype(jnp.float32)
    rep128 = (jax.lax.broadcasted_iota(jnp.int32, (C, 128), 1) % C
              == jax.lax.broadcasted_iota(jnp.int32, (C, 128), 0)).astype(
                  jnp.float32)

    for j in range(K):
        g = i * K + j
        if ywin:
            colC = pl.multiple_of(origins_ref[2 * g], 128)
            yw = origins_ref[2 * g + 1]
        else:
            colC = pl.multiple_of(origins_ref[g], 128)
        txr = coords_ref[j, 0:1, :]                       # strip-relative
        tyr = coords_ref[j, 1:2, :]
        # hat-form one-hot against the u-major row map; no okyr —
        # spilled tiles' pushed X coords hat to zero
        if ywin:
            RYT = _hat(iv128, tyr - yw.astype(jnp.float32))
        else:
            RYT = _hat(ivT, tyr)

        xcol = _row_to_col(txr)  # exact row->col, 1 DEFAULT MXU pass
        CXe = _hat(ufl, xcol)

        # transpose + lane-replicate vals in ONE matmul (see _splat_kernel)
        v128 = jax.lax.dot_general(vals_ref[j], rep128,
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        contrib = _splat_contrib(RYT, CXe, v128, wC)
        if ywin:
            # 2-split placement: P is an exact 0/1 bf16 one-hot; the f32
            # window contribution rides as hi+lo bf16 halves (placement
            # error ≤ ~2⁻¹⁶ relative — see _ywin_on)
            P = (ysP == rP + yw).astype(jnp.bfloat16)
            chi = contrib.astype(jnp.bfloat16)
            clo = (contrib - chi.astype(jnp.float32)).astype(jnp.bfloat16)
            placed = (
                jax.lax.dot_general(P, chi, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(P, clo, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32))
            strip_ref[:, pl.ds(colC, wC)] = (
                strip_ref[:, pl.ds(colC, wC)] + placed)
        else:
            strip_ref[:, pl.ds(colC, wC)] = (
                strip_ref[:, pl.ds(colC, wC)] + contrib)

    @pl.when(i == n - 1)
    def _():
        full_drain((n_problems - 1) * seg4 + (ty_local - 1) * G)


def _splat_fast_planes(valsT, rel_coords, origins, H, W, C, winx, K,
                       n_problems=1, n_vals=None):
    """u-plane splat launch over n_problems stacked problems: output
    [4, n_problems·seg4, WpC]; within a problem's segment, canvas row y
    lives at plane y%4, segment row y//4 + OYR_S/4.

    n_vals: cross-problem vals sharing — valsT holds only n_vals distinct
    problems' values ([n_vals·ntiles, C, N]) and problem p reads vals set
    p % n_vals via the BlockSpec index_map (splat_multi dedupes repeated
    vals objects; without sharing the XLA prologue materializes and pins a
    concat copy per problem — ~150 MB each at 4K).

    With the FLDRX_SPLAT_YWIN gate on, `origins` interleaves TWO scalars
    per tile (lane offset, y-window origin) — callers build it via
    _ywin_origin."""
    N = TILE * TILE
    ty, tx = H // TILE, W // TILE
    padx = winx
    WpC = (W + 2 * padx) * C
    seg4 = (H + STRIPH - TILE) // 4
    spp = ty * tx // K                    # grid steps per problem
    if n_vals:
        vspec = pl.BlockSpec(
            (K, C, N),
            lambda i, o: (((i // spp) % n_vals) * spp + i % spp, 0, 0))
    else:
        vspec = pl.BlockSpec((K, C, N), lambda i, o: (i, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_problems * ty * tx // K,),
        in_specs=[pl.BlockSpec((K, 2, N), lambda i, o: (i, 0, 0)), vspec],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[
            pltpu.VMEM((STRIPH, WpC), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    acc = pl.pallas_call(
        functools.partial(_splat_kernel_up, C, winx, K, tx, ty, n_problems,
                          _ywin_on()),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, n_problems * seg4, WpC),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=_INTERPRET,
    )(origins, rel_coords, valsT)
    # slice each problem's image region: canvas row y ↔ plane y%4,
    # segment row y//4 + OYR_S/4
    r0 = OYR_S // 4
    return [acc[:, p * seg4 + r0:p * seg4 + r0 + H // 4,
                padx * C:(padx + W) * C]
            for p in range(n_problems)]


SPLAT_SPILL_TIERS = (8, 64, 512)   # exact-refix capacities (source tiles);
                                   # first tier tiny: real-content splat
                                   # spills are ~8 tiles (measured 4K) and
                                   # each cap costs ~0.1µs/px when chosen


def _tile_xy_iota(H, W, tile=TILE):
    """[ntiles, N] global x / y of every tile pixel (row-major tiles), built
    from iota — lets spill-fixup branches rebuild coords instead of
    capturing materialized coord arrays (lax.cond operands pin)."""
    ty_, tx_ = H // tile, W // tile
    g = jnp.arange(ty_ * tx_, dtype=jnp.int32)[:, None]
    nn = jnp.arange(tile * tile, dtype=jnp.int32)[None, :]
    xs = ((g % tx_) * tile + nn % tile).astype(jnp.float32)
    ys = ((g // tx_) * tile + nn // tile).astype(jnp.float32)
    return xs, ys


def _tile_splat_fix(out_fast, vals_t, tx_t, ty_t, ok_t, n_tiles, H, W, C,
                    planes: bool = False):
    """Exact scatter-add for source tiles containing any spilled pixel.

    The fast kernel zeroes ALL sources of such tiles; here the tile's 1024
    sources are scatter-added exactly (4 corners, OOB dropped). Tile-level
    compaction avoids a 9.4M-element nonzero; over SPLAT_SPILL_TILES bad
    tiles falls back to the fully exact XLA splat. planes=True operates on
    the u-plane layout [4, H/4, W·C] (target rows remapped).

    tx_t/ty_t may be a zero-arg CALLABLE returning the coord pair — traced
    inside each cond branch, so the full coords only materialize when tiles
    actually spill (the coord-sharing path captures just base flow + scale)."""
    tile_bad = ~jnp.all(ok_t, axis=1)

    def coords():
        return tx_t() if callable(tx_t) else (tx_t, ty_t)

    def fix_with_cap(cap):
        def fix(o):
            cx, cy = coords()
            idx = jnp.nonzero(tile_bad, size=cap, fill_value=n_tiles)[0]
            safe = jnp.minimum(idx, n_tiles - 1)
            keep = (idx < n_tiles).astype(jnp.float32)
            px = cx[safe].reshape(-1)
            py = cy[safe].reshape(-1)
            v = (vals_t[safe] * keep[:, None, None]).reshape(-1, C)
            x0 = jnp.floor(px)
            y0 = jnp.floor(py)
            fx = px - x0
            fy = py - y0
            x0i = x0.astype(jnp.int32)
            y0i = y0.astype(jnp.int32)
            flat = o.reshape(H * W, C)
            for xi, yi, w in (
                (x0i, y0i, (1 - fx) * (1 - fy)),
                (x0i + 1, y0i, fx * (1 - fy)),
                (x0i, y0i + 1, (1 - fx) * fy),
                (x0i + 1, y0i + 1, fx * fy),
            ):
                valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
                if planes:
                    # u-plane flat row: plane y%4, in-plane row y//4, col x
                    row = ((yi % 4) * (H // 4) + yi // 4) * W + xi
                else:
                    row = yi * W + xi
                tgt = jnp.where(valid, row, H * W)
                flat = flat.at[tgt].add(v * w[:, None], mode="drop")
            return flat.reshape(out_fast.shape)
        return fix

    def full(o):
        from .splat import splat_sum
        cx, cy = coords()
        xs = jnp.arange(W, dtype=jnp.float32)
        ys = jnp.arange(H, dtype=jnp.float32)
        tx = _tile_unflatten(cx[..., None], H, W)[..., 0]
        ty = _tile_unflatten(cy[..., None], H, W)[..., 0]
        vals = _tile_unflatten(vals_t, H, W)
        flow = jnp.stack([tx - xs[None, :], ty - ys[:, None]], -1)
        res = splat_sum(vals[None], flow[None])[0]
        return _planes_from_plain(res) if planes else res

    return _tiered_fix(tile_bad, SPLAT_SPILL_TIERS, fix_with_cap, full,
                       out_fast)


def splat_sum_fast(inp: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Drop-in fast replacement for ops.splat.splat_sum (inference path).
    inp: [B, H, W, C]; flow: [B, H, W, 2]."""
    B, H, W, C = inp.shape
    if (H % TILE or W % TILE or H < TILE or W < TILE
            or (H * W < MIN_FAST_PIXELS and not _INTERPRET)
            or (jax.default_backend() != "tpu" and not _INTERPRET)):
        from .splat import splat_sum
        return splat_sum(inp, flow)
    if C > CHUNK:
        # wide inputs (feature splats: 48+1 ch) chunk along channels — the
        # one-hot matrices scale with winx*C and must stay within VMEM
        outs = [splat_sum_fast(inp[..., i:i + CHUNK], flow)
                for i in range(0, C, CHUNK)]
        return jnp.concatenate(outs, axis=-1)
    in_dtype = inp.dtype
    inp = inp.astype(jnp.float32)
    flow = flow.astype(jnp.float32)

    def one(img, fl):
        xs = jnp.arange(W, dtype=fl.dtype)
        ys = jnp.arange(H, dtype=fl.dtype)
        tx = xs[None, :] + fl[..., 0]
        ty = ys[:, None] + fl[..., 1]
        return splat_at(img, tx, ty)

    return jnp.stack([one(inp[b], flow[b]) for b in range(B)], 0).astype(in_dtype)


def splat_at(vals: jnp.ndarray, tx: jnp.ndarray, ty: jnp.ndarray,
             planes_out: bool = False) -> jnp.ndarray:
    """Bilinear scatter-add of [H,W,C] `vals` to absolute target coords tx/ty
    [H,W] (out-of-frame corners dropped) — the tiled fast core shared by
    splat_sum_fast and the gather backward pass. Falls back to the exact
    XLA scatter off-TPU or on non-TILE-divisible shapes.

    planes_out=True returns the u-plane form [4, H/4, W·Cp] — NOTE: with
    channels PADDED to the kernel's quantum Cp (4 or 8); consumers view a
    plane as [H/4, W, Cp] and slice the real channels (a fused read —
    materializing the slice would reintroduce the narrow-minor copy the
    planes form exists to avoid)."""
    H, W, C = vals.shape
    if (H % TILE or W % TILE or H < TILE or W < TILE
            or (H * W < MIN_FAST_PIXELS and not _INTERPRET)
            or (jax.default_backend() != "tpu" and not _INTERPRET)):
        from .splat import splat_sum
        xs = jnp.arange(W, dtype=tx.dtype)
        ys = jnp.arange(H, dtype=ty.dtype)
        flow = jnp.stack([tx - xs[None, :], ty - ys[:, None]], -1)
        out = splat_sum(vals[None], flow[None])[0]
        if planes_out:
            cp = _win_geom(C, wide=False)[0]
            if cp != C:
                out = jnp.pad(out, ((0, 0), (0, 0), (0, cp - C)))
            return _planes_from_plain(out)
        return out
    if C > CHUNK:
        assert not planes_out, "planes_out requires C <= CHUNK"
        outs = [splat_at(vals[..., i:i + CHUNK], tx, ty)
                for i in range(0, C, CHUNK)]
        return jnp.concatenate(outs, axis=-1)
    cp, winx, qx = _win_geom(C, wide=False)
    K = _pick_k(W // TILE)
    if cp != C:
        vals = jnp.pad(vals, ((0, 0), (0, 0), (0, cp - C)))
    padx = winx
    txn = W // TILE
    tx_t = _tile_flatten(tx, H, W)
    ty_t = _tile_flatten(ty, H, W)
    vals_t = _tile_flatten(vals, H, W)
    oy, ox = _origins_strip(tx_t, ty_t, txn, W, WINY_S, winx, qx, padx)
    if _ywin_on():
        yw = _ywin_origin(ty_t, oy)
        ok_t = _ok_mask(tx_t, ty_t, oy + yw, ox, _YWIN, winx)
        origins = jnp.stack([(ox + padx) * cp, yw], 1).reshape(-1)
    else:
        ok_t = _ok_mask(tx_t, ty_t, oy, ox, STRIPH, winx)
        origins = (ox + padx) * cp        # strip lane offsets (128-aligned)
    n_tiles = ok_t.shape[0]
    # tiles with any spilled source are zeroed wholesale in the fast kernel
    # and re-added exactly by the tile fixup
    # spilled tiles are neutralized by pushing their COORDS out of every
    # window (hat/okx weights become zero) instead of zeroing their vals:
    # the tiled values then do not depend on the coords, so multi-t chunk
    # programs CSE one vals array across all t-values
    tile_bad = (~jnp.all(ok_t, axis=1)).astype(tx_t.dtype)[:, None]
    rel = jnp.stack(
        [tx_t - ox[:, None].astype(tx_t.dtype) - tile_bad * 1e6,
         ty_t - oy[:, None].astype(ty_t.dtype)], axis=1)
    valsT = jnp.moveaxis(vals_t, 1, 2)                    # [ntiles, C, N]
    if planes_out:
        out = _splat_fast_planes(valsT, rel, origins, H, W, cp, winx, K)[0]
        return _tile_splat_fix(out, vals_t, tx_t, ty_t, ok_t,
                               n_tiles, H, W, cp, planes=True)
    out = _splat_fast(valsT, rel, origins, H, W, cp, winx, K)[..., :C]
    return _tile_splat_fix(out, vals_t[..., :C], tx_t, ty_t, ok_t,
                           n_tiles, H, W, C)


def splat_multi(problems, vals_tiled=False, planes=True):
    """N independent bilinear scatter-adds in ONE kernel launch.

    problems: list of (vals [H,W,C], tx [H,W], ty [H,W]) — same shapes.
    The kernel sweeps all problems' tiles in one continuous strip pass
    (per-problem boundary drains), paying the launch prologue once.
    Returns a list of u-plane outputs [4, H/4, W·Cp] (channels padded to
    the kernel quantum Cp — see splat_at planes_out), or with planes=False
    PLAIN [H, W, C] outputs (the flow recurrence's feature warps feed convs
    that need plain layout — the u-plane form cost a plane→plain interleave
    round trip per chunk, measured slower in context: flow 156→279 ms).

    vals_tiled=True: each problem's vals arrive PRE-TILED [ntiles, N, C]
    in TILE row-major order (the tiled z/vals chain skips the full-res
    round trip); tx/ty stay plain [H, W] fields."""
    if vals_tiled:
        H, W = problems[0][1].shape
        C = problems[0][0].shape[-1]
    else:
        H, W, C = problems[0][0].shape
    fallback = (H % TILE or W % TILE or H < TILE or W < TILE
                or (H * W < MIN_FAST_PIXELS and not _INTERPRET)
                or (jax.default_backend() != "tpu" and not _INTERPRET))
    if fallback:
        return [splat_at(_tile_unflatten(v, H, W) if vals_tiled else v,
                         tx, ty, planes_out=planes)
                for v, tx, ty in problems]
    assert C <= CHUNK
    cp, winx, qx = _win_geom(C, wide=False)
    K = _pick_k(W // TILE)
    padx = winx
    txn = W // TILE
    per, all_origins, all_rel = [], [], []
    vseen, vlist, vids = {}, [], []       # dedupe repeated vals OBJECTS
    for vals, tx, ty in problems:
        if id(vals) not in vseen:
            v = vals
            if cp != C:
                v = jnp.pad(v, ((0, 0), (0, 0), (0, cp - C)))
            v_t = v if vals_tiled else _tile_flatten(v, H, W)
            vseen[id(vals)] = (len(vlist), v_t)
            vlist.append(jnp.moveaxis(v_t, 1, 2))
        vi, vals_t = vseen[id(vals)]
        vids.append(vi)
        tx_t = _tile_flatten(tx, H, W)
        ty_t = _tile_flatten(ty, H, W)
        oy, ox = _origins_strip(tx_t, ty_t, txn, W, WINY_S, winx, qx, padx)
        if _ywin_on():
            yw = _ywin_origin(ty_t, oy)
            ok_t = _ok_mask(tx_t, ty_t, oy + yw, ox, _YWIN, winx)
            all_origins.append(
                jnp.stack([(ox + padx) * cp, yw], 1).reshape(-1))
        else:
            ok_t = _ok_mask(tx_t, ty_t, oy, ox, STRIPH, winx)
            all_origins.append((ox + padx) * cp)
        # coords-pushed spill neutralization (see splat_at): keeps the
        # tiled vals t-independent for cross-t CSE in chunk programs
        tile_bad = (~jnp.all(ok_t, axis=1)).astype(tx_t.dtype)[:, None]
        all_rel.append(jnp.stack(
            [tx_t - ox[:, None].astype(tx_t.dtype) - tile_bad * 1e6,
             ty_t - oy[:, None].astype(ty_t.dtype)], axis=1))
        per.append((vals_t, tx_t, ty_t, ok_t))

    n_tiles = per[0][3].shape[0]
    # vals sharing: when problems cycle through n_vals distinct vals arrays
    # (the cross-t chunk pattern vals0,vals1,vals0,vals1,…), ship only the
    # distinct ones and let the kernel's index_map route p → p % n_vals
    n_vals = len(vlist)
    shared = (n_vals < len(problems)
              and all(vi == p % n_vals for p, vi in enumerate(vids)))
    if shared:
        valsT_cat = jnp.concatenate(vlist, 0) if n_vals > 1 else vlist[0]
    else:
        valsT_cat = jnp.concatenate([vlist[vi] for vi in vids], 0)
    launch = _splat_fast_planes if planes else _splat_fast
    outs = launch(
        valsT_cat, jnp.concatenate(all_rel, 0),
        jnp.concatenate(all_origins, 0), H, W, cp, winx, K,
        n_problems=len(problems), n_vals=n_vals if shared else None)
    if len(problems) == 1 and not planes:
        outs = [outs]
    if not planes:
        outs = [o[..., :C] for o in outs]
        cp_fix = C
    else:
        cp_fix = cp
    return [_tile_splat_fix(o, vals_t[..., :cp_fix], tx_t, ty_t, ok_t,
                            n_tiles, H, W, cp_fix, planes=planes)
            for o, (vals_t, tx_t, ty_t, ok_t) in zip(outs, per)]


def softsplat_fast(img: jnp.ndarray, flow: jnp.ndarray,
                   z: jnp.ndarray | None = None) -> jnp.ndarray:
    """Softmax-splatting wrapper on the fast kernel (ops/splat.py algebra)."""
    from .splat import softsplat
    return softsplat(img, flow, z, splat_fn=splat_sum_fast)


def softsplat_fast_planes(img: jnp.ndarray, flow: jnp.ndarray,
                          z: jnp.ndarray | None = None) -> jnp.ndarray:
    """Softmax splatting with u-plane output [B, 4, H/4, W·C]: the
    [0,1]/exp(z)/normalize algebra (softSplat.py:320-352) applied per
    plane. img [B,H,W,C] (weight channel appended internally — C+1 must
    land on the kernel channel quantum, i.e. C=3); flow [B,H,W,2];
    z [B,H,W,1]."""
    B, H, W, C = img.shape
    inp01 = (img.astype(jnp.float32) + 1.0) * 0.5
    if z is None:
        m = jnp.ones((B, H, W, 1), jnp.float32)
        weighted = inp01
    else:
        m = jnp.exp(z.astype(jnp.float32))
        weighted = inp01 * m
    vals = jnp.concatenate([weighted, m], axis=-1)
    flow = flow.astype(jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)

    def one(v, fl):
        tx = xs[None, :] + fl[..., 0]
        ty = ys[:, None] + fl[..., 1]
        s = splat_at(v, tx, ty, planes_out=True)     # [4, H/4, W·(C+1)]
        s = s.reshape(4, H // 4, W, C + 1)
        norm = s[..., -1:]
        norm = jnp.where(norm == 0.0, jnp.ones_like(norm), norm)
        out = (s[..., :-1] / norm - 0.5) * 2.0
        return out.reshape(4, H // 4, W * C)

    return jnp.stack([one(vals[b], flow[b]) for b in range(B)], 0)


# ---------------------------------------------------------------------------
# differentiable wrappers (training path)
#
# The custom VJPs mirror the reference's CUDA backward kernels exactly
# (softSplat.py:54-158):
#   splat:  d/dinput = bilinear GATHER of the cotangent at the target coords
#           (updateGradInput); d/dflow = Σ_c input_c · dW/dflow · g[corner]
#           (updateGradFlow) — expressed as finite one-hot gathers: the
#           x-derivative of a bilinear sample equals the difference of two
#           y-bilinear samples at integer x taps (frac 0 makes the one-hot).
#   gather: transpose of the above — d/dimg = coordinate SPLAT of the
#           cotangent, d/dflow = image-derivative samples × cotangent,
#           scaled by the S/(S-1) coordinate composition.
# ---------------------------------------------------------------------------

def _per_image(fn, *args):
    return jnp.stack([fn(*[a[b] for a in args]) for b in range(args[0].shape[0])], 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def splat_sum_diff(inp: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    return splat_sum_fast(inp, flow)


def _splat_diff_fwd(inp, flow):
    return splat_sum_fast(inp, flow), (inp, flow)


def _splat_diff_bwd(res, g):
    inp, flow = res
    B, H, W, C = inp.shape
    g = g.astype(jnp.float32)
    inp32 = inp.astype(jnp.float32)
    fl = flow.astype(jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)

    def one(img_b, fl_b, g_b):
        tx = xs[None, :] + fl_b[..., 0]
        ty = ys[:, None] + fl_b[..., 1]
        dinp = gather_at(g_b, tx, ty)                       # updateGradInput
        x0 = jnp.floor(tx)
        y0 = jnp.floor(ty)
        gx = gather_at(g_b, x0 + 1.0, ty) - gather_at(g_b, x0, ty)
        gy = gather_at(g_b, tx, y0 + 1.0) - gather_at(g_b, tx, y0)
        dfx = jnp.sum(img_b * gx, axis=-1)                  # updateGradFlow
        dfy = jnp.sum(img_b * gy, axis=-1)
        return dinp, jnp.stack([dfx, dfy], -1)

    outs = [one(inp32[b], fl[b], g[b]) for b in range(B)]
    dinp = jnp.stack([o[0] for o in outs], 0).astype(inp.dtype)
    dflow = jnp.stack([o[1] for o in outs], 0).astype(flow.dtype)
    return dinp, dflow


splat_sum_diff.defvjp(_splat_diff_fwd, _splat_diff_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def bwarp_diff(x: jnp.ndarray, flow: jnp.ndarray,
               with_mask: bool = True) -> jnp.ndarray:
    return bwarp_fast(x, flow, with_mask)


def _bwarp_diff_fwd(x, flow, with_mask):
    return bwarp_fast(x, flow, with_mask), (x, flow)


def _bwarp_diff_bwd(with_mask, res, g):
    x, flow = res
    B, H, W, C = x.shape
    g = g.astype(jnp.float32)
    x32 = x.astype(jnp.float32)
    fl = flow.astype(jnp.float32)
    cx = W / max(W - 1, 1)        # d(sample coord)/d(flow) — the S/(S-1)
    cy = H / max(H - 1, 1)        # composition in _sample_coords

    def one(img_b, fl_b, g_b):
        sx, sy = _sample_coords(fl_b, H, W)
        if with_mask:
            g_b = g_b * ones_mask_sep(sx, sy, H, W)[..., None]
        dx = splat_at(g_b, sx, sy)                           # gather transpose
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        gx = gather_at(img_b, x0 + 1.0, sy) - gather_at(img_b, x0, sy)
        gy = gather_at(img_b, sx, y0 + 1.0) - gather_at(img_b, sx, y0)
        dfx = jnp.sum(g_b * gx, axis=-1) * cx
        dfy = jnp.sum(g_b * gy, axis=-1) * cy
        return dx, jnp.stack([dfx, dfy], -1)

    outs = [one(x32[b], fl[b], g[b]) for b in range(B)]
    dx = jnp.stack([o[0] for o in outs], 0).astype(x.dtype)
    dflow = jnp.stack([o[1] for o in outs], 0).astype(flow.dtype)
    return dx, dflow


bwarp_diff.defvjp(_bwarp_diff_fwd, _bwarp_diff_bwd)


def softsplat_diff(img: jnp.ndarray, flow: jnp.ndarray,
                   z: jnp.ndarray | None = None) -> jnp.ndarray:
    """Differentiable softmax splatting on the fast kernel: the wrapper
    algebra (shift/exp/normalise) is plain jnp; only the raw scatter uses
    the custom VJP."""
    from .splat import softsplat
    return softsplat(img, flow, z, splat_fn=splat_sum_diff)
