"""Analytic roofline for the ×8 4K interpolation pipeline (PROFILE.md §roofline).

Computes, from the SAME geometry constants the kernels compile with
(fldrx.ops.fastwarp TILE/GTILE/WINY_*/STRIPH/winx), the per-stage

  * MXU pass count (128×128×128 bf16 MACs each — the unit the measured
    0.9 µs/41-pass gather floor calibrates),
  * VPU element-ops (wide hat/mask/fold pipelines),
  * HBM bytes moved (windows, coords, outputs — the DMA floor),

and the implied per-stage ms floor on a chip spec, against the measured
round-3/4 numbers. Pure arithmetic — runs anywhere, no device needed:

    python -m fldrx.tools.roofline

The point of this accounting (VERDICT r3 "write the roofline"): decide
where the remaining gap to the 30 fps/chip target can and cannot come
from. See PROFILE.md "Roofline" for the conclusions table this prints.

Chip specs: published peak numbers; the *effective* MXU rate is
calibrated from the measured per-tile floor (41 passes ≈ 0.9 µs on v5e →
~46 passes/µs, i.e. ~0.77 of the 197 TFLOP/s paper peak — sequencing can
not quite saturate every pipe from one kernel loop).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

# geometry constants — import the real ones so the analysis can't drift
from ..ops.fastwarp import (CHUNK, GTILE, OYR_S, STRIPH, TILE, WINY_G,
                            _win_geom)


@dataclass(frozen=True)
class Chip:
    name: str
    mxu_tflops: float          # bf16 peak, published
    hbm_gbs: float             # GB/s, published
    vpu_tops: float            # f32 element-ops/s (8×128 lanes × ~4 ALUs)
    mxu_eff: float = 0.77      # measured fraction of peak one Mosaic
                               # kernel loop sustains (v5e calibration)


V5E = Chip("v5e", 197.0, 819.0, 3.9)
V5P = Chip("v5p", 459.0, 2765.0, 7.9)

# 4K padded eval geometry (bench.py / X-Test protocol)
H, W = 2304, 4096
NPX = H * W


def mxu_passes(m, k, n):
    """128×128×128-granule passes for an [m,k]@[k,n] bf16 matmul."""
    c = lambda a: -(-a // 128)
    return c(m) * c(k) * c(n)


def stage_ms(chip, passes=0, vpu_ops=0, hbm_bytes=0):
    """Max of the three floors (they overlap imperfectly; max is the
    optimistic bound, sum the pessimistic — we report max)."""
    t_mxu = passes * (128 * 128 * 128 * 2) / (chip.mxu_tflops * 1e12
                                              * chip.mxu_eff)
    t_vpu = vpu_ops / (chip.vpu_tops * 1e12)
    t_hbm = hbm_bytes / (chip.hbm_gbs * 1e9)
    return max(t_mxu, t_vpu, t_hbm) * 1e3, t_mxu * 1e3, t_vpu * 1e3, \
        t_hbm * 1e3


def splat_stage(chip):
    """Per-t: 2 softmax splats (3ch+z = 4ch vals) in one strip launch."""
    cp, winx, _ = _win_geom(4, wide=False)
    n_tiles = (H // TILE) * (W // TILE)
    N = TILE * TILE
    wC = winx * cp
    # factored-placement form (r5 default): [_YWIN, N] window contribution
    # + 2-split one-hot placement (the [STRIPH, N] strip-wide form was
    # mxu_passes(STRIPH, N, wC) = 64/tile)
    from ..ops.fastwarp import _YWIN
    per_tile_passes = (
        mxu_passes(_YWIN, N, wC)         # contrib128 = RYT[128,N] @ CXeV
        + 2 * mxu_passes(STRIPH, _YWIN, wC)  # P @ {chi, clo} placement
        + mxu_passes(N, cp, 128)         # v128 one-hot transpose
        + mxu_passes(1, 3, N) * 0        # row_to_col rides the above
    )
    # VPU: RYT hat [_YWIN,N]·~4 ops, CXe hat [N,wC]·~4, CXe·Ve mult [N,wC]
    per_tile_vpu = _YWIN * N * 4 + N * wC * 4 + N * wC
    # HBM: vals bf16 [N, cp] + coords f32 [2, N] in; strip flush amortizes
    # to one f32 [TILE, (W+2winx)·cp]/tx per tile-row → per tile ≈ TILE²·cp
    per_tile_hbm = N * cp * 2 + 2 * N * 4 + N * cp * 4
    P = 2 * n_tiles                      # 2 problems per t
    return (P * per_tile_passes, P * per_tile_vpu, P * per_tile_hbm)


def gather_stage(chip, n_problems):
    """n_problems full-res 4ch gathers (im_tot: 2/t; z-metric: 2/pair)."""
    cp, winx, _ = _win_geom(4, wide=True)
    n_tiles = (H // GTILE) * (W // GTILE)
    N = GTILE * GTILE
    wC = winx * cp
    per_tile_passes = (
        mxu_passes(N, WINY_G, wC)        # t1 = RYT^T @ window
        + mxu_passes(cp, 128, N)         # channel condense
        + mxu_passes(1, 3, N)            # row→col
    )
    per_tile_vpu = WINY_G * N * 4 + N * wC * 5   # y hat + x hat/mult/fold
    per_tile_hbm = (WINY_G * wC * 2      # window DMA (bf16)
                    + 2 * N * 4          # coords
                    + N * cp * 4)        # output
    P = n_problems * n_tiles
    return (P * per_tile_passes, P * per_tile_vpu, P * per_tile_hbm)


def unet_stage(chip):
    """Refine UNet on the s2d4 grid (Hp4=576, Wp4=1024), bf16 convs.
    Layer list mirrors refine_unet_s2d_core's packed shapes."""
    Hp, Wp = H // 4, W // 4
    layers = [
        (Hp, Wp, 416, 64),               # enc1 (s2d repack, stride2→packed)
        (Hp // 2, Wp // 2, 256, 128),    # enc2 packed
        (Hp // 4, Wp // 4, 128, 128),    # enc3+dec0 region (approx pair)
        (Hp // 2, Wp // 2, 256, 64),     # dec1 region
        (Hp, Wp, 128, 96),               # dec2 region
        (Hp, Wp, 256, 96),               # dec3 head (packed out)
    ]
    passes = vpu = hbm = 0
    for (h, w, ci, co) in layers:
        passes += mxu_passes(h * w, ci * 9, co)
        hbm += h * w * (ci + co) * 2
        vpu += h * w * co * 2            # bias+relu
    return passes, vpu, hbm


def flow_stage(chip):
    """Per pair: pyramid resizes (f32 HIGHEST ≈ 6 bf16 passes per MAC
    granule), 6 coarse flow levels (tiny), 2 full-res z gathers + the
    full-res feature/infra warps measured inside 'flow' in PROFILE."""
    # pyramid: levels /2.. on 2 frames, bicubic separable matmuls, HIGHEST
    passes = 0
    hbm = 0
    h, w = H, W
    for _ in range(5):
        oh, ow = h // 2, w // 2
        # oh×(w·3) out, K=h  +  (oh·3)×ow out, K=w — f32 HIGHEST ≈ 6×
        passes += 6 * (mxu_passes(oh, h, w * 3) + mxu_passes(oh * 3, w, ow))
        hbm += (h * w + oh * w + oh * ow) * 3 * 4
        h, w = oh, ow
    gz = gather_stage(None, 2)           # z-metric warps at full res
    # coarse flow levels: ≤288×512 grids, 96-448ch convs — small; lump 15%
    return (int((passes + gz[0]) * 1.15),
            int(gz[1] * 1.15), int((hbm + gz[2]) * 1.15))


def blend_stage(chip):
    """Per-t: UNet logits softmax (24-minor) + 6-candidate weighted sum
    over u-planes — VPU/HBM bound, zero MXU."""
    Hp, Wp = H // 4, W // 4
    cells = Hp * Wp
    vpu = cells * 24 * 8 + cells * 4 * 6 * 3 * 2
    hbm = (cells * 96 * 4                # logits
           + 6 * NPX * 3 * 4             # candidates read
           + NPX * 3 * 4)                # out write
    return (cells // 128 * 0, vpu, hbm)


MEASURED_V5E_MS = {                      # r3/r4 perfprobe2 numbers
    "splats/t": 95.0,
    "im_tot gathers/t": 97.0,
    "flowback+upsample/t": 5.0,
    "UNet/t": 33.0,
    "blend/t": 14.0,
    "flow/pair": 160.0,
}


def report(chip):
    rows = {}
    rows["splats/t"] = splat_stage(chip)
    rows["im_tot gathers/t"] = gather_stage(chip, 2)
    rows["flowback+upsample/t"] = (0, NPX * 2 * 6, NPX * (2 * 4 + 2 * 4))
    rows["UNet/t"] = unet_stage(chip)
    rows["blend/t"] = blend_stage(chip)
    rows["flow/pair"] = flow_stage(chip)
    out = {}
    per_t_floor = 0.0
    for name, (p, v, b) in rows.items():
        ms, tm, tv, th = stage_ms(chip, p, v, b)
        out[name] = dict(floor_ms=round(ms, 2), mxu_ms=round(tm, 2),
                         vpu_ms=round(tv, 2), hbm_ms=round(th, 2),
                         measured_v5e_ms=MEASURED_V5E_MS.get(name))
        per_t_floor += ms / (7.0 if name.endswith("/pair") else 1.0)
    fps = 1e3 / per_t_floor
    out["_summary"] = dict(per_frame_floor_ms=round(per_t_floor, 1),
                           fps_floor=round(fps, 2), chip=chip.name)
    return out


def main():
    for chip in (V5E, V5P):
        r = report(chip)
        print(f"== {chip.name} ==")
        for k, v in r.items():
            print(" ", k, json.dumps(v))


if __name__ == "__main__":
    main()
