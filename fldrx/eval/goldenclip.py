"""Golden-clip quality fixture: a deterministic, procedurally generated
scene with TRUE ground truth at any t — the benchmark-protocol proxy for
the real X-Test/Inter4K footage that is absent from this environment
(reference protocol: /root/reference/main.py:842-911).

Scene model: a band-limited textured background panning at one velocity
plus soft-edged textured discs moving at other velocities — so the clip
has occlusion AND disocclusion boundaries with large motion (up to ~60 px
at 4K scale), exactly the content the warp engine's spill tiers and the
low-res flowback approximation are most exposed to. Every frame is
rendered analytically from the scene model at time t (NOT warped from
another frame), so GT is exact and the pinned PSNRs regression-test the
full pipeline end to end: any kernel/precision change that moves quality
shows up as a PSNR shift.

All geometry scales with (H, W) so the CPU test (512x768, S_tst=3) and the
TPU report (4K, test5scales) render the same scene.
"""

from __future__ import annotations

import numpy as np


def _texture(xx, yy, phases, scale=1.0):
    """Band-limited texture in [-1,1] from fixed sinusoid banks."""
    t = np.zeros_like(xx)
    for (fx, fy, px, py, a) in phases:
        t = t + a * np.sin(xx * fx * scale + px) * np.cos(yy * fy * scale + py)
    m = np.max(np.abs(t)) + 1e-6
    return 0.85 * t / m


_BG_PHASES = [
    (0.055, 0.042, 0.3, 1.1, 1.0), (0.21, 0.17, 2.0, 0.4, 0.5),
    (0.013, 0.019, 0.9, 2.2, 0.8), (0.35, 0.29, 1.4, 2.8, 0.25),
]
_FG_PHASES = [
    [(0.09, 0.07, 0.1, 0.5, 1.0), (0.28, 0.33, 1.2, 0.2, 0.45)],
    [(0.06, 0.11, 2.1, 1.3, 1.0), (0.41, 0.23, 0.6, 1.9, 0.35)],
    [(0.15, 0.05, 0.8, 2.6, 1.0), (0.24, 0.38, 2.4, 0.9, 0.4)],
]

# (center_x, center_y, radius, vel_x, vel_y) — fractions of (W, H) for
# positions/radius, fractions of W per unit time for velocity
_DISCS = [
    (0.30, 0.40, 0.110, +0.0150, +0.0045),
    (0.62, 0.62, 0.080, -0.0110, +0.0060),
    (0.78, 0.25, 0.060, +0.0065, -0.0110),
]
_BG_VEL = (-0.0058, +0.0023)      # background pan (fraction of W per unit t)


def render_golden(H: int, W: int, t: float) -> np.ndarray:
    """Render the golden scene at time t ∈ [0, 1] → [H, W, 3] f32 in [-1,1]."""
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    sc = 768.0 / W                     # geometry-invariant texture frequency
    out = None

    bx, by = _BG_VEL[0] * W * t, _BG_VEL[1] * W * t
    chans = []
    for c in range(3):
        ph = [(fx, fy, px + 0.7 * c, py + 1.3 * c, a)
              for fx, fy, px, py, a in _BG_PHASES]
        chans.append(_texture((xx - bx) * sc, (yy - by) * sc, ph))
    out = np.stack(chans, -1)

    edge = max(1.5, W / 512.0)         # soft disc edge (anti-aliased)
    for i, (cx, cy, r, vx, vy) in enumerate(_DISCS):
        px = (cx + vx * t) * W
        py = (cy + vy * t * (W / H)) * H
        rad = r * W
        d = np.sqrt((xx - px) ** 2 + (yy - py) ** 2)
        alpha = np.clip((rad - d) / edge, 0.0, 1.0)[..., None]
        chans = []
        for c in range(3):
            ph = [(fx, fy, px0 + 0.9 * c, py0 + 0.5 * c, a)
                  for fx, fy, px0, py0, a in _FG_PHASES[i]]
            chans.append(_texture((xx - px) * sc, (yy - py) * sc, ph))
        fg = np.stack(chans, -1)
        out = out * (1 - alpha) + fg * alpha
    return out.astype(np.float32)


def golden_pair(H: int, W: int, multiple: int = 8):
    """Returns (frames [1,2,H,W,3], t_values [multiple-1], gts [T,H,W,3])."""
    f0 = render_golden(H, W, 0.0)
    f1 = render_golden(H, W, 1.0)
    ts = np.linspace(1 / multiple, 1 - 1 / multiple, multiple - 1)
    gts = np.stack([render_golden(H, W, float(t)) for t in ts], 0)
    return np.stack([f0, f1], 0)[None], ts, gts


def golden_psnrs(interp, H: int, W: int, multiple: int = 8):
    """Run the ×N protocol on the golden pair and return per-t PSNRs (dB,
    data_range=255 like the benchmark protocol) plus their mean."""
    from ..ops import metrics

    frames, ts, gts = golden_pair(H, W, multiple)
    preds = interp.interpolate_multi_np(frames, list(ts))[:, 0]
    ps = []
    for pred, gt in zip(preds, gts):
        ps.append(metrics.psnr(metrics.denorm255(gt),
                               np.around(metrics.denorm255(pred))))
    return np.asarray(ps), float(np.mean(ps))
