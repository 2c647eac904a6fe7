"""On-device PSNR/SSIM — the jax mirror of ops/metrics.py's formulas.

Why: the eval host has ONE core and host SSIM costs ~2.7 s per 4K frame
(after optimization) — ~19 s of host work per ×8 pair vs ~1.6 s of device
synthesis. The same formulas are a few milliseconds on the TPU, and
fetching two scalars replaces the 38 MB/frame D2H when PNGs aren't being
saved (FLDRX_DEVICE_METRICS=1 in the evaluator).

Formula parity: identical chain to metrics.psnr / metrics.ssim_bgr
(skimage-equivalent uniform 7x7 window, sample covariance, valid crop,
BT.601 Y of BGR, data_range = y_pred.max()−y_pred.min()), computed in f32
with f64-style exactness where it matters (the rounding to uint8 happens
before Y). Measured deviation vs the host chain: ≤1e-5 dB PSNR / ~1e-6
SSIM on 4K content (tests/test_eval_api.py pins agreement).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_TY_BGR = (0.097905882352941, 0.504129411764706, 0.256788235294118)


def _denorm255(x):
    return jnp.clip((x + 1.0) / 2.0, 0.0, 1.0) * 255.0


def _round_half_even(x):
    # np.around semantics (banker's rounding) — jnp.round matches
    return jnp.round(x)


def _uniform_filter_valid(x, w: int):
    """Mean over w×w windows, valid interior — via LOCAL window sums
    (lax.reduce_window, VALID padding): each sum accumulates only the 49
    in-window terms (≤ 2.7e6 for y², f32-exact to ~1e-7 relative). A
    global f32 integral image is NOT usable here: at 4K the cumsum
    reaches ~1.7e11 where an f32 ulp is 16384, losing ~3 digits of every
    window sum (measured 5.4e-4 of SSIM)."""
    s = jax.lax.reduce_window(x, jnp.float32(0.0), jax.lax.add,
                              (w, w), (1, 1), "VALID")
    return s / (w * w)


def _ssim_y(y1, y2, data_range, win_size: int = 7, K1=0.01, K2=0.03):
    NP = win_size ** 2
    cov_norm = NP / (NP - 1)
    uf = lambda a: _uniform_filter_valid(a, win_size)
    ux, uy = uf(y1), uf(y2)
    uxx, uyy, uxy = uf(y1 * y1), uf(y2 * y2), uf(y1 * y2)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
        (ux * ux + uy * uy + C1) * (vx + vy + C2))
    return jnp.mean(S)


def psnr_ssim_frame(pred, target, xvfi_psnr: bool = False):
    """One frame's (psnr, ssim): pred/target [H, W, 3] BGR f32 in [-1, 1]
    (the evaluator's tensors). Mirrors metrics_job's host chain:
    out_img = round(denorm255(pred)), tgt_img = denorm255(target)."""
    if target.dtype == jnp.uint8:     # FLDRX_RAW_FRAMES: replicate the
        # host normalize→denorm roundtrip so values match the f32 path
        target = (target.astype(jnp.float32) / 255.0 - 0.5) * 2.0
    out_img = _round_half_even(_denorm255(pred.astype(jnp.float32)))
    tgt_img = _denorm255(target.astype(jnp.float32))
    d = tgt_img - out_img
    mse = jnp.mean(jnp.square(d))
    if xvfi_psnr:
        p = 20.0 * jnp.log10(255.0 / jnp.sqrt(mse))
    else:
        p = 10.0 * jnp.log10(255.0 ** 2 / mse)

    # to_uint8 on [0,255]-ranged inputs: x/255*255 then round/clip —
    # same chain as metrics.to_uint8(vmin=0, vmax=255). The Y dot is
    # ELEMENTWISE fma (3 terms), never the MXU: a default-precision f32
    # dot would run as a 1-pass bf16 matmul on TPU (CLAUDE.md rule) and
    # put ~0.2% on the BT.601 coefficients of a parity path
    def y_of(img):
        x = img / jnp.float32(255.0)
        x = x * 255
        x = jnp.clip(jnp.round(x), 0, 255)
        return (x[..., 0] * jnp.float32(_TY_BGR[0])
                + x[..., 1] * jnp.float32(_TY_BGR[1])
                + x[..., 2] * jnp.float32(_TY_BGR[2]) + 16.0)

    y_t = y_of(tgt_img)
    y_p = y_of(out_img)
    dr = jnp.max(y_p) - jnp.min(y_p)
    return p, _ssim_y(y_t, y_p, dr)


def make_chunk_metrics(xvfi_psnr: bool = False):
    """Jitted (preds [T, H, W, 3], targets [T, H, W, 3]) → (psnr[T], ssim[T])."""
    def fn(preds, targets):
        ps, ss = jax.vmap(
            lambda a, b: psnr_ssim_frame(a, b, xvfi_psnr))(preds, targets)
        return ps, ss
    return jax.jit(fn)
