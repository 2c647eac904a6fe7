"""PSNR / SSIM metrics, parity with the reference's evaluation.

The reference uses skimage.metrics.peak_signal_noise_ratio (data_range=255,
utils.py:644-659) and structural_similarity on the Y channel of a BGR→YCbCr
transform (utils.py:662-710). skimage is not in this image, so both are
implemented here in NumPy matching skimage's defaults exactly
(win_size=7 uniform filter, K1=0.01, K2=0.03, gaussian_weights=False).
"""

from __future__ import annotations

import numpy as np

__all__ = ["psnr", "psnr_xvfi", "ssim_bgr", "rgb2ycbcr", "to_uint8", "denorm255"]


# NOTE on the in-place style below: these run per interpolated 4K frame on
# the 1-core eval host, where chains of fresh ~100-600 MB temporaries
# measured 10-60x slower than the same ops applied in place (allocator /
# first-touch pathology; frames_to_tensor: 15.4 s -> 0.18 s). Each function
# keeps the reference's op ORDER, so values stay bitwise identical.


def denorm255(x: np.ndarray) -> np.ndarray:
    """[-1,1] → [0,255] with clipping (utils.py:685-688)."""
    y = x + 1.0
    y /= 2.0
    np.clip(y, 0.0, 1.0, out=y)
    y *= 255.0
    return y


def to_uint8(x: np.ndarray, vmin: float, vmax: float) -> np.ndarray:
    x = x.astype(np.float32)
    x -= vmin
    x /= np.float32(vmax - vmin)
    x *= 255
    np.round(x, out=x)
    np.clip(x, 0, 255, out=x)
    return x


def _mse(img_true: np.ndarray, img_pred: np.ndarray) -> float:
    """Mean squared error with an f64 ACCUMULATOR but f32 elementwise work
    when the inputs aren't f64 (halves the 640 MB-per-operand traffic —
    1371 → ~450 ms per 4K frame measured). For integer-valued inputs
    (uint8 / rounded f32 ≤ 255) the f32 diff and square are exact, so the
    value is bitwise the f64 chain's; for general f32 inputs only the
    subtract rounds (~1e-7 relative ≈ 1e-6 dB of PSNR)."""
    a = np.asarray(img_true)
    b = np.asarray(img_pred)
    if a.dtype == np.float64 or b.dtype == np.float64:
        d = np.asarray(a, np.float64) - np.asarray(b, np.float64)
        np.square(d, out=d)
        return float(np.mean(d))
    d = np.subtract(a, b, dtype=np.float32)     # one temporary (astype
    np.square(d, out=d)                          # would copy BOTH operands)
    return float(np.mean(d, dtype=np.float64))


def psnr(img_true: np.ndarray, img_pred: np.ndarray, data_range: float = 255.0) -> float:
    """skimage.peak_signal_noise_ratio equivalent (utils.py:651-652)."""
    mse = _mse(img_true, img_pred)
    if mse == 0:
        return float("inf")
    return float(10 * np.log10((data_range ** 2) / mse))


def psnr_xvfi(img_true: np.ndarray, img_pred: np.ndarray) -> float:
    """--XVFIPSNR RMSE formula (utils.py:654-659)."""
    rmse = np.sqrt(_mse(img_true, img_pred))
    if rmse == 0:
        return float("inf")
    return float(20 * np.log10(255.0 / rmse))


def rgb2ycbcr(img: np.ndarray, max_val: float = 255.0) -> np.ndarray:
    """BT.601 RGB→YCbCr, constants from utils.py:691-710."""
    O = np.array([16.0, 128.0, 128.0])
    T = np.array([
        [0.256788235294118, 0.504129411764706, 0.097905882352941],
        [-0.148223529411765, -0.290992156862745, 0.439215686274510],
        [0.439215686274510, -0.367788235294118, -0.071427450980392],
    ])
    if max_val == 1:
        O = O / 255.0
    return img @ T.T + O


try:
    from scipy.ndimage import uniform_filter as _scipy_uniform_filter
except ImportError:                              # pragma: no cover
    _scipy_uniform_filter = None


def _uniform_filter_valid(x: np.ndarray, w: int) -> np.ndarray:
    """Mean filter with `valid`-style interior matching scipy's reflect-free
    crop used by skimage SSIM (it filters with uniform_filter then crops
    pad=(w-1)//2 on each side, so only interior values matter).

    scipy's C moving-sum filter is ~3.5x faster than the f64 cumsum
    integral image at 4K (285 vs 1007 ms/filter measured on the 1-core
    eval host, agreeing to 2e-8 on the 255 scale) — SSIM is the
    evaluator's dominant host cost (5 filters per frame)."""
    if _scipy_uniform_filter is not None:
        p = w // 2
        f = _scipy_uniform_filter(x, size=w, mode="constant")
        return f[p:x.shape[0] - p, p:x.shape[1] - p]
    c = np.cumsum(np.cumsum(np.pad(x, ((1, 0), (1, 0)), mode="constant"),
                            axis=0), axis=1)
    s = c[w:, w:] - c[:-w, w:] - c[w:, :-w] + c[:-w, :-w]
    return s / (w * w)


def ssim_gray(im1: np.ndarray, im2: np.ndarray, data_range: float,
              win_size: int = 7, K1: float = 0.01, K2: float = 0.03,
              dtype=np.float64) -> float:
    """structural_similarity equivalent for 2-D float images with
    skimage defaults (uniform window, crop=True).

    dtype=np.float32 (ssim_bgr's default; FLDRX_SSIM_F64=1 restores f64)
    is 2.35x faster at 4K; measured deviation ~8.5e-7 in the SSIM value
    (reported at 4 dp) — scipy's filter accumulates in double either way."""
    im1 = np.asarray(im1, dtype)
    im2 = np.asarray(im2, dtype)
    NP = win_size ** 2
    cov_norm = NP / (NP - 1)  # sample covariance (skimage use_sample_covariance)
    ux = _uniform_filter_valid(im1, win_size)
    uy = _uniform_filter_valid(im2, win_size)
    # one shared product buffer + in-place arithmetic below (see the module
    # note): ops keep the original order, and the reassociated 2x factors
    # are exact in fp — values bitwise identical to the expression form
    buf = im1 * im1
    uxx = _uniform_filter_valid(buf, win_size)
    np.multiply(im2, im2, out=buf)
    uyy = _uniform_filter_valid(buf, win_size)
    np.multiply(im1, im2, out=buf)
    uxy = _uniform_filter_valid(buf, win_size)
    uxux = ux * ux
    uyuy = uy * uy
    uxuy = ux * uy
    vx = uxx
    vx -= uxux
    vx *= cov_norm
    vy = uyy
    vy -= uyuy
    vy *= cov_norm
    vxy = uxy
    vxy -= uxuy
    vxy *= cov_norm
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    A1 = uxuy                 # 2·ux·uy + C1 (×2 is exact)
    A1 *= 2
    A1 += C1
    A2 = vxy                  # 2·vxy + C2
    A2 *= 2
    A2 += C2
    B1 = uxux
    B1 += uyuy
    B1 += C1
    B2 = vx
    B2 += vy
    B2 += C2
    S = A1
    S *= A2
    B1 *= B2
    S /= B1
    return float(S.mean())


def ssim_bgr(img_true: np.ndarray, img_pred: np.ndarray) -> float:
    """SSIM on the Y channel of BGR images in [0,255] (utils.py:662-669).

    The reference's images flow through cv2 (BGR); it flips to RGB via
    [:, :, ::-1] before _rgb2ycbcr. Inputs here are HWC BGR float arrays.
    """
    # only the Y channel is used: a single 3-coefficient dot instead of the
    # full 3x3 YCbCr matmul; the BGR flip rides the coefficient order
    # (contiguous GEMV instead of a negative-stride view — the 3-term sum
    # reassociates by ~1 ulp). f32 is the default end to end: measured
    # SSIM deviation vs the f64 chain is 2.4e-10 on quantized inputs
    # (scipy's filter accumulates in double), ~2.5x faster per 4K frame on
    # the 1-core eval host; FLDRX_SSIM_F64=1 restores the f64 chain.
    import os
    f64 = bool(int(os.environ.get("FLDRX_SSIM_F64", "0")))
    dt = np.float64 if f64 else np.float32
    ty_bgr = np.array([0.097905882352941, 0.504129411764706,
                       0.256788235294118], dt)

    def y_of(img):
        y = to_uint8(img, 0, 255) @ ty_bgr
        y += dt(16.0)
        return y

    y_true = y_of(img_true)
    y_pred = y_of(img_pred)
    dr = float(y_pred.max()) - float(y_pred.min())
    return ssim_gray(y_true, y_pred, data_range=dr, dtype=dt)
