"""Bicubic / bilinear resize with exact PyTorch `F.interpolate` semantics.

The reference calls `F.interpolate(..., mode='bicubic'|'bilinear',
align_corners=False)` in ~10 places (pyramid build main.py:562/855, flow
upsampling fLDRnet.py:384/419-422, loss targets main.py:589-607). Getting these
bit-compatible is the highest parity risk in the rebuild (SURVEY.md §7).

TPU-first design: a separable resize is two dense matmuls
    out = W_h @ img @ W_w^T
with interpolation-weight matrices built once on the host (float64, cached).
Dense matmuls map straight onto the MXU and XLA fuses the pair; for the sizes
this model uses (≤4096) the weight matrices are tiny relative to the activations
and the matmul formulation beats gather-based resize on TPU by a wide margin.

Coordinate convention (align_corners=False, PyTorch/upsample half-pixel):
    src = (dst + 0.5) * (in_size / out_size) - 0.5
Cubic convolution kernel with A = -0.75 (PyTorch's choice), border taps clamped
to the valid range (replicate), matching `upsample_bicubic2d`.
"""

from __future__ import annotations

import contextlib
import contextvars
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resize_2d", "resize_bicubic", "resize_bilinear", "resize_matrix",
           "resize_precision"]

# Trace-time resize matmul precision scope. The eval pipeline traces its
# FAST-path programs under resize_precision("high") (half the MXU passes,
# ~1e-6 interpolation error — inside the fast path's documented envelope);
# everything else (strict parity, training) defaults to HIGHEST.
_PREC_VAR = contextvars.ContextVar("fldrx_resize_prec", default=None)


@contextlib.contextmanager
def resize_precision(p):
    """Scope the default resize matmul precision ('high'|'highest'|None)."""
    tok = _PREC_VAR.set(p)
    try:
        yield
    finally:
        _PREC_VAR.reset(tok)

def _cubic_weight(t: np.ndarray, A: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel (Keys), PyTorch uses A=-0.75."""
    t = np.abs(t)
    t2 = t * t
    t3 = t2 * t
    w = np.where(
        t <= 1.0,
        (A + 2.0) * t3 - (A + 3.0) * t2 + 1.0,
        np.where(t < 2.0, A * t3 - 5.0 * A * t2 + 8.0 * A * t - 4.0 * A, 0.0),
    )
    return w


@functools.lru_cache(maxsize=None)
def _resize_matrix_np(in_size: int, out_size: int, mode: str,
                      align_corners: bool) -> np.ndarray:
    """Dense [out_size, in_size] interpolation matrix, float64."""
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float64)
    dst = np.arange(out_size, dtype=np.float64)
    if align_corners:
        scale = (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        src = dst * scale
    else:
        scale = in_size / out_size
        src = (dst + 0.5) * scale - 0.5

    W = np.zeros((out_size, in_size), dtype=np.float64)
    if mode == "bilinear":
        # PyTorch clamps src to >= 0 before taking floor (upsample_linear1d).
        src_c = np.maximum(src, 0.0)
        i0 = np.floor(src_c).astype(np.int64)
        i0 = np.clip(i0, 0, in_size - 1)
        i1 = np.minimum(i0 + 1, in_size - 1)
        frac = src_c - i0
        rows = np.arange(out_size)
        np.add.at(W, (rows, i0), 1.0 - frac)
        np.add.at(W, (rows, i1), frac)
    elif mode == "bicubic":
        # 4 taps around floor(src); out-of-range taps are clamped (replicate),
        # matching PyTorch's upsample_bicubic2d border handling.
        i_base = np.floor(src).astype(np.int64)
        frac = src - i_base
        rows = np.arange(out_size)
        for k in range(-1, 3):
            w = _cubic_weight(k - frac)
            idx = np.clip(i_base + k, 0, in_size - 1)
            np.add.at(W, (rows, idx), w)
    elif mode == "nearest":
        # PyTorch 'nearest': src = floor(dst * in/out)
        idx = np.floor(dst * (in_size / out_size)).astype(np.int64)
        idx = np.clip(idx, 0, in_size - 1)
        W[np.arange(out_size), idx] = 1.0
    else:
        raise ValueError(f"unknown resize mode: {mode}")
    return W


def resize_matrix(in_size: int, out_size: int, mode: str = "bicubic",
                  align_corners: bool = False, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray(
        _resize_matrix_np(int(in_size), int(out_size), mode, bool(align_corners)),
        dtype=dtype,
    )


def resize_2d(x: jnp.ndarray, out_hw, mode: str = "bicubic",
              align_corners: bool = False) -> jnp.ndarray:
    """Resize an NHWC (or ...HWC) tensor to `out_hw = (H', W')`.

    Equivalent to torch.nn.functional.interpolate(x_nchw, size=out_hw,
    mode=mode, align_corners=align_corners) up to float accumulation order.

    (Two alternative forms were built and TPU-measured in round 4 and lost
    to this naive einsum pair end-to-end: a constant-tap strided-slice
    stencil for integer factors (4.548 vs 4.577 fps) and a flat-wide
    narrow-C form that avoided the narrow-minor transposes (bitwise-equal,
    but 205.0 vs 192.2 ms/pair at the flow stage and 4.696 vs 4.713 fps
    end-to-end — XLA fuses the narrow-minor transposes into the einsums
    better than the explicit wide 2D transposes). Both removed; git
    history keeps them.)
    """
    H, W = x.shape[-3], x.shape[-2]
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    if (out_h, out_w) == (H, W):
        return x
    dt = x.dtype if x.dtype in (jnp.float32, jnp.float64, jnp.bfloat16) else jnp.float32
    Wh = resize_matrix(H, out_h, mode, align_corners, dtype=dt)
    Ww = resize_matrix(W, out_w, mode, align_corners, dtype=dt)
    # precision=HIGHEST: the MXU's default bf16 matmul costs ~1e-2 error which
    # compounds across the 6-level pyramid; interpolation must stay f32-exact
    # on the strict-parity path. The FAST path traces under
    # resize_precision("high") (set per cfg.fast_warp in eval/pipeline.py):
    # 3-pass bf16 split instead of HIGHEST's 6 — r5-measured 4.708 vs 4.686
    # fps with a bit-flat goldenclip (44.1040 vs 44.1039 dB, R5B-2/5).
    # FLDRX_RESIZE_PREC remains as an explicit probe override.
    prec = {"high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST}[
        os.environ.get("FLDRX_RESIZE_PREC") or _PREC_VAR.get() or "highest"]
    y = jnp.einsum("oh,...hwc->...owc", Wh, x.astype(dt), precision=prec)
    y = jnp.einsum("pw,...owc->...opc", Ww, y, precision=prec)
    return y.astype(x.dtype) if x.dtype == jnp.float32 else y


def resize_bicubic(x, out_hw, align_corners: bool = False):
    return resize_2d(x, out_hw, "bicubic", align_corners)


def resize_bilinear(x, out_hw, align_corners: bool = False):
    return resize_2d(x, out_hw, "bilinear", align_corners)
