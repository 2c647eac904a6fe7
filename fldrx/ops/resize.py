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

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resize_2d", "resize_bicubic", "resize_bilinear", "resize_matrix"]

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


def _resize_2d_wide(x: jnp.ndarray, out_h: int, out_w: int, mode: str,
                    align_corners: bool, dt) -> jnp.ndarray:
    """Flat-wide form of the separable resize, for narrow-C tensors.

    The naive einsum pair leaves C (=2 or 3 here) as the minormost dim of
    every operand and result; on TPU that costs lane padding plus a
    narrow-minor transpose of the full tensor around the W contraction
    (measured 10-35 ms per 4K tensor — PROFILE.md). This form keeps every
    materialized tensor flat-wide:
        [.., H, W·C] --Wh--> [.., oh, W·C]    (wide K=H contraction)
        transpose/reshape -> [.., W, C·oh]    (wide 2D transpose, HBM-bound)
        --Ww-->              [.., ow, C·oh]   (wide K=W contraction)
        transpose/reshape -> [.., oh, ow, C]
    Same interpolation matrices, same contraction order over the same K
    terms, same HIGHEST precision — bitwise-equal to the naive form
    (tests/test_resize.py pins it)."""
    lead = x.shape[:-3]
    H, W, C = x.shape[-3], x.shape[-2], x.shape[-1]
    B = 1
    for d in lead:
        B *= d
    hp = jax.lax.Precision.HIGHEST
    Wh = resize_matrix(H, out_h, mode, align_corners, dtype=dt)
    Ww = resize_matrix(W, out_w, mode, align_corners, dtype=dt)
    xf = x.astype(dt).reshape(B, H, W * C)
    t1 = jnp.einsum("oh,bhk->bok", Wh, xf, precision=hp)     # [B, oh, W·C]
    t1 = jnp.swapaxes(t1, 1, 2).reshape(B, W, C * out_h)     # [B, W, C·oh]
    t2 = jnp.einsum("pw,bwm->bpm", Ww, t1, precision=hp)     # [B, ow, C·oh]
    t2 = jnp.swapaxes(t2.reshape(B, out_w * C, out_h), 1, 2)  # [B, oh, ow·C]
    return t2.reshape(*lead, out_h, out_w, C)


def resize_2d(x: jnp.ndarray, out_hw, mode: str = "bicubic",
              align_corners: bool = False) -> jnp.ndarray:
    """Resize an NHWC (or ...HWC) tensor to `out_hw = (H', W')`.

    Equivalent to torch.nn.functional.interpolate(x_nchw, size=out_hw,
    mode=mode, align_corners=align_corners) up to float accumulation order.

    (A constant-tap strided-slice stencil variant for integer factors was
    built and TPU-measured in round 4: 4.548 vs 4.577 fps end-to-end — the
    dense-matmul form wins, so the stencil path was removed.)
    """
    H, W = x.shape[-3], x.shape[-2]
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    if (out_h, out_w) == (H, W):
        return x
    dt = x.dtype if x.dtype in (jnp.float32, jnp.float64, jnp.bfloat16) else jnp.float32
    C = x.shape[-1]
    # narrow-C tensors (frames C=3, flow C=2) route through the flat-wide
    # form above whenever the work is big enough to care; wide-C tensors
    # (features) keep the naive einsums, whose operands are already wide.
    if (C <= 4 and H * W >= 128 * 128
            and bool(int(os.environ.get("FLDRX_WIDE_RESIZE", "1")))):
        y = _resize_2d_wide(x, out_h, out_w, mode, align_corners, dt)
        return y.astype(x.dtype) if x.dtype == jnp.float32 else y
    Wh = resize_matrix(H, out_h, mode, align_corners, dtype=dt)
    Ww = resize_matrix(W, out_w, mode, align_corners, dtype=dt)
    # precision=HIGHEST: the MXU's default bf16 matmul costs ~1e-2 error which
    # compounds across the 6-level pyramid; interpolation must stay f32-exact.
    y = jnp.einsum("oh,...hwc->...owc", Wh, x.astype(dt),
                   precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("pw,...owc->...opc", Ww, y,
                   precision=jax.lax.Precision.HIGHEST)
    return y.astype(x.dtype) if x.dtype == jnp.float32 else y


def resize_bicubic(x, out_hw, align_corners: bool = False):
    return resize_2d(x, out_hw, "bicubic", align_corners)


def resize_bilinear(x, out_hw, align_corners: bool = False):
    return resize_2d(x, out_hw, "bilinear", align_corners)
