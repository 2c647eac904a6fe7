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

# FLDRX_RESIZE_STENCIL=1: integer-factor resizes skip the dense interpolation
# matmuls and run as constant-tap strided-slice stencils (see _down_axis /
# _up_axis below). Default off until TPU-measured (probes/run_queue.sh).
_STENCIL = os.environ.get("FLDRX_RESIZE_STENCIL", "0") == "1"


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


# ---------------------------------------------------------------------------
# Constant-tap stencil path (FLDRX_RESIZE_STENCIL)
#
# Every resize this model performs is an INTEGER-factor one with
# align_corners=False (pyramid /2^i, flow upsample ×8/×2, loss targets,
# 2K eval modes). There the source position src = (p+0.5)·f − 0.5 has a
# CONSTANT fractional part (0.5 for even f, 0 for odd), so the interpolation
# weights are the same for every output pixel and the dense [out,in] matmul —
# whose W-side runs the MXU at C/128 lane utilization (C=2..3 for flow/image
# tensors) — collapses to ≤4 strided-slice multiply-adds on the VPU
# (bandwidth-bound, lanes preserved). Upsampling by integer m has m constant
# per-phase weight pairs (bilinear), built as broadcasts + a contiguous
# reshape. Numerics: identical tap weights (built in f64 like the dense
# matrix), f32 accumulation; only the ADD ORDER differs from the MXU dot
# (≤1 ulp), plus ≤1 ulp on clamped border rows where (1−frac)+frac replaces
# the dense path's pre-summed 1.0 weight. Deviation class recorded in
# PARITY.md before any default flip.
# ---------------------------------------------------------------------------

def _edge_pad(x: jnp.ndarray, axis: int, lo: int, hi: int) -> jnp.ndarray:
    """Replicate-pad along one axis (== torch's tap-index clamping for the
    ≤1-element overhangs the constant-tap stencils produce)."""
    parts = []
    if lo:
        parts.append(jnp.repeat(
            jax.lax.slice_in_dim(x, 0, 1, axis=axis), lo, axis))
    parts.append(x)
    if hi:
        parts.append(jnp.repeat(
            jax.lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis],
                                 axis=axis), hi, axis))
    return jnp.concatenate(parts, axis=axis) if len(parts) > 1 else x


def _down_taps(f: int, mode: str):
    """(offsets_from_ibase, f64 weights) for an integer-factor downsample —
    frac is 0.5 (even f) or 0 (odd f), identical for every output pixel."""
    fr = 0.5 if f % 2 == 0 else 0.0
    if mode == "bicubic":
        ks = (-1, 0, 1, 2)
        ws = [float(_cubic_weight(np.asarray(float(k) - fr))) for k in ks]
    elif mode == "bilinear":
        ks = (0, 1)
        ws = [1.0 - fr, fr]
    else:
        return None
    return [(k, w) for k, w in zip(ks, ws) if w != 0.0]


def _down_axis(x: jnp.ndarray, axis: int, f: int, mode: str) -> jnp.ndarray:
    """Integer-factor downsample along `axis` as a constant-tap stencil.
    Tap sum runs left-to-right in f32 (vs the dense path's MXU dot order:
    ≤1 ulp). Border clamping == replicate-pad because every out-of-range tap
    clamps to the first/last element."""
    taps = _down_taps(f, mode)
    n_in = x.shape[axis]
    n_out = n_in // f
    b0 = (f - 1) // 2                     # i_base = f·p + b0
    idx_min = b0 + taps[0][0]
    idx_max = f * (n_out - 1) + b0 + taps[-1][0]
    lpad = max(0, -idx_min)
    rpad = max(0, idx_max - (n_in - 1))
    if lpad or rpad:
        x = _edge_pad(x, axis, lpad, rpad)
    acc = None
    for k, w in taps:
        start = lpad + b0 + k
        sl = jax.lax.slice_in_dim(x, start, start + f * (n_out - 1) + 1,
                                  stride=f, axis=axis)
        term = np.float32(w) * sl.astype(jnp.float32)
        acc = term if acc is None else acc + term
    return acc


def _up_axis(x: jnp.ndarray, axis: int, m: int) -> jnp.ndarray:
    """Integer-factor BILINEAR upsample along `axis`: m constant per-phase
    weight pairs over (prev, self) / (self, next) neighbours, then a
    contiguous phase-merge reshape. Border: replicate-pad makes both taps the
    same element, so (1−frac)·v + frac·v replaces torch's clamped exact v
    (≤1 ulp on the first/last row or column only)."""
    n = x.shape[axis]
    axis = axis % x.ndim
    xp = _edge_pad(x, axis, 1, 1)
    prv = jax.lax.slice_in_dim(xp, 0, n, axis=axis)
    cur = x
    nxt = jax.lax.slice_in_dim(xp, 2, n + 2, axis=axis)
    d = (np.arange(m, dtype=np.float64) + 0.5 - m / 2) / m
    phases = []
    for phi in range(m):
        if d[phi] < 0:
            lo, hi, frac = prv, cur, 1.0 + d[phi]
        else:
            lo, hi, frac = cur, nxt, d[phi]
        phases.append(np.float32(1.0 - frac) * lo.astype(jnp.float32)
                      + np.float32(frac) * hi.astype(jnp.float32))
    y = jnp.stack(phases, axis=axis + 1)        # [.., n, m, ..]
    return y.reshape(y.shape[:axis] + (n * m,) + y.shape[axis + 2:])


def _stencil_axis(x: jnp.ndarray, axis: int, n_in: int, n_out: int,
                  mode: str):
    """One axis of the stencil resize; None if this axis needs the dense
    path (non-integer ratio, or a mode/direction without constant taps)."""
    if n_out == n_in:
        return x.astype(jnp.float32)
    if n_out < n_in and n_in % n_out == 0 and mode in ("bicubic", "bilinear"):
        return _down_axis(x, axis, n_in // n_out, mode)
    if n_out > n_in and n_out % n_in == 0 and mode == "bilinear":
        return _up_axis(x, axis, n_out // n_in)
    return None


def _resize_2d_stencil(x: jnp.ndarray, out_h: int, out_w: int, mode: str):
    """Stencil resize of ...HWC; None when not applicable."""
    H, W = x.shape[-3], x.shape[-2]
    yh = _stencil_axis(x, x.ndim - 3, H, out_h, mode)
    if yh is None:
        return None
    y = _stencil_axis(yh, x.ndim - 2, W, out_w, mode)
    return y


def resize_2d(x: jnp.ndarray, out_hw, mode: str = "bicubic",
              align_corners: bool = False,
              stencil: bool | None = None) -> jnp.ndarray:
    """Resize an NHWC (or ...HWC) tensor to `out_hw = (H', W')`.

    Equivalent to torch.nn.functional.interpolate(x_nchw, size=out_hw,
    mode=mode, align_corners=align_corners) up to float accumulation order.

    stencil: force the constant-tap stencil path on/off (None → the
    FLDRX_RESIZE_STENCIL env default). Applies only to integer-factor
    align_corners=False resizes; everything else uses the dense matmuls.
    """
    H, W = x.shape[-3], x.shape[-2]
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    if (out_h, out_w) == (H, W):
        return x
    if ((stencil if stencil is not None else _STENCIL)
            and not align_corners
            and x.dtype in (jnp.float32, jnp.bfloat16)):
        y = _resize_2d_stencil(x, out_h, out_w, mode)
        if y is not None:
            return y.astype(x.dtype)
    dt = x.dtype if x.dtype in (jnp.float32, jnp.float64, jnp.bfloat16) else jnp.float32
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
