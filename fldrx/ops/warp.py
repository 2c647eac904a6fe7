"""Backward warping (flow-gather) with exact PyTorch `grid_sample` semantics.

Reproduces `DCTVFInet.bwarp` (reference fLDRnet.py:546-581): the flow-displaced
grid is normalised with 2*p/(S-1)-1, sampled by `grid_sample` (bilinear, zeros
padding, align_corners=False — torch's default), a ones-mask is sampled the same
way and thresholded at 0.999.

Composing the two coordinate maps: grid_sample with align_corners=False
un-normalises g to ((g+1)*S-1)/2, so the effective sample location is
    src = (pix + flow) * S/(S-1) - 0.5
NOT simply pix+flow. We implement that composition directly as a vectorised
bilinear gather — pure XLA, fully differentiable, fuses with its consumers.

Layout: NHWC images, flow [..., 2] with channel 0 = x (width), 1 = y (height).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["grid_sample_bilinear", "bwarp"]


def grid_sample_bilinear(x: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray,
                         with_ones_mask: bool = False):
    """Bilinear sample of NHWC `x` at absolute pixel coords (px, py) [B,H',W'],
    zeros padding (each out-of-range tap contributes 0).

    Returns samples [B,H',W',C]; if `with_ones_mask`, also returns the sampled
    all-ones image [B,H',W',1] (for mask thresholding).
    """
    B, H, W, C = x.shape
    cd = x.dtype
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = (px - x0).astype(cd)[..., None]
    fy = (py - y0).astype(cd)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(xi, yi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xc = jnp.clip(xi, 0, W - 1)
        yc = jnp.clip(yi, 0, H - 1)
        # gather per batch: x[b, yc[b,i,j], xc[b,i,j], :]
        b_idx = jnp.arange(B, dtype=jnp.int32)[:, None, None]
        v = x[b_idx, yc, xc]                      # [B,H',W',C]
        return v * valid[..., None].astype(cd), valid

    v00, m00 = tap(x0i, y0i)
    v01, m01 = tap(x0i + 1, y0i)
    v10, m10 = tap(x0i, y0i + 1)
    v11, m11 = tap(x0i + 1, y0i + 1)

    w00 = (1 - fx) * (1 - fy)
    w01 = fx * (1 - fy)
    w10 = (1 - fx) * fy
    w11 = fx * fy
    out = v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11
    if not with_ones_mask:
        return out
    ones = (
        m00.astype(cd)[..., None] * w00
        + m01.astype(cd)[..., None] * w01
        + m10.astype(cd)[..., None] * w10
        + m11.astype(cd)[..., None] * w11
    )
    return out, ones


def bwarp(x: jnp.ndarray, flow: jnp.ndarray, with_mask: bool = True) -> jnp.ndarray:
    """Backward-warp NHWC `x` by `flow` [B,H,W,2] (x-disp, y-disp).

    Parity target: DCTVFInet.bwarp (fLDRnet.py:546-581) — grid_sample with
    zeros padding + validity mask (mask < 0.999 → 0, else 1).
    """
    B, H, W, C = x.shape
    xs = jnp.arange(W, dtype=flow.dtype)
    ys = jnp.arange(H, dtype=flow.dtype)
    gx = xs[None, None, :] + flow[..., 0]
    gy = ys[None, :, None] + flow[..., 1]
    # reference normalises by 2/(S-1)-1 then grid_sample un-normalises with the
    # align_corners=False rule; net effect:
    sx = gx * (W / max(W - 1, 1)) - 0.5
    sy = gy * (H / max(H - 1, 1)) - 0.5
    out, ones = grid_sample_bilinear(x, sx, sy, with_ones_mask=True)
    if not with_mask:
        return out
    mask = (ones >= 0.999).astype(x.dtype)
    return out * mask
