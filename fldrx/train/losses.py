"""Training losses — parity with the reference loss assembly (main.py:578-651).

Shipped papermodel recipe:
  total = mean_l L1(out_l, bicubic↓ frameT)            (rec, main.py:585-594,638)
        + 0.5  * edge-aware forward smoothness          (ownsmooth, utils.py:866-900)
        + 0.05 * endflow forward-warp photometric       (forwendflowloss, utils.py:848-864)
T-optimization swaps the rec loss for MSE (main.py:588-590).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from ..config import FLDRConfig
from ..ops.resize import resize_2d
from ..ops.splat import softsplat


def charbonnier(x, y, eps=1e-3):
    return jnp.mean(jnp.sqrt((x - y) ** 2 + eps ** 2))


def rec_loss_fn(cfg: FLDRConfig):
    if cfg.t_optimization:
        return lambda x, y: jnp.mean((x - y) ** 2)
    if cfg.loss_type == "MSE":
        return lambda x, y: jnp.mean((x - y) ** 2)
    if cfg.loss_type == "L1_Charbonnier_loss":
        return charbonnier
    return lambda x, y: jnp.mean(jnp.abs(x - y))


def pyramid_rec_loss(cfg: FLDRConfig, out_pyramid: Sequence[jnp.ndarray],
                     target: jnp.ndarray) -> jnp.ndarray:
    """Σ_l rec(out_l, bicubic↓target) / n_levels (main.py:585-594, 638).
    target: [B, H, W, 3] at full (level-0) resolution."""
    f = rec_loss_fn(cfg)
    total = 0.0
    for l, out_l in enumerate(out_pyramid):
        tgt = target if l == 0 else resize_2d(
            target, out_l.shape[1:3], "bicubic", cfg.align_corners)
        total = total + cfg.rec_lambda * f(out_l, tgt)
    return total / len(out_pyramid)


def smoothness_forward_loss(flow: jnp.ndarray, img0: jnp.ndarray,
                            img1: jnp.ndarray, weight: float = 150.0) -> jnp.ndarray:
    """set_smoothness_loss_forward (utils.py:866-900), fixsmoothtwistup branch:
    flow[...,0:2] ≙ flow_01 weighted by img0 edges, flow[...,2:4] ≙ flow_10 by
    img1 edges. flow: [B,h,w,4] (the t-scaled refine flow at 1/8 res);
    img0/img1: [B,h,w,3] (inputs bicubic-downscaled by 1/8, main.py:597-603)."""
    w2 = weight ** 2
    flow_01 = flow[..., 0:2]
    flow_10 = flow[..., 2:4]

    def gh(x):
        return x[:, 1:, :, :] - x[:, :-1, :, :]

    def gw(x):
        return x[:, :, 1:, :] - x[:, :, :-1, :]

    w0_gh = jnp.exp(-w2 * jnp.mean(gh(img0) ** 2, -1, keepdims=True))
    w0_gw = jnp.exp(-w2 * jnp.mean(gw(img0) ** 2, -1, keepdims=True))
    w1_gh = jnp.exp(-w2 * jnp.mean(gh(img1) ** 2, -1, keepdims=True))
    w1_gw = jnp.exp(-w2 * jnp.mean(gw(img1) ** 2, -1, keepdims=True))

    return 0.25 * (
        jnp.mean(w0_gh * jnp.abs(gh(flow_01)))
        + jnp.mean(w1_gh * jnp.abs(gh(flow_10)))
        + jnp.mean(w0_gw * jnp.abs(gw(flow_01)))
        + jnp.mean(w1_gw * jnp.abs(gw(flow_10)))
    )


def endflow_forward_warp_loss(endflow, im0, im1, t) -> jnp.ndarray:
    """set_warping_loss_endflow_forward (utils.py:848-864): splat each input by
    the un-t-scaled endpoint flow and compare to the OTHER input, L1.
    endflow = (flow_t0, flow_t1) at image res; im0/im1 [B,H,W,3]; t [B,1]."""
    flow_0t, flow_1t = endflow
    B = im0.shape[0]
    tb = t.reshape(B, 1, 1, 1)
    warped_fir = softsplat(im0, (1.0 / tb) * flow_0t)
    warped_sec = softsplat(im1, (1.0 / (1.0 - tb)) * flow_1t)
    return jnp.mean(jnp.abs(warped_fir - im1)) + jnp.mean(jnp.abs(warped_sec - im0))


def total_loss(cfg: FLDRConfig, fwd_out: dict, target: jnp.ndarray,
               frames: jnp.ndarray, t: jnp.ndarray):
    """Assemble the shipped training loss. frames: [B,2,H,W,3] level-0 inputs."""
    rec = pyramid_rec_loss(cfg, fwd_out["out_pyramid"], target)
    s = cfg.scales[0]
    h, w = frames.shape[2] // s, frames.shape[3] // s
    img0_ds = resize_2d(frames[:, 0], (h, w), "bicubic", cfg.align_corners)
    img1_ds = resize_2d(frames[:, 1], (h, w), "bicubic", cfg.align_corners)
    smooth = cfg.smoothness * smoothness_forward_loss(
        fwd_out["flow_refine_pyramid"][0], img0_ds, img1_ds)
    warp = cfg.warp_alpha * endflow_forward_warp_loss(
        fwd_out["endflow_pyramid"][0], frames[:, 0], frames[:, 1], t)
    total = rec + smooth + warp
    return total, {"loss": total, "rec": rec, "smooth": smooth, "warp": warp}
