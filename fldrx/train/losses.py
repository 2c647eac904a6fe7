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

import jax

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


def smoothness_loss(flow: jnp.ndarray, img: jnp.ndarray,
                    weight: float = 150.0, edge_aware: bool = True):
    """Single-image first-order smoothness (set_smoothness_loss,
    utils.py:827-845) — the non-papermodel fallback (main.py:605-608)."""
    w2 = weight ** 2

    def gh(x):
        return x[:, 1:, :, :] - x[:, :-1, :, :]

    def gw(x):
        return x[:, :, 1:, :] - x[:, :, :-1, :]

    f_gh = jnp.abs(gh(flow))
    f_gw = jnp.abs(gw(flow))
    if not edge_aware:
        return 0.5 * (jnp.mean(f_gh) + jnp.mean(f_gw))
    w_gh = jnp.exp(-w2 * jnp.mean(gh(img) ** 2, -1, keepdims=True))
    w_gw = jnp.exp(-w2 * jnp.mean(gw(img) ** 2, -1, keepdims=True))
    return 0.5 * (jnp.mean(w_gh * f_gh) + jnp.mean(w_gw * f_gw))


def warping_loss(frames: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp photometric loss (set_warping_loss, utils.py:764-824;
    constructed main.py:323, epoch-annealed main.py:613-616 when
    --warping_loss). frames [B,2,H,W,3]; flow [B,H,W,4] (01 then 10)."""
    from ..ops.warp import bwarp

    first = frames[:, 0]
    second = frames[:, 1]
    warped_sec = bwarp(second, flow[..., 0:2])
    warped_fir = bwarp(first, flow[..., 2:4])
    return (jnp.mean(jnp.abs(warped_sec - first))
            + jnp.mean(jnp.abs(warped_fir - second)))


def warping_loss_endflow(frames: jnp.ndarray, gt: jnp.ndarray, endflow):
    """Backward endflow photometric loss (set_warping_loss_endflow,
    utils.py:712-762; gated off in the papermodel)."""
    from ..ops.warp import bwarp

    flow_t0, flow_t1 = endflow
    warped_fir = bwarp(frames[:, 0], flow_t0)
    warped_sec = bwarp(frames[:, 1], flow_t1)
    return (jnp.mean(jnp.abs(warped_sec - gt))
            + jnp.mean(jnp.abs(warped_fir - gt)))


def _orth_offdiag(ev: jnp.ndarray) -> jnp.ndarray:
    g = ev @ ev.T
    return jnp.sum(g) - jnp.trace(g)


def orthogonality_loss(*evs: jnp.ndarray) -> jnp.ndarray:
    """0.5·(Σ_EVs Σ_{k≠l} EV_k·EV_l)² — the --orthLoss term. The reference
    accumulates the off-diagonal Gram sums over EVERY entry of model_net.EVs
    and squares the total once (main.py:624-644); only added to the total
    when ≥ 0.1 (caller's rule)."""
    off = jnp.zeros(())
    for ev in evs:
        off = off + _orth_offdiag(ev)
    return 0.5 * off ** 2


def distillation_loss(unref_flow_pyramid, gtflow: jnp.ndarray) -> jnp.ndarray:
    """PWC-teacher flow distillation with confidence-adaptive robust loss
    (useful.py:119-144; dormant in the shipped model). Flows NHWC [B,h,w,4]
    fine→coarse; gtflow [B,H,W,4] at 1/1 of the teacher resolution."""
    from ..ops.resize import resize_2d

    top = resize_2d(unref_flow_pyramid[0],
                    (unref_flow_pyramid[0].shape[1] * 8,
                     unref_flow_pyramid[0].shape[2] * 8), "bilinear")
    Hh, Ww = top.shape[1], top.shape[2]
    top_sg = jax.lax.stop_gradient(top)
    pmap_10 = jnp.exp(-0.3 * jnp.sqrt(
        jnp.sum((top_sg[..., :2] - gtflow[..., :2]) ** 2, -1, keepdims=True)))
    pmap_01 = jnp.exp(-0.3 * jnp.sqrt(
        jnp.sum((top_sg[..., 2:] - gtflow[..., 2:]) ** 2, -1, keepdims=True)))
    alpha_10, alpha_01 = pmap_10 / 2, pmap_01 / 2
    eps_10 = 10.0 ** (-(10 * pmap_10 - 1) / 3)
    eps_01 = 10.0 ** (-(10 * pmap_01 - 1) / 3)
    loss = 0.0
    for f in unref_flow_pyramid[1:]:
        f_up = resize_2d(f, (Hh, Ww), "bilinear")
        d10 = f_up[..., :2] - gtflow[..., :2]
        d01 = f_up[..., 2:] - gtflow[..., 2:]
        # elementwise robust penalty, confidence broadcast over the 2 channels
        loss = loss + jnp.mean((d10 ** 2 + eps_10 ** 2) ** alpha_10)
        loss = loss + jnp.mean((d01 ** 2 + eps_01 ** 2) ** alpha_01)
    return loss


def total_loss(cfg: FLDRConfig, fwd_out: dict, target: jnp.ndarray,
               frames: jnp.ndarray, t: jnp.ndarray, params=None, epoch=None):
    """Assemble the shipped training loss. frames: [B,2,H,W,3] level-0 inputs.

    Optional switches (off in papermodel): cfg.warping_loss adds the
    epoch-annealed backward-warp photometric term (main.py:613-616;
    alpha = warp_alpha*(1-exp(-(epochs/4-epoch))) while epoch <= epochs/4);
    cfg.orth_loss adds the EV orthogonality penalty only when it exceeds 0.1
    (main.py:624-651). `epoch` may be a traced scalar; `params` supplies the
    EV matrix for the orthogonality term.
    """
    rec = pyramid_rec_loss(cfg, fwd_out["out_pyramid"], target)
    s = cfg.scales[0]
    h, w = frames.shape[2] // s, frames.shape[3] // s
    img0_ds = resize_2d(frames[:, 0], (h, w), "bicubic", cfg.align_corners)
    img1_ds = resize_2d(frames[:, 1], (h, w), "bicubic", cfg.align_corners)
    smooth = cfg.smoothness * smoothness_forward_loss(
        fwd_out["flow_refine_pyramid"][0], img0_ds, img1_ds)
    warp = cfg.warp_alpha * endflow_forward_warp_loss(
        fwd_out["endflow_pyramid"][0], frames[:, 0], frames[:, 1], t)
    if cfg.warping_loss and epoch is not None:
        # fine unrefined flow upscaled ×scales[0] bicubic (main.py:614-616)
        fine = fwd_out["unrefined_flow_pyramid"][0]
        H, W = frames.shape[2], frames.shape[3]
        fine_up = float(s) * resize_2d(fine, (H, W), "bicubic",
                                       cfg.align_corners)
        ep = jnp.asarray(epoch, jnp.float32)
        alpha = jnp.where(
            ep <= cfg.epochs / 4,
            cfg.warp_alpha * (1.0 - jnp.exp(-(cfg.epochs / 4 - ep))), 0.0)
        warp = warp + alpha * warping_loss(frames, fine_up)
    total = rec + smooth + warp
    orth = jnp.zeros(())
    if cfg.orth_loss and params is not None:
        # every EV scale contributes (main.py:624-631 loops model_net.EVs):
        # the shared scale-8 EV plus each per-scale EV when exac_one_ev=False
        evs = [params["pca"]["ev"].astype(jnp.float32)]
        if not cfg.exac_one_ev:
            for k in sorted(params.get("pca_multi", {})):
                evs.append(params["pca_multi"][k]["ev"].astype(jnp.float32))
        orth = orthogonality_loss(*evs)
        total = total + jnp.where(orth >= 0.1, orth, 0.0)   # caller's ≥0.1 rule
    # per-batch PSNR on [0,1]-denormed frames (main.py:670-673; skimage
    # peak_signal_noise_ratio with data_range=1 == 10·log10(1/mse))
    mse = jnp.mean((fwd_out["out_pyramid"][0] / 2 - target / 2) ** 2)
    psnr = -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
    return total, {"loss": total, "rec": rec, "smooth": smooth, "warp": warp,
                   "orth": orth, "psnr": psnr}
