"""fLDRnet — TPU-native functional JAX implementation.

Parity target: `DCTXVFInet`/`DCTVFInet`/`PCARefineUNet`
(/root/reference/fLDRnet.py:25-644). The reference's per-level Python memory
choreography (`del`/`empty_cache`, fLDRnet.py:424-499) is CUDA-OOM hygiene and
is deliberately not ported — XLA owns buffer lifetimes.

Design:
  * NHWC activations, HWIO conv weights (TPU-native layout). Channel indices
    inside the C axis match the reference's NCHW channel indices exactly, so
    converted checkpoint weights produce identical outputs.
  * Parameters are a plain nested-dict pytree (optax/orbax friendly).
  * The pyramid level loop is unrolled in Python — each level has distinct
    static shapes, which is exactly what XLA wants; the whole forward jits
    into a single program.
  * dtype policy: convs run in `compute_dtype` (f32 for parity, bf16 for
    speed); splat normalisation, flow algebra and the PCA transform stay f32.

Channel-order contract inherited from the reference (and baked into the
trained weights): PCA features are ordered (c, t, comp) → channel
c*2*nf + t*nf + comp, and `feat_x.reshape(B,2,48,...)` (fLDRnet.py:368)
splits that axis in half, mixing frames between the halves. We replicate by
splitting the last axis at 48.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FLDRConfig
from ..ops.block_pca import block_pca_features
from ..ops.resize import resize_2d
from ..ops.splat import softsplat
from ..ops.warp import bwarp

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def conv2d(p: Params, x: jnp.ndarray, stride: int = 1, pad: int = 1) -> jnp.ndarray:
    """NHWC conv with HWIO weights, zero padding (nn.Conv2d default).

    Precision policy: f32 activations request HIGHEST (the MXU's default
    single-pass bf16 costs ~1e-2 abs error vs the reference); bf16
    activations take the fast path — that's the speed-mode opt-in.
    """
    w = p["w"].astype(x.dtype)
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=prec,
    )
    return y + p["b"].astype(x.dtype)


def relu(x):
    return jax.nn.relu(x)


def upsample_nearest2x(x: jnp.ndarray) -> jnp.ndarray:
    """nn.UpsamplingNearest2d(scale_factor=2) — exact pixel repeat."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, H * 2, W * 2, C)


def _seq_conv_relu(ps: Sequence[Params], x: jnp.ndarray) -> jnp.ndarray:
    """conv-ReLU chain with no activation after the last conv
    (conv_flow_bottom / conv_flow2 pattern, fLDRnet.py:318-345)."""
    for i, p in enumerate(ps):
        x = conv2d(p, x)
        if i != len(ps) - 1:
            x = relu(x)
    return x


# ---------------------------------------------------------------------------
# PCARefineUNet (fLDRnet.py:584-644)
# ---------------------------------------------------------------------------

def refine_unet(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    enc1 = relu(conv2d(p["enc1"], x, stride=2, pad=1))        # 4x4/2
    enc2 = relu(conv2d(p["enc2"], enc1, stride=2, pad=1))
    out = relu(conv2d(p["enc3"], enc2, stride=2, pad=1))
    out = relu(conv2d(p["dec0"], out))
    out = upsample_nearest2x(out)
    out = jnp.concatenate([out, enc2], axis=-1)
    out = relu(conv2d(p["dec1"], out))
    out = upsample_nearest2x(out)
    out = jnp.concatenate([out, enc1], axis=-1)
    out = relu(conv2d(p["dec2"], out))
    out = upsample_nearest2x(out)
    return conv2d(p["dec3"], out)


# ---------------------------------------------------------------------------
# space-to-depth refine UNet — weight-exact repacking for TPU lane efficiency
#
# Why: the UNet's tensors have 6..96 channels; NHWC arrays with C < 128 pad
# the minor (lane) dim to 128 on TPU, so every conv/upsample/concat pays up
# to 8x the HBM traffic (measured: 72 ms bf16 at 4K, ~20x off roofline, with
# dec3/upsample dominating). Packing f x f spatial cells into channels keeps
# every tensor >= 64 lanes; the convs below consume/produce packed tensors
# directly via a one-time sparse re-indexing of the SAME weights, so the
# arithmetic is exactly the reference conv's (summation order aside).
# ---------------------------------------------------------------------------

def s2d(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """[B,H,W,C] → [B,H/f,W/f,f²C]; cell-major channel order (u·f+v)·C+c."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // f, f, W // f, f, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(B, H // f, W // f, f * f * C)


def d2s(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """Inverse of s2d."""
    B, Hf, Wf, Cf = x.shape
    C = Cf // (f * f)
    x = x.reshape(B, Hf, Wf, f, f, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(B, Hf * f, Wf * f, C)


@functools.lru_cache(maxsize=None)
def _repack_conv_idx(kh: int, kw: int, C: int, K: int, pin: int, pout: int,
                     stride: int, pad: int):
    """Static (numpy) gather index + mask for _repack_conv_w.

    Each fine-kernel element lands at exactly one packed position, so the
    repack is a pure gather of the flattened weights plus a zero mask —
    built once per (shape, packing) in numpy and cached, instead of tracing
    ~pout²·kh·kw dynamic-update-slices per conv per trace (the 4K/train
    traces already take minutes; VERDICT r4 weak-item 5)."""
    idx = np.zeros((3, 3, pin * pin * C, pout * pout * K), np.int32)
    mask = np.zeros((3, 3, pin * pin * C, pout * pout * K), bool)
    blk = np.arange(C)[:, None] * K + np.arange(K)[None, :]
    for io in range(pout):
        for jo in range(pout):
            for ky in range(kh):
                for kx in range(kw):
                    dy, uy = divmod(stride * io + ky - pad, pin)
                    dx, ux = divmod(stride * jo + kx - pad, pin)
                    ci = (uy * pin + ux) * C
                    co = (io * pout + jo) * K
                    idx[dy + 1, dx + 1, ci:ci + C, co:co + K] = \
                        (ky * kw + kx) * C * K + blk
                    mask[dy + 1, dx + 1, ci:ci + C, co:co + K] = True
    return idx, mask


def _repack_conv_w(w: jnp.ndarray, pin: int, pout: int, stride: int,
                   pad: int) -> jnp.ndarray:
    """Re-index conv weights [kh,kw,C,K] for packed operands.

    The conv runs on a fine grid; input arrives pin-packed, output leaves
    pout-packed, both at the same packed spatial grid (requires
    pin == stride·pout). Fine-grid tap stride·io + ky − pad lands in packed
    cell divmod(·, pin); a 3×3 packed kernel always suffices for
    kh − pad ≤ stride + pad·(pin−1) here (kh ≤ 4, pad = 1). Zero cells of
    the packed kernel reproduce the fine conv's zero padding exactly.
    """
    kh, kw, C, K = w.shape
    assert pin == stride * pout
    idx, mask = _repack_conv_idx(kh, kw, C, K, pin, pout, stride, pad)
    return jnp.where(jnp.asarray(mask), w.reshape(-1)[jnp.asarray(idx)],
                     jnp.zeros((), w.dtype))


def _packed_conv(p: Params, x: jnp.ndarray, pin: int, pout: int,
                 stride: int, pad: int = 1, in_perm=None) -> jnp.ndarray:
    w = _repack_conv_w(p["w"], pin, pout, stride, pad).astype(x.dtype)
    if in_perm is not None:
        # input channels arrive permuted (e.g. the u-plane synthesis feeds
        # u-major/component-major order so its concat is all flat-wide
        # pieces); permuting the weight rows keeps the conv weight-exact
        w = w[:, :, jnp.asarray(in_perm), :]
    b = jnp.tile(p["b"], pout * pout)
    if x.dtype == jnp.bfloat16:
        # Pallas pixel-rows conv (XLA's conv reaches ~2-5% MXU utilization
        # at these shapes; the roll-based kernel avoids materialized im2col)
        from ..ops.fastconv import conv3x3_pixrows
        return conv3x3_pixrows(x, w, b)
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec)
    return y + b.astype(x.dtype)


def refine_unet_s2d_core(p: Params, xs4: jnp.ndarray,
                         in_perm=None) -> jnp.ndarray:
    """PCARefineUNet on space-to-depth packed tensors (weight-exact):
    consumes a cell-major s2d4 input [B, H/4, W/4, 16·C] (or any channel
    permutation of it given `in_perm` mapping new→cell-major) and returns
    the cell-major s2d4 output [B, H/4, W/4, 16·out] — the packed-domain
    synthesis path feeds/consumes this directly with no boundary
    transposes (they cost more than the convs themselves, measured)."""
    e1 = relu(_packed_conv(p["enc1"], xs4, 4, 2, 2,
                           in_perm=in_perm))          # s2d2(half), 64ch
    e2 = relu(_packed_conv(p["enc2"], e1, 2, 1, 2))   # plain quarter, 32ch
    e2p = s2d(e2, 2)                                  # s2d2(quarter), 128ch
    e3 = relu(_packed_conv(p["enc3"], e2p, 2, 1, 2))  # plain eighth, 64ch
    d0 = relu(conv2d(p["dec0"], e3))                  # plain eighth, 64ch
    # upsample to quarter grid + skip concat (both plain at [H/4, W/4])
    u0 = jnp.concatenate([upsample_nearest2x(d0), e2], -1)   # 96ch quarter
    d1 = relu(conv2d(p["dec1"], u0))                  # 32ch quarter
    # half grid, packed: nearest-upsample = repeat d1 per cell, interleaved
    # with the matching cell slice of the e1 skip (cell-major channel order)
    e1c = e1.shape[-1] // 4
    u1 = jnp.concatenate(
        [jnp.concatenate([d1, e1[..., cell * e1c:(cell + 1) * e1c]], -1)
         for cell in range(4)], -1)                   # s2d2(half), 4*(32+16)
    d2 = relu(_packed_conv(p["dec2"], u1, 2, 2, 1))   # s2d2(half), 64ch
    # full grid packed: s2d4(full) cell (u,v) ← d2 cell (u//2, v//2)
    d2c = d2.shape[-1] // 4
    u2 = jnp.concatenate(
        [d2[..., ((u // 2) * 2 + (v // 2)) * d2c:
             ((u // 2) * 2 + (v // 2) + 1) * d2c]
         for u in range(4) for v in range(4)], -1)    # s2d4(full), 16*16
    return _packed_conv(p["dec3"], u2, 4, 4, 1)       # s2d4(full), 16*out


def refine_unet_s2d(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """PCARefineUNet on space-to-depth packed tensors (weight-exact).

    Grids: full H×W input → quarter-spatial packed reps throughout.
    Measured at 4K bf16: ~68 ms vs 72 ms plain NHWC — the convs improve
    ~2x but the s2d/d2s boundary transposes pay most of it back; XLA's
    conv itself is the remaining wall (~2-5% MXU utilization here). The
    packed-domain synthesis path avoids both boundary transposes by
    calling refine_unet_s2d_core directly.
    """
    out = refine_unet_s2d_core(p, s2d(x, 4))
    # unpack via the 2D-flat route: transposing into [H, W*C] then splitting
    # the minor dim is measurably cheaper than transposing straight into the
    # narrow-C NHWC layout (19 vs 34 ms at 4K, measured)
    Bo, Hf, Wf, Cf = out.shape
    Co = Cf // 16
    o = out.reshape(Bo, Hf, Wf, 4, 4, Co)
    o = jnp.transpose(o, (0, 1, 3, 2, 4, 5)).reshape(Bo, Hf * 4, Wf * 4 * Co)
    return o.reshape(Bo, Hf * 4, Wf * 4, Co)

def _warp_fns(fast: bool):
    """(bwarp, softsplat) implementation pair: exact XLA or the Pallas warp
    engine (ops/fastwarp.py). The fast pair carries custom VJPs mirroring
    the reference CUDA backward kernels, so it serves training too."""
    if fast:
        from ..ops.fastwarp import bwarp_diff, softsplat_diff
        return bwarp_diff, softsplat_diff
    return bwarp, softsplat


def level_flow(p: Params, feat: jnp.ndarray,
               flow_prev: Optional[jnp.ndarray],
               fast: bool = False) -> jnp.ndarray:
    """One DCTVFInet flow step on PCA features.

    feat: [B, h, w, 96]; split at 48 exactly as feat_x.reshape(B,2,48,...)
    (fLDRnet.py:368) — a frame-mixing split the trained weights expect.
    Returns flow [B, h, w, 4] = (flow_10_x, flow_10_y, flow_01_x, flow_01_y).
    """
    # coarse-level feature splats always use the exact XLA scatter, even in
    # fast_warp mode: the flow grids here are <=288x512, small enough that
    # the strip-splat kernel's fixed per-launch costs lose (r4-measured:
    # 192.8 vs 205.0 ms/pair flow stage; end-to-end 4.695 vs 4.696 alone,
    # 4.723 composed with the naive-einsum resize — queue_results.log R4H).
    ssplat = softsplat
    half = feat.shape[-1] // 2
    feat0 = feat[..., :half]
    feat1 = feat[..., half:]
    if flow_prev is None:
        tmp = _seq_conv_relu(p["flow_bottom"], jnp.concatenate([feat0, feat1], -1))
        return tmp[..., :4]
    # upsample previous flow; the reference scales ALL 4 channels by the
    # width ratio only (fLDRnet.py:384-385) and detaches
    h, w = feat.shape[1], feat.shape[2]
    prev = jax.lax.stop_gradient(flow_prev)
    up = resize_2d(prev, (h, w), "bilinear") * (w / flow_prev.shape[2])
    warped1 = ssplat(feat1, up[..., 0:2])
    warped0 = ssplat(feat0, up[..., 2:4])
    a = conv2d(p["conv_flow1"], jnp.concatenate([feat0, warped1], -1))
    b = conv2d(p["conv_flow1"], jnp.concatenate([feat1, warped0], -1))
    tmp = _seq_conv_relu(p["conv_flow2"], jnp.concatenate([a, b, up], -1))
    return tmp[..., :4] + up


# ---------------------------------------------------------------------------
# synthesis (fLDRnet.py:400-543)
# ---------------------------------------------------------------------------

def _bwarp_ones_mask(flow: jnp.ndarray) -> jnp.ndarray:
    """bwarp's 0.999 validity mask (fLDRnet.py:568-580), computed
    analytically from the sampling coordinates — no gather needed, and in
    the separable closed form (ops/fastwarp.ones_mask_sep; fp-identical up
    to 1 ulp at the frame border). Fast-path only — the strict path's
    bwarp keeps the corner-sum form. flow: [B, H, W, 2] → [B, H, W, 1]."""
    from ..ops.fastwarp import ones_mask_sep
    B, H, W, _ = flow.shape
    xs = jnp.arange(W, dtype=flow.dtype)
    ys = jnp.arange(H, dtype=flow.dtype)
    sx = (xs[None, None, :] + flow[..., 0]) * (W / max(W - 1, 1)) - 0.5
    sy = (ys[None, :, None] + flow[..., 1]) * (H / max(H - 1, 1)) - 0.5
    return ones_mask_sep(sx, sy, H, W)[..., None]


def z_metrics(p: Params, x0, x1, flow_10, flow_01, fast: bool = False,
              fused: bool = False, tiled_out: bool = False):
    """Softsplat importance metrics z0/z1 (fLDRnet.py:439-446) — t-independent,
    so the multi-t path hoists them out of the per-t synthesis. fused=True
    runs both backward warps in one fused gather launch (fast path only).

    tiled_out=True (fused only, GTILE == TILE) keeps the whole z chain in
    the warp kernels' tile domain — the gathered frame is reduced to z
    without ever untiling, and the returned z [B, ntiles, N] feeds the
    splat-vals tiling directly (synthesize_packed_multi). Bitwise the
    same values as the full-res form, minus two 4K layout round trips."""
    z_alpha = p["z_alpha"].astype(x0.dtype)
    if fused and fast:
        from ..ops.fastwarp import (_sample_coords, _tile_flatten,
                                    gather_multi, GTILE)
        B, H, W, C = x0.shape
        outs0, outs1 = [], []
        for b in range(B):
            sx1, sy1 = _sample_coords(flow_01[b], H, W)
            sx0, sy0 = _sample_coords(flow_10[b], H, W)
            g10, g01 = gather_multi(
                [x0[b], x1[b]],
                [(1, sx1, sy1, True), (0, sx0, sy0, True)],
                tiled_out=tiled_out)
            if tiled_out:
                x0_t = _tile_flatten(x0[b], H, W, tile=GTILE)
                x1_t = _tile_flatten(x1[b], H, W, tile=GTILE)
                outs0.append(jnp.mean(z_alpha[0] * jnp.abs(x0_t - g10),
                                      axis=-1))
                outs1.append(jnp.mean(z_alpha[1] * jnp.abs(x1_t - g01),
                                      axis=-1))
            else:
                outs0.append(g10)
                outs1.append(g01)
        if tiled_out:
            return jnp.stack(outs0, 0), jnp.stack(outs1, 0)  # [B, nt, N]
        im_1_0 = jnp.stack(outs0, 0)
        im_0_1 = jnp.stack(outs1, 0)
    else:
        assert not tiled_out
        bw, _ = _warp_fns(fast)
        im_1_0 = bw(x1, flow_01)
        im_0_1 = bw(x0, flow_10)
    z0 = jnp.mean(z_alpha[0] * jnp.abs(x0 - im_1_0), axis=-1, keepdims=True)
    z1 = jnp.mean(z_alpha[1] * jnp.abs(x1 - im_0_1), axis=-1, keepdims=True)
    return z0, z1


def synthesize(p: Params, flow_l: jnp.ndarray, images: jnp.ndarray,
               t: jnp.ndarray, crop_hw: Optional[Tuple[int, int]] = None,
               fast: bool = False, precomputed=None,
               compute_dtype=jnp.float32):
    """Warp + blend at one level.

    flow_l: [B, h, w, 4] on the feature grid; images: [B, 2, H, W, 3] with
    H = 8h (this level's frames); t: [B, 1].
    Returns (out, flow_refine, occ_0, endflow) where out is [B, H, W, 3].

    compute_dtype=bfloat16 runs the refine UNet at the MXU's fast pass
    (~3x faster at 4K); warps, softmax and the candidate blend stay f32
    (measured PSNR impact of the bf16 UNet: see PARITY.md).
    """
    B = flow_l.shape[0]
    tb = t.reshape(B, 1, 1, 1).astype(flow_l.dtype)
    flow_10 = flow_l[..., 0:2]
    flow_01 = flow_l[..., 2:4]
    flow_t0 = tb * flow_01
    flow_t1 = (1.0 - tb) * flow_10
    flow_refine = jnp.concatenate([flow_t0, flow_t1], -1)   # feature-grid res

    H, W = images.shape[2], images.shape[3]
    upscale = H // flow_l.shape[1]

    def up(f):
        return upscale * resize_2d(f, (H, W), "bilinear")

    if precomputed is not None:
        flow_10, flow_01, z0, z1 = precomputed[:4]
        if fast:
            # scalar t commutes through the linear resize: reuse the
            # precomputed full-res endpoint flows instead of resizing the
            # t-scaled fields per t (saves two full-res resize passes per
            # t-value; fp-rounding differs only at bilinear floor
            # boundaries — measured deviation ~124 dB, see PARITY.md)
            flow_t0, flow_t1 = tb * flow_01, (1.0 - tb) * flow_10
        else:
            flow_t0, flow_t1 = up(flow_t0), up(flow_t1)
    else:
        flow_t0, flow_t1 = up(flow_t0), up(flow_t1)
        flow_10, flow_01 = up(flow_10), up(flow_01)

    x0 = images[:, 0]
    x1 = images[:, 1]
    if crop_hw is not None:
        ch, cw = crop_hw
        flow_t0, flow_t1 = flow_t0[:, :ch, :cw], flow_t1[:, :ch, :cw]
        flow_10, flow_01 = flow_10[:, :ch, :cw], flow_01[:, :ch, :cw]
        x0, x1 = x0[:, :ch, :cw], x1[:, :ch, :cw]

    bw, ssplat = _warp_fns(fast)
    if precomputed is None:
        z0, z1 = z_metrics(p, x0, x1, flow_10, flow_01, fast)

    warped0 = ssplat(x0, flow_t0, z=z0)
    warped1 = ssplat(x1, flow_t1, z=z1)

    # backward-warp candidates via flow composition (:474-479).
    # The low-res composition needs the flow grid to be large relative to
    # the fields' variation (at 4K it is 288x512); tiny grids fall back to
    # the full-res composition so toy-scale parity stays tight.
    if fast and min(flow_l.shape[1], flow_l.shape[2]) >= 96:
        # fast path: compose the (everywhere 8x-bilinear-upsampled, hence
        # smooth) flow fields at the feature grid and upsample the result —
        # commutes with the full-res composition up to second-order terms;
        # measured PSNR impact recorded in PARITY.md. Kills two full-res
        # gathers per t-value. The bwarp validity mask is applied at FULL
        # resolution (analytic corner test, no gather) — a low-res mask
        # would zero an 8-px-wide border band.
        fb0 = bw(flow_l[..., 0:2] * tb, (1.0 - tb) * flow_l[..., 2:4],
                 False)
        fb1 = bw(flow_l[..., 2:4] * (1.0 - tb), tb * flow_l[..., 0:2],
                 False)
        flowback_0 = up(fb0)
        flowback_1 = up(fb1)
        m0 = _bwarp_ones_mask((1.0 - tb) * flow_01)
        m1 = _bwarp_ones_mask(tb * flow_10)
        if crop_hw is not None:
            flowback_0 = flowback_0[:, :crop_hw[0], :crop_hw[1]]
            flowback_1 = flowback_1[:, :crop_hw[0], :crop_hw[1]]
            m0 = m0[:, :crop_hw[0], :crop_hw[1]]
            m1 = m1[:, :crop_hw[0], :crop_hw[1]]
        flowback_0 = flowback_0 * m0
        flowback_1 = flowback_1 * m1
    else:
        flowback_0 = bw(flow_10 * tb, (1.0 - tb) * flow_01)
        flowback_1 = bw(flow_01 * (1.0 - tb), tb * flow_10)
    im0_tot = bw(x0, flowback_0)
    im1_tot = bw(x1, flowback_1)

    refine_in = jnp.concatenate(
        [x0, x1, warped0, warped1, flow_t0, flow_t1,
         flowback_0, flowback_1, im0_tot, im1_tot], -1)      # 26 ch (:480)
    # s2d variant is a weight-exact repacking (lane-efficiency; ~8x faster
    # at 4K) — use it whenever the spatial dims divide by 4
    unet = (refine_unet_s2d
            if refine_in.shape[1] % 4 == 0 and refine_in.shape[2] % 4 == 0
            else refine_unet)
    out = unet(p["refine"], refine_in.astype(compute_dtype))
    out = out.astype(jnp.float32)

    T = p["T_param"].astype(out.dtype)
    occ = jax.nn.softmax(out[..., :6] / T, axis=-1)

    w0 = (1 - tb) * occ[..., 0:1]
    w1 = tb * occ[..., 1:2]
    w2 = (1 - tb) * occ[..., 2:3]
    w3 = tb * occ[..., 3:4]
    w4 = (1 - tb) * occ[..., 4:5]
    w5 = tb * occ[..., 5:6]
    divisor = w0 + w1 + w2 + w3 + w4 + w5
    out_l = (w0 * warped0 + w1 * warped1 + w2 * im0_tot + w3 * im1_tot
             + w4 * x0 + w5 * x1) / divisor
    return out_l, flow_refine, occ[..., 0:1], (flow_t0, flow_t1)


def can_use_packed(flow_l: jnp.ndarray, images: jnp.ndarray) -> bool:
    """Shape gate for the packed-domain synthesis: TILE-divisible frames
    (the warp kernels' tiling) and a flow grid large enough for the
    low-res flowback composition (same bound as the plain fast path)."""
    H, W = images.shape[2], images.shape[3]
    return (H % 32 == 0 and W % 32 == 0
            and min(flow_l.shape[1], flow_l.shape[2]) >= 96)


def _planes_batch(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] → u-planes [B, 4, H/4, W·C] (strided row slices +
    stack — one wide write; done ONCE PER PAIR in flow_extras because
    strided-slice VIEWS at use sites do NOT fuse: each consumer
    materializes its own copy (measured −0.75 fps when the packed
    synthesis read 32 such views per t)."""
    B, H, W, C = x.shape
    flat = x.reshape(B, H, W * C)
    return jnp.stack([flat[:, u::4] for u in range(4)], axis=1)


@functools.lru_cache(maxsize=None)
def _uorder_perm(ks):
    """Channel permutation new→cell-major for the u-plane UNet input:
    new order (u, comp, v, cc) ↔ cell-major (u·4+v)·ΣK + off(comp)+cc."""
    total = sum(ks)
    offs = np.concatenate([[0], np.cumsum(ks)[:-1]])
    perm = []
    for u in range(4):
        for off, k in zip(offs, ks):
            for v in range(4):
                for cc in range(k):
                    perm.append((u * 4 + v) * total + off + cc)
    return np.asarray(perm, np.int32)


@functools.lru_cache(maxsize=None)
def _upsample_mats(h: int, w: int, out_h: int, out_w: int, C: int):
    # NUMPY results only: caching jnp arrays created during a trace leaks
    # tracers across jit boundaries (UnexpectedTracerError)
    from ..ops.resize import _resize_matrix_np
    Wh = _resize_matrix_np(h, out_h, "bilinear", False).astype(np.float32)
    Ww = _resize_matrix_np(w, out_w, "bilinear", False).astype(np.float32)
    # W2[w·C + c, p·C + c'] = Ww[p, w]·δ(c,c') — flat-wide second contraction
    W2 = np.kron(Ww, np.eye(C, dtype=np.float32)).T.copy()
    return Wh, W2


def _upsample_to_planes(fb: jnp.ndarray, out_h: int, out_w: int):
    """Bilinear-resize [B, h, w, C] straight to u-planes
    [B, 4, out_h/4, out_w·C].

    Row-bitwise-equal to resize_2d (same interpolation matrices, same
    contraction order and HIGHEST precision; the Kronecker Ww⊗I only adds
    exact zeros to each sum) — but every materialized tensor is flat-wide,
    so the planes come without the 4K strided-pack pass."""
    B, h, w, C = fb.shape
    Wh_np, W2_np = _upsample_mats(h, w, out_h, out_w, C)
    Wh, W2 = jnp.asarray(Wh_np), jnp.asarray(W2_np)
    hp = jax.lax.Precision.HIGHEST
    t1 = jnp.einsum("oh,bhk->bok", Wh, fb.reshape(B, h, w * C),
                    precision=hp)
    planes = [jnp.einsum("bok,kq->boq", t1[:, u::4], W2, precision=hp)
              for u in range(4)]
    return jnp.stack(planes, 1)               # [B, 4, out_h/4, out_w·C]


def blend_planes_24(out: jnp.ndarray, cands, tb5: jnp.ndarray,
                    Tparam: jnp.ndarray) -> jnp.ndarray:
    """The fast-path candidate blend on u-planes (fLDRnet.py:509-524).

    out: UNet logits [B, Hp4, Wp4, 96] f32 (per u: 24 = 4 v-cells × 6
    candidates); cands: 6 plane tensors [B, 4, Hp4, W·3]
    (warped0, warped1, im0, im1, x0, x1); tb5: [B,1,1,1,1] target time.
    Returns the blended u-planes [B, 4, Hp4, W·3].

    Fold the (1−t)/t candidate weights into the softmax logits:
    t_i·exp(o_i/T) = exp(o_i/T + log t_i), so the re-normalizing divisor
    cancels EXACTLY (fLDRnet.py:512-519 algebra) — saves the divisor sum,
    the final divide and six broadcast multiplies per u-plane (weights
    differ by ~1 ulp from the two-step form; fast-path only — `synthesize`
    keeps the reference arithmetic).

    The softmax stays on the 24-ch minor — stability max over all 24
    (constant within each group of 6, so the group softmax is unchanged up
    to ~ulp exponent scaling) and the group denominator via a
    block-diagonal ones [24,24] matmul — the (B,Hp4,Wp4,4,6) narrow-minor
    softmax intermediate never exists. (TPU-measured r4: 4.583 vs 4.577
    fps for the (4,6) jax.nn.softmax form; adopted as the only fast-path
    blend. A wide-minor one-hot-expanded rebuild measured 4.607 vs 4.670
    and was reverted — git 8ee1888^..)
    """
    B, Hp4, Wp4, _ = out.shape
    W = cands[0].shape[3] // 3
    warped0P, warped1P, im0P, im1P, x0P, x1P = cands

    def cells(P, u, k):
        """Plane u of a [B, 4, Hp4, W·k] tensor as [B, Hp4, Wp4, 4, k]."""
        return P[:, u].reshape(B, Hp4, Wp4, 4, k)

    logt = jnp.log(tb5)
    log1mt = jnp.log(1.0 - tb5)
    bias = jnp.concatenate(
        [log1mt, logt, log1mt, logt, log1mt, logt], -1)  # [B,1,1,1,6]
    # (A wide-minor variant — the softmax ONCE on the full 96-lane minor,
    # FLDRX_BLEND96, ulp-equal — was TPU-measured in r5 and deleted:
    # 4.665 vs 4.708 fps in context and 34.4 vs 32.9 ms standalone
    # (R5C-0/1), even though the standalone DECOMPOSITION put the softmax
    # half at 25 of 33 ms. In context XLA already fuses the 24-minor
    # chain; the standalone softmax cost is parameter-layout copies that
    # the real program does not pay. Lesson recorded in PROFILE.md; git
    # history keeps the implementation.)
    G24 = jnp.asarray(
        np.kron(np.eye(4, dtype=np.float32),
                np.ones((6, 6), np.float32)))
    bias24 = jnp.tile(bias[..., 0, :], (1, 1, 1, 4))      # [B,1,1,24]
    out_planes = []
    for u in range(4):
        xu = out[..., u * 24:u * 24 + 24] / Tparam + bias24
        e = jnp.exp(xu - jnp.max(xu, axis=-1, keepdims=True))
        denom = jnp.einsum("bhwq,qr->bhwr", e, G24,
                           precision=jax.lax.Precision.HIGHEST)
        p6 = (e / denom).reshape(B, Hp4, Wp4, 4, 6)
        out_u = (p6[..., 0:1] * cells(warped0P, u, 3)
                 + p6[..., 1:2] * cells(warped1P, u, 3)
                 + p6[..., 2:3] * cells(im0P, u, 3)
                 + p6[..., 3:4] * cells(im1P, u, 3)
                 + p6[..., 4:5] * cells(x0P, u, 3)
                 + p6[..., 5:6] * cells(x1P, u, 3))
        out_planes.append(out_u.reshape(B, Hp4, W * 3))
    return jnp.stack(out_planes, axis=1)                  # [B,4,Hp4,W·3]


def synthesize_packed(p: Params, flow_l: jnp.ndarray, images: jnp.ndarray,
                      t: jnp.ndarray, precomputed=None,
                      compute_dtype=jnp.float32, planes_out=False):
    """Level-0 packed (u-plane) synthesis for ONE t — the T=1 chunk of
    synthesize_packed_multi (same launches, identical numerics); see that
    function for the design notes."""
    return synthesize_packed_multi(p, flow_l, images, [t],
                                   precomputed=precomputed,
                                   compute_dtype=compute_dtype,
                                   planes_out=planes_out)[0]


def synthesize_packed_multi(p: Params, flow_l: jnp.ndarray,
                            images: jnp.ndarray, ts,
                            precomputed=None, compute_dtype=jnp.float32,
                            planes_out=False):
    """Level-0 synthesis for a CHUNK of t-values with every full-res tensor
    in the u-plane space-to-depth form [B, 4, H/4, W·C] (inference fast
    path) and the warp work of ALL t-values fused into one launch per stage.

    Why the packed form: XLA on TPU pads the minor (lane) dim to 128, so any
    transpose interleaving 4x4 cells into channel-minor 4K layouts costs
    10-35 ms (worst case a 32x lane-padding blowup). In the u-plane form
    (plane u = rows y≡u mod 4, flat) the warp kernels emit packed layouts
    natively (see ops/fastwarp.py), every cell view is a pure reshape, the
    refine UNet consumes/produces the cell-major s2d4 packing with no
    boundary transposes (refine_unet_s2d_core), the blend runs per plane,
    and the single final unpack is a row-DMA Pallas kernel (ops/repack.py).
    Numerics are identical to the plain fast path up to scalar-t resize
    commutation (~124 dB, PARITY.md).

    Why the cross-t fusion: the 2T softmax splats share ONE strip sweep
    (the t-invariant tiled vals CSE into one array — splat_multi's
    coords-pushed spill neutralization exists for this), the 2T low-res
    flowback compositions share one gather launch, and the 2T im_tot
    gathers share another — the per-launch prologue/epilogue (~7 ms each
    at 4K) and kernel grid warmup are paid once per chunk instead of once
    per t. Per-problem kernel math is bitwise-identical to the single-t
    program; the refine UNet and blend stay per-t (each is already one
    large MXU program).

    ts: sequence of [B, 1] t arrays. Returns a list of per-t tuples
    (out [B, H, W, 3], flow_refine, None, None).

    planes_out=True skips the final interleave kernel and returns out in
    u-plane form [B, 4, H/4, W·3] (a pure layout permutation — bit-equal
    values): eval consumers fetch frames to the host anyway, where the
    unpack is one numpy memcpy on worker threads (ops/repack.py
    planes_to_plain_np) instead of ~12 ms/t of device row DMAs.

    Inference-only: no custom VJP is attached (training uses `synthesize`).
    Reference: fLDRnet.py:400-524 (the reference re-runs this whole
    synthesis once per target time, main.py:867).
    """
    from ..ops.fastwarp import (_sample_coords, gather_multi, splat_multi,
                                tile_us_from_planes)
    from ..ops.repack import interleave_planes

    B = flow_l.shape[0]
    T = len(ts)
    flow_l = flow_l.astype(jnp.float32)
    images = images.astype(jnp.float32)
    tbs = [t.reshape(B, 1, 1, 1).astype(jnp.float32) for t in ts]
    flow_10 = flow_l[..., 0:2]
    flow_01 = flow_l[..., 2:4]

    H, W = images.shape[2], images.shape[3]
    h, w = flow_l.shape[1], flow_l.shape[2]
    Hp4, Wp4 = H // 4, W // 4
    upscale = H // h
    x0 = images[:, 0]
    x1 = images[:, 1]

    if precomputed is not None and len(precomputed) == 8:
        (flow_10f, flow_01f, z0, z1, x0P, x1P, f10P, f01P) = precomputed
    else:
        if precomputed is not None:
            flow_10f, flow_01f, z0, z1 = precomputed[:4]
        else:
            flow_10f = upscale * resize_2d(flow_10, (H, W), "bilinear")
            flow_01f = upscale * resize_2d(flow_01, (H, W), "bilinear")
            z0, z1 = z_metrics(p, x0, x1, flow_10f, flow_01f, fast=True,
                               fused=True)
        x0P, x1P = _planes_batch(x0), _planes_batch(x1)
        f10P, f01P = _planes_batch(flow_10f), _planes_batch(flow_01f)

    def softsplat_vals(x, z):
        inp01 = (x + 1.0) * 0.5
        m = jnp.exp(z)
        return jnp.concatenate([inp01 * m, m], axis=-1)        # [..., 4]

    # tiled z chain (flow_extras with GTILE == TILE): z arrives
    # [B, ntiles, N]; build the splat vals directly in tile domain —
    # bitwise the same values, two fewer 4K layout round trips
    ztiled = z0.ndim == 3
    if ztiled:
        from ..ops.fastwarp import TILE as _T

        def tile_b(x):
            a = x.reshape(B, H // _T, _T, W // _T, _T, -1)
            return jnp.moveaxis(a, 3, 2).reshape(
                B, (H // _T) * (W // _T), _T * _T, -1)

        vals0 = softsplat_vals(tile_b(x0), z0[..., None])
        vals1 = softsplat_vals(tile_b(x1), z1[..., None])
    else:
        vals0 = softsplat_vals(x0, z0)
        vals1 = softsplat_vals(x1, z1)
    xsF = jnp.arange(W, dtype=jnp.float32)
    ysF = jnp.arange(H, dtype=jnp.float32)

    def norm_planes(s):
        s = s.reshape(4, Hp4, W, 4)
        nz = s[..., -1:]
        nz = jnp.where(nz == 0.0, jnp.ones_like(nz), nz)
        return ((s[..., :-1] / nz - 0.5) * 2.0).reshape(4, Hp4, W * 3)

    # per-t scaled fields: scalar multiples of the per-pair tensors (XLA
    # fuses them into the coordinate computations)
    flow_t0f = [tb * flow_01f for tb in tbs]
    flow_t1f = [(1.0 - tb) * flow_10f for tb in tbs]
    fbsrc0 = [flow_10 * tb for tb in tbs]
    fbsrc1 = [flow_01 * (1.0 - tb) for tb in tbs]
    fbfl0 = [(1.0 - tb) * flow_01 for tb in tbs]
    fbfl1 = [tb * flow_10 for tb in tbs]

    # ---- fused warp launches: the per-t 2 splats share one strip sweep,
    # the 2 flow compositions share one gather launch. (A cross-t 2T-problem
    # variant — t_fuse, with kernel vals sharing and in-kernel per-t coords —
    # was built and TPU-measured twice: 4.23 vs 4.28 r3, 4.577 vs 4.577 r4;
    # the pinned-input pressure cancels the prologue saving, so the cross-t
    # fusion was removed and this runs with T=1 chunks from the per-t loop.)
    w0L = [[] for _ in range(T)]
    w1L = [[] for _ in range(T)]
    fb0L = [[] for _ in range(T)]
    fb1L = [[] for _ in range(T)]
    for b in range(B):
        probs = []
        # hoist the per-b vals (ONE object per frame): splat_multi's
        # identity-based dedup ships each distinct vals array once and
        # routes problem p → its vals slot in the kernel's index_map
        v0b, v1b = vals0[b], vals1[b]
        for k in range(T):
            probs.append((v0b, xsF[None, :] + flow_t0f[k][b, ..., 0],
                          ysF[:, None] + flow_t0f[k][b, ..., 1]))
            probs.append((v1b, xsF[None, :] + flow_t1f[k][b, ..., 0],
                          ysF[:, None] + flow_t1f[k][b, ..., 1]))
        souts = splat_multi(probs, vals_tiled=ztiled)
        gimgs, gprobs = [], []
        for k in range(T):
            sx0, sy0 = _sample_coords(fbfl0[k][b], h, w)
            sx1, sy1 = _sample_coords(fbfl1[k][b], h, w)
            gimgs += [fbsrc0[k][b], fbsrc1[k][b]]
            gprobs += [(2 * k, sx0, sy0, False),
                       (2 * k + 1, sx1, sy1, False)]
        gouts = gather_multi(gimgs, gprobs)
        for k in range(T):
            w0L[k].append(norm_planes(souts[2 * k]))
            w1L[k].append(norm_planes(souts[2 * k + 1]))
            fb0L[k].append(gouts[2 * k])
            fb1L[k].append(gouts[2 * k + 1])
    warped0P = [jnp.stack(w0L[k], 0) for k in range(T)]
    warped1P = [jnp.stack(w1L[k], 0) for k in range(T)]
    fb0 = [jnp.stack(fb0L[k], 0) for k in range(T)]
    fb1 = [jnp.stack(fb1L[k], 0) for k in range(T)]

    # flowback fields upsampled STRAIGHT to u-planes (row-bitwise-equal to
    # the plain resize) and masked there; the im_tot gather coords tile
    # straight from the planes — no plain full-res flowback tensor exists
    def mask_planes(flP):
        """_bwarp_ones_mask on a plane-form flow [B,4,Hp4,W·2] (views of
        the per-pair materialized planes — contiguous reshapes, fused),
        in the separable closed form (ops/fastwarp.ones_mask_sep)."""
        from ..ops.fastwarp import ones_mask_sep
        fl = flP.reshape(B, 4, Hp4, W, 2)
        uoff = jnp.arange(4, dtype=jnp.float32).reshape(1, 4, 1, 1)
        ys4 = 4.0 * jnp.arange(Hp4, dtype=jnp.float32).reshape(1, 1, Hp4, 1)
        sx = (xsF[None, None, None, :] + fl[..., 0]) * (
            W / max(W - 1, 1)) - 0.5
        sy = (ys4 + uoff + fl[..., 1]) * (H / max(H - 1, 1)) - 0.5
        return ones_mask_sep(sx, sy, H, W)[..., None]

    fb0P = [(upscale * _upsample_to_planes(fb0[k], H, W)).reshape(
        B, 4, Hp4, W, 2) * mask_planes((1.0 - tbs[k]) * f01P)
        for k in range(T)]
    fb1P = [(upscale * _upsample_to_planes(fb1[k], H, W)).reshape(
        B, 4, Hp4, W, 2) * mask_planes(tbs[k] * f10P)
        for k in range(T)]

    # ---- cross-t fused im_tot gathers: 2T problems over the two frames ----
    im0L = [[] for _ in range(T)]
    im1L = [[] for _ in range(T)]
    uoff = jnp.arange(4, dtype=jnp.float32).reshape(4, 1, 1)
    ys4 = 4.0 * jnp.arange(Hp4, dtype=jnp.float32).reshape(1, Hp4, 1)
    for b in range(B):
        def tiled_coords(fbP):
            sx = (xsF[None, None, :] + fbP[b, ..., 0]) * (
                W / max(W - 1, 1)) - 0.5
            sy = (ys4 + uoff + fbP[b, ..., 1]) * (H / max(H - 1, 1)) - 0.5
            return (tile_us_from_planes(sx, H, W),
                    tile_us_from_planes(sy, H, W))
        iprobs = []
        for k in range(T):
            sx0, sy0 = tiled_coords(fb0P[k])
            sx1, sy1 = tiled_coords(fb1P[k])
            iprobs += [(0, sx0, sy0, True), (1, sx1, sy1, True)]
        iouts = gather_multi([x0[b], x1[b]], iprobs, planes_out=True,
                             coords_tiled=True)
        for k in range(T):
            im0L[k].append(iouts[2 * k])
            im1L[k].append(iouts[2 * k + 1])
    im0P = [jnp.stack(im0L[k], 0) for k in range(T)]
    im1P = [jnp.stack(im1L[k], 0) for k in range(T)]
    fb0P = [f.reshape(B, 4, Hp4, W * 2) for f in fb0P]
    fb1P = [f.reshape(B, 4, Hp4, W * 2) for f in fb1P]


    # ---- per-t refine UNet + blend (each already one large MXU program).
    # UNet input in u-major/component-major channel order (u, comp, v, cc):
    # every concat operand is either a pure reshape of a flat-wide plane or
    # a strided row-slice view of a plain tensor, so the 416-ch
    # materialization is one wide write (cell-major interleaving here
    # measured ~50 ms of 4K narrow-minor copies); enc1's weight rows are
    # permuted once to match (weight-exact). The t-scaled flow pieces are
    # scalar multiples of the plain endpoint-flow slices.
    Tparam = p["T_param"].astype(jnp.float32)
    results = []
    for k in range(T):
        tb = tbs[k]
        ft0P = tb * f01P              # per-t packed flows: scalar multiples
        ft1P = (1.0 - tb) * f10P      # of the per-pair plane fields
        comps = ((x0P, 3), (x1P, 3), (warped0P[k], 3), (warped1P[k], 3),
                 (ft0P, 2), (ft1P, 2), (fb0P[k], 2), (fb1P[k], 2),
                 (im0P[k], 3), (im1P[k], 3))
        refine_in = jnp.concatenate(
            [P[:, u].reshape(B, Hp4, Wp4, 4 * kk).astype(compute_dtype)
             for u in range(4) for P, kk in comps], -1)    # [B,Hp4,Wp4,416]
        out = refine_unet_s2d_core(p["refine"], refine_in,
                                   in_perm=_uorder_perm(
                                       tuple(kk for _, kk in comps)))
        out = out.astype(jnp.float32)                     # [B,Hp4,Wp4,96]

        tb5 = ts[k].reshape(B, 1, 1, 1, 1).astype(jnp.float32)
        outP = blend_planes_24(
            out, (warped0P[k], warped1P[k], im0P[k], im1P[k], x0P, x1P),
            tb5, Tparam)                                  # [B,4,Hp4,W·3]
        flow_refine = jnp.concatenate(
            [tb * flow_01, (1.0 - tb) * flow_10], -1)
        if planes_out:
            results.append((outP, flow_refine, None, None))
        else:
            out_full = jnp.stack(
                [interleave_planes(outP[b]) for b in range(B)], 0)
            results.append((out_full.reshape(B, H, W, 3), flow_refine,
                            None, None))
    return results


# ---------------------------------------------------------------------------
# top-level forward (DCTXVFInet.forward, fLDRnet.py:106-223)
# ---------------------------------------------------------------------------

def extract_features(params: Params, cfg: FLDRConfig,
                     pyramid: Sequence[jnp.ndarray], n_levels: int,
                     compute_dtype=jnp.float32) -> List[jnp.ndarray]:
    """Per-level PCA features + residual context conv (fLDRnet.py:133-163).

    With the papermodel's ExacOneEV+allImUp the scale-8 EV/Mean/meanVec are
    shared across all levels (fLDRnet.py:136,146).
    """
    feats = []
    for i in range(n_levels):
        pca = params["pca"]
        if not cfg.exac_one_ev:
            # per-scale EVs (pick_pca non-simpleEVs branch); extra test
            # scales beyond the trained set reuse the scale-8 params, like
            # the reference's moreTstSc param extension (main.py:393-399)
            key = f"s{cfg.scales[i]}"
            pca = params.get("pca_multi", {}).get(key, pca)
        f = block_pca_features(
            pyramid[i], pca["mean"], pca["ev"], pca["mean_vec"],
            wiS=cfg.wiS, compute_dtype=jnp.float32,
            per_item_minmax=getattr(cfg, "per_item_minmax", False),
        ).astype(compute_dtype)
        r = relu(conv2d(params["rec_ctx"]["conv0"], f))
        r = relu(conv2d(params["rec_ctx"]["conv1"], r))
        feats.append(r + f)
    return feats


def forward_flow(params: Params, cfg: FLDRConfig,
                 pyramid: Sequence[jnp.ndarray],
                 compute_dtype=jnp.float32) -> jnp.ndarray:
    """Coarse-to-fine flow estimation (levels S_tst..0). t-independent: the
    reference recomputes this per t-value (main.py:867 runs the full model
    for each of the multiple-1 targets); splitting it out lets ×8
    interpolation amortize features+flow across the 7 synthesis calls."""
    S = cfg.S_tst
    fast = getattr(cfg, "fast_warp", False)
    compute_dtype = _stage_dtype(cfg, "flow_dtype", compute_dtype)
    # One-launch fused feature warps were built twice and TPU-measured twice:
    # the u-plane form lost (flow 156→279 ms, plane interleaves serialize) and
    # the r4 plain-row strip form was exactly neutral (4.576 vs 4.577 fps) —
    # per-level chunked launches stay, the fused path was removed.
    with jax.named_scope("pca_features"):
        feats = extract_features(params, cfg, pyramid, S + 1, compute_dtype)
    vp = params["vfinet"]
    flow = None
    for level in range(S, 0, -1):
        with jax.named_scope(f"flow_level_{level}"):
            flow = level_flow(vp, feats[level], flow, fast=fast)
    with jax.named_scope("flow_level_0"):
        flow = level_flow(vp, feats[0], flow, fast=fast)
    return flow


def _packed_enabled(cfg: FLDRConfig) -> bool:
    return (getattr(cfg, "fast_warp", False)
            and getattr(cfg, "packed_synth", True))


_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def _stage_dtype(cfg: FLDRConfig, stage: str, default):
    """Per-stage compute dtype: cfg.flow_dtype / cfg.unet_dtype override
    the session compute_dtype (PARITY.md mixed-precision policy)."""
    name = getattr(cfg, stage, "") or ""
    return _DTYPES.get(name, default)


def flow_extras(params: Params, cfg: FLDRConfig, flow: jnp.ndarray,
                images: jnp.ndarray):
    """The remaining t-independent synthesis work: full-res flow upscales and
    the z importance metrics. Hoisted out of the per-t loop in multi-t mode.

    (The packed path's per-t u-plane views of the frames and endpoint
    flows are strided row-slice views of these plain tensors — nothing
    extra to precompute.)"""
    fast = getattr(cfg, "fast_warp", False)
    flow = flow.astype(jnp.float32)
    images = images.astype(jnp.float32)
    H, W = images.shape[2], images.shape[3]
    upscale = H // flow.shape[1]
    flow_10 = upscale * resize_2d(flow[..., 0:2], (H, W), "bilinear")
    flow_01 = upscale * resize_2d(flow[..., 2:4], (H, W), "bilinear")
    packed = _packed_enabled(cfg) and can_use_packed(flow, images)
    from ..ops import fastwarp as _fw
    import os as _os
    # Half-resolution z importance metrics (fLDRnet.py:439-446), fast path
    # DEFAULT since r5: two half-size backward gathers instead of two
    # full-4K ones (the z warps were the flow stage's biggest single item,
    # 92 ms/pair vs a ~45 ms floor), bilinearly upsampled back. z is a
    # soft occlusion weighting inside exp() — r5-measured: bench 4.809 vs
    # the 4.7-class baselines (R5C-2), goldenclip −0.0012 dB (44.1027 vs
    # 44.1039, R5C-3). FLDRX_Z_HALFRES=0 restores full-res z; the strict
    # path (fast_warp=False) never takes this.
    B_, H_, W_ = images.shape[0], H, W
    zhalf = (fast and packed
             and bool(int(_os.environ.get("FLDRX_Z_HALFRES", "1")))
             and H_ % 64 == 0 and W_ % 64 == 0)
    if zhalf:
        Hh, Wh = H_ // 2, W_ // 2
        imgs2 = resize_2d(images.reshape(B_ * 2, H_, W_, 3), (Hh, Wh),
                          "bilinear").reshape(B_, 2, Hh, Wh, 3)
        fl10h = (upscale / 2) * resize_2d(flow[..., 0:2], (Hh, Wh),
                                          "bilinear")
        fl01h = (upscale / 2) * resize_2d(flow[..., 2:4], (Hh, Wh),
                                          "bilinear")
        z0h, z1h = z_metrics(params["vfinet"], imgs2[:, 0], imgs2[:, 1],
                             fl10h, fl01h, fast, fused=True,
                             tiled_out=False)
        z0 = resize_2d(z0h, (H_, W_), "bilinear")
        z1 = resize_2d(z1h, (H_, W_), "bilinear")
    else:
        ztiled = packed and _fw.GTILE == _fw.TILE    # tiled z chain: the
        # gather's tile order must match the splat's vals tiling downstream
        z0, z1 = z_metrics(params["vfinet"], images[:, 0], images[:, 1],
                           flow_10, flow_01, fast, fused=packed,
                           tiled_out=ztiled)
    if packed:
        x0P, x1P = _planes_batch(images[:, 0]), _planes_batch(images[:, 1])
        f10P, f01P = _planes_batch(flow_10), _planes_batch(flow_01)
        return (flow_10, flow_01, z0, z1, x0P, x1P, f10P, f01P)
    return (flow_10, flow_01, z0, z1)


def forward_synthesis(params: Params, cfg: FLDRConfig, flow: jnp.ndarray,
                      images: jnp.ndarray, t: jnp.ndarray,
                      orig_hw: Optional[Tuple[int, int]] = None,
                      precomputed=None,
                      compute_dtype=jnp.float32,
                      planes_out=False) -> jnp.ndarray:
    """Level-0 synthesis for one t given precomputed flow (and optionally the
    t-independent extras from `flow_extras`).

    planes_out=True (packed path only — silently plain otherwise, callers
    detect by shape[-1] != 3) returns the u-plane form [B, 4, H/4, W·3];
    see synthesize_packed_multi."""
    fast = getattr(cfg, "fast_warp", False)
    # compute_dtype only affects the refine UNet inside synthesis — apply
    # the per-stage override here (PARITY.md mixed-precision policy)
    compute_dtype = _stage_dtype(cfg, "unet_dtype", compute_dtype)
    with jax.named_scope("synthesis"):
        if fast and _packed_enabled(cfg) and can_use_packed(flow, images):
            out, _, _, _ = synthesize_packed(
                params["vfinet"], flow, images, t, precomputed=precomputed,
                compute_dtype=compute_dtype, planes_out=planes_out)
        else:
            planes_out = False
            out, _, _, _ = synthesize(
                params["vfinet"], flow.astype(jnp.float32),
                images.astype(jnp.float32), t, fast=fast,
                precomputed=precomputed[:4] if precomputed else None,
                compute_dtype=compute_dtype)
    if orig_hw is not None:
        if planes_out:
            assert orig_hw[0] % 4 == 0
            out = out[:, :, :orig_hw[0] // 4, :orig_hw[1] * 3]
        else:
            out = out[:, :orig_hw[0], :orig_hw[1]]
    return out


def forward_synthesis_multi(params: Params, cfg: FLDRConfig,
                            flow: jnp.ndarray, images: jnp.ndarray, ts,
                            precomputed=None,
                            compute_dtype=jnp.float32,
                            planes_out=False) -> jnp.ndarray:
    """Level-0 synthesis for a chunk of t-values: cross-t fused warp
    launches via synthesize_packed_multi when the packed fast path is
    enabled, else a per-t loop (XLA still CSEs shared prologues).
    ts: sequence of [B, 1] t arrays. Returns [T, B, H, W, 3] — or, with
    planes_out=True on the packed path, [T, B, 4, H/4, W·3] (callers
    detect the u-plane form by shape[-1] != 3 and unpack host-side).

    (A cross-t launch-fusion variant — one 2T-problem launch per warp
    stage for the whole chunk — was TPU-measured twice and never won:
    4.23 vs 4.28 fps r3, 4.577 vs 4.577 r4 with kernel vals sharing; the
    pinned 2T-problem inputs cancel the ~7 ms/launch prologue saving. The
    per-t loop below is the measured default; XLA CSEs shared prologues.)"""
    return jnp.stack(
        [forward_synthesis(params, cfg, flow, images, t,
                           precomputed=precomputed,
                           compute_dtype=compute_dtype,
                           planes_out=planes_out) for t in ts], 0)


def forward_test(params: Params, cfg: FLDRConfig,
                 pyramid: Sequence[jnp.ndarray], t: jnp.ndarray,
                 orig_hw: Optional[Tuple[int, int]] = None,
                 compute_dtype=jnp.float32) -> jnp.ndarray:
    """Inference: coarse-to-fine flow on levels S_tst..1, synthesis at level 0.

    pyramid[i]: [B, 2, H_i, W_i, 3] (i = 0 finest); returns [B, H, W, 3]
    cropped to orig_hw (the reference crops to output_size_test,
    fLDRnet.py:222; we crop to the caller's pre-padding size).
    """
    flow = forward_flow(params, cfg, pyramid, compute_dtype)
    return forward_synthesis(params, cfg, flow, pyramid[0], t, orig_hw,
                             compute_dtype=compute_dtype)


def forward_train(params: Params, cfg: FLDRConfig,
                  pyramid: Sequence[jnp.ndarray], t: jnp.ndarray,
                  validation: bool = False,
                  compute_dtype=jnp.float32):
    """Training forward: synthesis at every level S_trn..0 (fLDRnet.py:171-207).

    Returns dict with out pyramid (fine→coarse), refined/unrefined flows,
    occ_0 at level 0, mean_pics, endflow list — mirroring the reference's
    6-tuple return.
    """
    S = cfg.S_trn
    fast = getattr(cfg, "fast_warp_train", False)
    feats = extract_features(params, cfg, pyramid, S + 1, compute_dtype)
    vp = params["vfinet"]

    crop = None
    if validation:
        crop = (cfg.validation_patch_size, cfg.validation_patch_size)

    outs, flow_refines, unrefined, endflows = [], [], [], []
    flow = None
    for level in range(S, -1, -1):
        flow = level_flow(vp, feats[level], flow, fast=fast)
        out, fr, occ0, endflow = synthesize(
            vp, flow.astype(jnp.float32), pyramid[level].astype(jnp.float32),
            t, crop_hw=crop, fast=fast)
        outs.append(out)
        flow_refines.append(fr)
        unrefined.append(flow)
        endflows.append(endflow)

    return {
        "out_pyramid": outs[::-1],          # fine → coarse
        "flow_refine_pyramid": flow_refines[::-1],
        "unrefined_flow_pyramid": unrefined[::-1],
        "occ_0": occ0,
        "mean_pics": jnp.mean(pyramid[0], axis=1),
        "endflow_pyramid": endflows[::-1],
    }


# ---------------------------------------------------------------------------
# initialisation (weights_init: xavier_normal_, zero bias — utils.py:113-119)
# ---------------------------------------------------------------------------

def _conv_init(key, kh, kw, cin, cout, dtype=jnp.float32) -> Params:
    fan_in = cin * kh * kw
    fan_out = cout * kh * kw
    std = float(np.sqrt(2.0 / (fan_in + fan_out)))
    w = jax.random.normal(key, (kh, kw, cin, cout), dtype) * std
    return {"w": w, "b": jnp.zeros((cout,), dtype)}


def init_params(key, cfg: FLDRConfig, dtype=jnp.float32) -> Params:
    """Fresh parameters matching the reference architecture/shapes.

    PCA params start as placeholders (the reference fills them from the
    first-batch PCA fit, main.py:556-557 / fLDRnet.py:225-278)."""
    nf = cfg.nf                      # 48
    dnf = cfg.dctvfi_nf              # 16
    u = cfg.unet_nf                  # 16
    keys = iter(jax.random.split(key, 32))

    flow_bottom = [
        _conv_init(next(keys), 3, 3, 2 * nf, 2 * nf, dtype),
        _conv_init(next(keys), 3, 3, 2 * nf, 2 * nf, dtype),
        _conv_init(next(keys), 3, 3, 2 * nf, 2 * nf, dtype),
        _conv_init(next(keys), 3, 3, 2 * nf, nf, dtype),
        _conv_init(next(keys), 3, 3, nf, 6, dtype),     # tempbottomflowfix → 6
    ]
    conv_flow2 = [
        _conv_init(next(keys), 3, 3, 2 * nf + 4, 2 * nf, dtype),
        _conv_init(next(keys), 3, 3, 2 * nf, 2 * nf, dtype),
        _conv_init(next(keys), 3, 3, 2 * nf, nf, dtype),
        _conv_init(next(keys), 3, 3, nf, nf, dtype),
        _conv_init(next(keys), 3, 3, nf, 4, dtype),
    ]
    refine = {
        "enc1": _conv_init(next(keys), 4, 4, cfg.unet_in, u, dtype),
        "enc2": _conv_init(next(keys), 4, 4, u, 2 * u, dtype),
        "enc3": _conv_init(next(keys), 4, 4, 2 * u, 4 * u, dtype),
        "dec0": _conv_init(next(keys), 3, 3, 4 * u, 4 * u, dtype),
        "dec1": _conv_init(next(keys), 3, 3, 6 * u, 2 * u, dtype),
        "dec2": _conv_init(next(keys), 3, 3, 3 * u, u, dtype),
        "dec3": _conv_init(next(keys), 3, 3, u, cfg.unet_out, dtype),
    }
    def pca_placeholder():
        return {
            "mean": jnp.zeros((cfg.wiS ** 2,), dtype),
            "ev": jnp.eye(dnf, cfg.wiS ** 2, dtype=dtype),
            "mean_vec": jnp.ones((dnf,), dtype),
        }

    pca_extra = {}
    if not cfg.exac_one_ev:
        # per-scale PCA slots (filled by the first-batch fit or pick_pca);
        # pre-created so the optimizer state's treedef stays stable
        pca_extra["pca_multi"] = {
            f"s{s}": pca_placeholder() for s in cfg.scales[:4]}
    return {
        "pca": pca_placeholder(),
        **pca_extra,
        "rec_ctx": {
            "conv0": _conv_init(next(keys), 3, 3, dnf * 6, dnf * 6, dtype),
            "conv1": _conv_init(next(keys), 3, 3, dnf * 6, dnf * 6, dtype),
        },
        "vfinet": {
            "T_param": jnp.ones((1,), dtype),
            "z_alpha": jnp.ones((2,), dtype),
            "flow_bottom": flow_bottom,
            "conv_flow1": _conv_init(next(keys), 3, 3, 2 * nf, nf, dtype),
            "conv_flow2": conv_flow2,
            "refine": refine,
        },
    }
