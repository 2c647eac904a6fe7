"""PWC-Net optical flow — TPU-native functional JAX implementation.

Parity target: /root/reference/OpticalFlow/PWCNet.py (the QVI variant used as
the dormant distillation teacher, wired through useful.py:105-144). In the
shipped fLDRnet the teacher is disabled (fLDRnet.py:56 sets mypwc=None) and
its checkpoint blob is absent from the mirror (.MISSING_LARGE_BLOBS), but the
component is part of the inventory (SURVEY.md §2.3) and the north star names
its correlation cost volume explicitly — so it ships here as a first-class
model with the Pallas cost-volume kernel on TPU and the XLA unroll
elsewhere (fldrx/ops/correlation.py).

Architecture: 6-level conv Extractor, per-level Decoder (cost volume over
backward-warped features + dense-concat conv stack + learned up-flow/up-feat
deconvs), dilated context Refiner, ×20 flow scaling with pre/post bilinear
resize to 64-divisible sizes.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.correlation import correlation_auto
from ..ops.resize import resize_2d

Params = Dict[str, Any]

_MEAN = np.array([0.429, 0.431, 0.397], np.float32)
_LEVEL_CHANNELS = (16, 32, 64, 96, 128, 196)
_DECODER_IN = {2: 81 + 32 + 2 + 2, 3: 81 + 64 + 2 + 2, 4: 81 + 96 + 2 + 2,
               5: 81 + 128 + 2 + 2, 6: 81}
_DBL_BACKWARD = {5: 0.625, 4: 1.25, 3: 2.5, 2: 5.0}


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.1)


def _conv(p, x, stride=1, pad=1, dilation=1):
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride),
        [(pad, pad), (pad, pad)], rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec)
    return y + p["b"].astype(x.dtype)


def _deconv4x4s2(p, x):
    """ConvTranspose2d(k=4, s=2, p=1) — output 2x spatial.

    Expressed as the canonical input-dilated conv: dilate x by 2, pad by
    k-1-p = 2, regular conv. `p["w"]` must already be the spatially-flipped
    HWIO kernel (done once at init/convert time — see `deconv_weight_from_torch`).
    """
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(1, 1),
        padding=[(2, 2), (2, 2)], lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec)
    return y + p["b"].astype(x.dtype)


def deconv_weight_from_torch(w_t: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight [in, out, kh, kw] → flipped HWIO kernel
    for `_deconv4x4s2`: the equivalent dilated forward conv consumes in_ct
    channels and emits out_ct, so HWIO = flip(w)ᵀ(kh, kw, in, out)."""
    return np.ascontiguousarray(
        np.flip(w_t, (2, 3)).transpose(2, 3, 0, 1))


def extractor(p: Params, x: jnp.ndarray) -> List[jnp.ndarray]:
    feats = []
    for lv in range(6):
        blk = p[f"level{lv}"]
        x = _lrelu(_conv(blk[0], x, stride=2))
        x = _lrelu(_conv(blk[1], x))
        x = _lrelu(_conv(blk[2], x))
        feats.append(x)
    return feats


def _backward_warp_pwc(x: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """PWC Decoder.Backward (PWCNet.py:146-177): grid_sample on a [-1,1]
    linspace grid + flow/(S-1)/2 normalisation, strict mask (>0.999)."""
    from ..ops.warp import grid_sample_bilinear

    B, H, W, C = x.shape
    # normalised grid g + 2*flow/(S-1); grid_sample unnorm: ((g+1)*S-1)/2
    xs = jnp.linspace(-1.0, 1.0, W, dtype=flow.dtype)
    ys = jnp.linspace(-1.0, 1.0, H, dtype=flow.dtype)
    gx = xs[None, None, :] + flow[..., 0] / ((W - 1.0) / 2.0)
    gy = ys[None, :, None] + flow[..., 1] / ((H - 1.0) / 2.0)
    px = ((gx + 1.0) * W - 1.0) / 2.0
    py = ((gy + 1.0) * H - 1.0) / 2.0
    out, ones = grid_sample_bilinear(x, px, py, with_ones_mask=True)
    mask = (ones > 0.999).astype(x.dtype)
    return out * mask


def decoder(p: Params, level: int, feat1: jnp.ndarray, feat2: jnp.ndarray,
            previous: Optional[Dict[str, jnp.ndarray]]):
    if previous is None:
        vol = _lrelu(correlation_auto(feat1, feat2))
        feat = vol
        flow_in = None
    else:
        flow_in = _deconv4x4s2(p["upflow"], previous["flow"])
        upfeat = _deconv4x4s2(p["upfeat"], previous["feat"])
        warped = _backward_warp_pwc(feat2, flow_in * _DBL_BACKWARD[level])
        vol = _lrelu(correlation_auto(feat1, warped))
        feat = jnp.concatenate([vol, feat1, flow_in, upfeat], -1)
    for name in ("one", "two", "thr", "fou", "fiv"):
        feat = jnp.concatenate([_lrelu(_conv(p[name], feat)), feat], -1)
    flow = _conv(p["six"], feat)
    return {"flow": flow, "feat": feat}


def refiner(p: Params, feat: jnp.ndarray) -> jnp.ndarray:
    dil = (1, 2, 4, 8, 16, 1, 1)
    x = feat
    for i, d in enumerate(dil[:-1]):
        x = _lrelu(_conv(p[i], x, pad=d, dilation=d))
    return _conv(p[6], x, pad=1, dilation=1)


def pwc_forward(params: Params, im1: jnp.ndarray, im2: jnp.ndarray) -> jnp.ndarray:
    """Full PWCNet.forward (PWCNet.py:266-301): returns flow [B,H,W,2] in
    pixels at input resolution. im1/im2: [B,H,W,3] RGB in [0,1]."""
    B, H, W, _ = im1.shape
    mean = jnp.asarray(_MEAN, im1.dtype)
    im1 = im1 - mean
    im2 = im2 - mean
    ph = int(np.ceil(H / 64.0) * 64)
    pw = int(np.ceil(W / 64.0) * 64)
    if (ph, pw) != (H, W):
        im1 = resize_2d(im1, (ph, pw), "bilinear")
        im2 = resize_2d(im2, (ph, pw), "bilinear")

    f1 = extractor(params["extractor"], im1)
    f2 = extractor(params["extractor"], im2)
    est = decoder(params["dec6"], 6, f1[-1], f2[-1], None)
    est = decoder(params["dec5"], 5, f1[-2], f2[-2], est)
    est = decoder(params["dec4"], 4, f1[-3], f2[-3], est)
    est = decoder(params["dec3"], 3, f1[-4], f2[-4], est)
    est = decoder(params["dec2"], 2, f1[-5], f2[-5], est)
    flow = est["flow"] + refiner(params["refiner"], est["feat"])

    flow = 20.0 * resize_2d(flow, (H, W), "bilinear")
    sx = W / pw
    sy = H / ph
    return flow * jnp.asarray([sx, sy], flow.dtype)


def get_bidirectional_flow(params: Params, im0: jnp.ndarray,
                           im1: jnp.ndarray) -> jnp.ndarray:
    """MyPWC.get_flow equivalent (useful.py:112-117): returns [B,H,W,4] =
    (flow_10, flow_01)."""
    flow01 = pwc_forward(params, im0, im1)
    flow10 = pwc_forward(params, im1, im0)
    return jnp.concatenate([flow10, flow01], -1)


# ---------------------------------------------------------------------------
# init + torch-checkpoint conversion
# ---------------------------------------------------------------------------

def _conv_init(key, kh, kw, cin, cout, dtype=jnp.float32):
    fan_in = cin * kh * kw
    w = jax.random.normal(key, (kh, kw, cin, cout), dtype) / np.sqrt(fan_in)
    return {"w": w, "b": jnp.zeros((cout,), dtype)}


def init_pwc_params(key, dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 128))
    p: Params = {"extractor": {}}
    cin = 3
    for lv, cout in enumerate(_LEVEL_CHANNELS):
        p["extractor"][f"level{lv}"] = [
            _conv_init(next(keys), 3, 3, cin, cout, dtype),
            _conv_init(next(keys), 3, 3, cout, cout, dtype),
            _conv_init(next(keys), 3, 3, cout, cout, dtype),
        ]
        cin = cout
    for level in (2, 3, 4, 5, 6):
        cur = _DECODER_IN[level]
        d: Params = {}
        if level < 6:
            prev = _DECODER_IN[level + 1]
            d["upflow"] = _conv_init(next(keys), 4, 4, 2, 2, dtype)
            d["upfeat"] = _conv_init(next(keys), 4, 4,
                                     prev + 128 + 128 + 96 + 64 + 32, 2, dtype)
        widths = [(cur, 128), (cur + 128, 128), (cur + 256, 96),
                  (cur + 352, 64), (cur + 416, 32), (cur + 448, 2)]
        for name, (ci, co) in zip(("one", "two", "thr", "fou", "fiv", "six"),
                                  widths):
            d[name] = _conv_init(next(keys), 3, 3, ci, co, dtype)
        p[f"dec{level}"] = d
    rin = 81 + 32 + 2 + 2 + 128 + 128 + 96 + 64 + 32
    rw = [(rin, 128), (128, 128), (128, 128), (128, 96), (96, 64), (64, 32),
          (32, 2)]
    p["refiner"] = [_conv_init(next(keys), 3, 3, ci, co, dtype)
                    for ci, co in rw]
    return p


def convert_pwc_checkpoint(path: str, dtype=np.float32) -> Params:
    """Convert the torch pwc-checkpoint.pt (if available) to the fldrx pytree.
    Key map: module{One..Six} extractor blocks, module{Two..Six} decoders,
    moduleRefiner.moduleMain. Note the blob is absent from the repo mirror."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() for k, v in sd.items()}

    def cv(name):
        w = sd[f"{name}.weight"].astype(dtype)
        return {"w": np.transpose(w, (2, 3, 1, 0)),
                "b": sd[f"{name}.bias"].astype(dtype)}

    p: Params = {"extractor": {}}
    names = ("One", "Two", "Thr", "Fou", "Fiv", "Six")
    for lv, nm in enumerate(names):
        p["extractor"][f"level{lv}"] = [
            cv(f"moduleExtractor.module{nm}.{i}") for i in (0, 2, 4)]
    declevels = {"Two": 2, "Thr": 3, "Fou": 4, "Fiv": 5, "Six": 6}
    for nm, level in declevels.items():
        d: Params = {}
        base = f"module{nm}"
        if level < 6:
            d["upflow"] = {
                "w": deconv_weight_from_torch(
                    sd[f"{base}.moduleUpflow.weight"].astype(dtype)),
                "b": sd[f"{base}.moduleUpflow.bias"].astype(dtype)}
            d["upfeat"] = {
                "w": deconv_weight_from_torch(
                    sd[f"{base}.moduleUpfeat.weight"].astype(dtype)),
                "b": sd[f"{base}.moduleUpfeat.bias"].astype(dtype)}
        for sub in ("One", "Two", "Thr", "Fou", "Fiv"):
            d[sub.lower()[:3]] = cv(f"{base}.module{sub}.0")
        d["six"] = cv(f"{base}.moduleSix.0")
        p[f"dec{level}"] = d
    p["refiner"] = [cv(f"moduleRefiner.moduleMain.{i}")
                    for i in (0, 2, 4, 6, 8, 10, 12)]
    return p
