"""Public inference API — signature parity with run_on_your_images.py.

The reference documents `run_on_images(model_net, args, device, frames,
t_value, resfold, evalit)` (run_on_your_images.py:96-178) plus
`prepare_model()` (:54-73) and `load_trans_frames()` (:77-87). Here the same
surface is provided TPU-natively; `device` is dropped (JAX owns placement) but
accepted positionally for drop-in compatibility.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np

from .config import FLDRConfig, papermodel_test5
from .eval.pipeline import Interpolator
from .ops import metrics

DEFAULT_NPZ = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                           "checkpoints", "fldrnet_best.npz")


def prepare_model(ckpt_path: str = DEFAULT_NPZ,
                  cfg: Optional[FLDRConfig] = None):
    """Build the papermodel+test5scales engine from a converted checkpoint
    (reference prepare_model, run_on_your_images.py:54-73).

    Returns (interpolator, cfg, None) — the third slot mirrors the reference's
    `device` return for drop-in use.
    """
    import jax
    import jax.numpy as jnp

    from .tools.convert_ckpt import load_params_npz

    cfg = cfg or papermodel_test5()
    if not os.path.exists(ckpt_path):
        # auto-convert from the reference .pt if present
        from .tools.convert_ckpt import DEFAULT_SRC, convert
        if os.path.exists(DEFAULT_SRC):
            convert(DEFAULT_SRC, ckpt_path)
        else:
            raise FileNotFoundError(
                f"no checkpoint at {ckpt_path} and no reference .pt to convert")
    params, _, _ = load_params_npz(ckpt_path)
    params = jax.tree.map(jnp.asarray, params)
    return Interpolator(params, cfg), cfg, None


def load_trans_frames(im0_path: str, im1_path: str,
                      imt_path: Optional[str] = None) -> np.ndarray:
    """Load 2-3 images → [1, 2 or 3, H, W, 3] float32 in [-1,1], BGR channel
    order (the reference reads with cv2; we keep byte-identical channel order
    by flipping PIL's RGB)."""
    from PIL import Image

    paths = [im0_path, im1_path] + ([imt_path] if imt_path else [])
    arrs = []
    for p in paths:
        a = np.asarray(Image.open(p).convert("RGB"), np.float32)[..., ::-1]
        arrs.append(a / 255.0 * 2.0 - 1.0)
    return np.stack(arrs, 0)[None]


def run_on_images(model, cfg_or_args, device, frames, t_value,
                  resfold: Optional[str] = None, evalit: bool = True):
    """Interpolate one frame; signature parity with the reference
    (run_on_your_images.py:96-178).

    model:  Interpolator from prepare_model()
    frames: [B, C, T, H, W] torch-layout array (T=3: I0, I1, It/dummy) or
            [B, T, H, W, C] NHWC — detected by channel-dim position.
    t_value: [B,1] array-like in (0,1).
    Returns PSNR if evalit else 0; writes a PNG into resfold if given.
    """
    frames = np.asarray(frames, np.float32)
    if frames.shape[1] in (1, 3) and frames.ndim == 5 and frames.shape[2] in (2, 3):
        frames = np.transpose(frames, (0, 2, 3, 4, 1))   # BCTHW → BTHWC
    gt = frames[:, -1] if (evalit and frames.shape[1] == 3) else None
    inputs = frames[:, :2]

    t = np.asarray(t_value, np.float32).reshape(-1, 1)
    pred = model.interpolate_np(inputs, t)           # [B,H,W,3]

    out_img = np.around(metrics.denorm255(pred[0]))
    if resfold:
        from PIL import Image
        os.makedirs(resfold, exist_ok=True)
        # images are BGR (cv2 convention) — flip for PIL
        Image.fromarray(out_img[..., ::-1].astype(np.uint8)).save(
            os.path.join(resfold, f"{int(float(t[0]) * 8)}.png"))
    if evalit and gt is not None:
        target = metrics.denorm255(gt[0])
        return metrics.psnr(target, out_img)
    return 0
