"""Offline PCA diagnostics — the rebuild of the reference's analysis scripts
(pca_comp.py:133-869: reconstruction PSNR sweeps over block size / component
fraction, cross-image generalisation, checkpoint-EV reconstruction).

Usage:
    python -m fldrx.tools.pca_diagnostics [image.png ...]
Without arguments runs on synthetic images.
"""

from __future__ import annotations

import sys

import numpy as np

import jax.numpy as jnp

from ..ops.block_pca import (blocks_from_images, fit_block_pca, pca_inverse)
from ..ops.metrics import psnr


def reconstruction_psnr(img: np.ndarray, wiS: int, n_comp: int,
                        pca=None) -> float:
    """Fit (or reuse) a block-PCA and measure reconstruction PSNR on `img`
    ([H,W] float in [0,255]); reference reconstruction_test
    (pca_comp.py:680-770)."""
    H = img.shape[0] // wiS * wiS
    W = img.shape[1] // wiS * wiS
    img = img[:H, :W]
    st = pca or fit_block_pca(img[None], n_comp, wiS)
    blocks = np.asarray(blocks_from_images(jnp.asarray(img, jnp.float64), wiS))
    hb, wb = blocks.shape[0], blocks.shape[1]
    t = (blocks.reshape(-1, wiS * wiS) - st.mean) @ st.eigenvectors.T
    rec = np.asarray(pca_inverse(
        jnp.asarray(t.reshape(hb, wb, n_comp)), jnp.asarray(st.mean),
        jnp.asarray(st.eigenvectors), wiS=wiS))
    return psnr(img, rec, data_range=255.0), st


def sweep(images, block_sizes=(4, 8, 16), fractions=(1 / 2, 1 / 4, 1 / 8)):
    """Reconstruction PSNR over (block size, component fraction)
    (reconstruction_test_scales, pca_comp.py:773-839)."""
    rows = []
    for wiS in block_sizes:
        for frac in fractions:
            n_comp = max(1, int(wiS * wiS * frac))
            vals = [reconstruction_psnr(im, wiS, n_comp)[0] for im in images]
            rows.append((wiS, frac, n_comp, float(np.mean(vals))))
            print(f"wiS={wiS:2d} frac={frac:.3f} comps={n_comp:3d} "
                  f"PSNR={np.mean(vals):7.2f} dB")
    return rows


def cross_generalisation(images, wiS=8, n_comp=16):
    """Fit on image 0, reconstruct the others (test_on_dataset,
    pca_comp.py:616-676)."""
    _, st = reconstruction_psnr(images[0], wiS, n_comp)
    for i, im in enumerate(images[1:], 1):
        p, _ = reconstruction_psnr(im, wiS, n_comp, pca=st)
        print(f"image {i}: cross-PCA reconstruction {p:.2f} dB")


def checkpoint_ev_reconstruction(images, ckpt_npz=None, wiS=8):
    """Reconstruct images through the CHECKPOINT's learned EVs — the
    reference's scale-transfer reconstruction incl. loading trained EVs
    (reconstruction_test, pca_comp.py:680-770): how much image content the
    shipped learned basis retains vs a freshly fitted one."""
    from ..tools.convert_ckpt import load_params_npz

    if ckpt_npz is None:
        import os
        ckpt_npz = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), "checkpoints",
            "fldrnet_best.npz")
    params, _extras, _meta = load_params_npz(ckpt_npz)
    mean = np.asarray(params["pca"]["mean"], np.float64)
    ev = np.asarray(params["pca"]["ev"], np.float64)
    n_comp = ev.shape[0]
    out = []
    for i, img in enumerate(images):
        H = img.shape[0] // wiS * wiS
        W = img.shape[1] // wiS * wiS
        im = (np.asarray(img, np.float64)[:H, :W] / 255.0) * 2 - 1
        blocks = np.asarray(blocks_from_images(jnp.asarray(im), wiS))
        hb, wb = blocks.shape[0], blocks.shape[1]
        flat = blocks.reshape(-1, wiS * wiS) - mean
        t = flat @ ev.T
        # trained EVs drift from orthonormality (orthLoss is off in the
        # papermodel), so invert with the pseudo-inverse — this measures the
        # content retained by the learned SUBSPACE, which is what the
        # reference's diagnostic is after (pca_comp.py:680-770)
        rec_blocks = t @ np.linalg.pinv(ev.T) + mean
        rec = rec_blocks.reshape(hb, wb, wiS, wiS).transpose(0, 2, 1, 3)
        rec = rec.reshape(hb * wiS, wb * wiS)
        p = psnr((im + 1) * 127.5, (rec + 1) * 127.5, data_range=255.0)
        out.append(p)
        print(f"image {i}: checkpoint-EV reconstruction {p:.2f} dB")
    return out


def _load_or_synth(paths):
    if paths:
        from PIL import Image
        return [np.asarray(Image.open(p).convert("L"), np.float64)
                for p in paths]
    rng = np.random.RandomState(0)
    yy, xx = np.mgrid[0:512, 0:512]
    return [
        (np.sin(xx / 9.0 + k) * np.cos(yy / 13.0) * 100 + 128
         + rng.randn(512, 512) * 5) for k in range(3)
    ]


if __name__ == "__main__":
    images = _load_or_synth(sys.argv[1:])
    print("== reconstruction sweep ==")
    sweep(images)
    print("== cross-image generalisation (fit on image 0) ==")
    cross_generalisation(images)
    print("== checkpoint learned-EV reconstruction ==")
    try:
        checkpoint_ev_reconstruction(images)
    except FileNotFoundError:
        print("(converted checkpoint not found — run fldrx.tools.convert_ckpt)")
