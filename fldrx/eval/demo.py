"""Demo — the reference run_on_your_images.py main() equivalent: walk an
X_test-layout folder, interpolate 7 t-values per scene, report running PSNR
(run_on_your_images.py:24-51). Without a dataset, runs on synthetic frames.

Usage:
    python -m fldrx.eval.demo [X_test_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np

from ..api import load_trans_frames, prepare_model, run_on_images

T_VALUES = [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]


def run_folder(x_test_dir: str, out_dir: str = "GenFrames/temptest"):
    model, cfg, device = prepare_model()
    psnrs = []
    for type_dir in sorted(os.listdir(x_test_dir)):
        tpath = os.path.join(x_test_dir, type_dir)
        if not os.path.isdir(tpath):
            continue
        for scene in sorted(os.listdir(tpath)):
            spath = os.path.join(tpath, scene)
            imgs = sorted(os.listdir(spath), key=lambda x: int(x.split(".")[0]))
            for t_val in T_VALUES:
                frames = load_trans_frames(
                    os.path.join(spath, imgs[0]),
                    os.path.join(spath, imgs[-1]),
                    os.path.join(spath, imgs[int(t_val * 32)]))
                p = run_on_images(model, cfg, device, frames, [[t_val]],
                                  out_dir, evalit=True)
                psnrs.append(p)
                print(f"PSNR: {np.mean(psnrs):.4f}")
    return float(np.mean(psnrs)) if psnrs else 0.0


def run_synthetic(out_dir: str = "GenFrames/temptest"):
    """No-dataset demo: translating synthetic pattern."""
    model, cfg, device = prepare_model()
    H, W = 512, 768
    yy, xx = np.mgrid[0:H, 0:W]

    def img(sh):
        return np.stack([np.sin((xx + sh) / 23) + 0.3 * np.cos(yy / 17),
                         np.cos((xx + sh) / 31) * np.sin(yy / 13),
                         np.sin((xx + sh + yy) / 29)], -1).astype(
                             np.float32) * 0.5

    psnrs = []
    for t_val in (0.25, 0.5, 0.75):
        frames = np.stack([img(0), img(16), img(16 * t_val)], 0)[None]
        p = run_on_images(model, cfg, device, frames, [[t_val]], out_dir,
                          evalit=True)
        psnrs.append(p)
        print(f"t={t_val}: PSNR {p:.2f} dB")
    return float(np.mean(psnrs))


if __name__ == "__main__":
    if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]):
        run_folder(sys.argv[1], *(sys.argv[2:3] or ["GenFrames/temptest"]))
    else:
        print("no X_test dir given — running synthetic demo")
        run_synthetic()
