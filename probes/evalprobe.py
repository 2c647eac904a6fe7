"""Dataset-eval throughput A/B: FLDRX_EVAL_DEFER off vs on (pair overlap).

RESOLVED r5 (R5A-6): 0.692 vs 0.695 frames/s — neutral; the knob was
removed from the evaluator (async dispatch already keeps the device busy).
This probe now measures two identical configs and is kept only as the
measurement record's venue.

The headline bench (bench.py) reuses one device-resident frame pair, so it
cannot see the per-pair HOST gap the real evaluator pays: fetching pair N's
metrics blocks the host, and only then does it stage pair N+1's frames
(H2D of ~110 MB uint8 over the relay) and dispatch its flow+synthesis.
FLDRX_EVAL_DEFER=1 holds pair N's fetch until pair N+1 is DISPATCHED, so
the device queue never drains while the host works (VERDICT r3 item 3).

This probe measures `evaluate()` wall-clock on a generated 4K X-Test-layout
mini dataset (golden-clip frames, real PNG decode + H2D on every pair):

    python -u probes/evalprobe.py [n_scenes]

Writes the dataset once to /tmp/fldrx_evalprobe_xtest (33 rendered 4K
frames, symlinked into per-scene dirs so each scene decodes separately) and
reports frames/sec + PSNR for defer=0/1. PSNR must not change (the fetch
order does not touch the math).
"""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

H = int(os.environ.get("FLDRX_EVALPROBE_H", "2160"))
W = int(os.environ.get("FLDRX_EVALPROBE_W", "4096"))
DATA = f"/tmp/fldrx_evalprobe_xtest_{H}x{W}"


def build_dataset(n_scenes: int) -> None:
    from PIL import Image

    from fldrx.eval.goldenclip import render_golden
    frames_dir = os.path.join(DATA, "_frames")
    os.makedirs(frames_dir, exist_ok=True)
    for i in range(33):
        p = os.path.join(frames_dir, f"{i:04d}.png")
        if os.path.exists(p):
            continue
        t0 = time.time()
        img = render_golden(H, W, i / 32.0)
        u8 = np.clip((img + 1) * 127.5, 0, 255).astype(np.uint8)
        Image.fromarray(u8).save(p)
        print(f"  rendered frame {i:02d} ({time.time() - t0:.1f}s)",
              flush=True)
    for s in range(n_scenes):
        d = os.path.join(DATA, "Type1", f"TEST{s:02d}")
        os.makedirs(d, exist_ok=True)
        for i in range(33):
            dst = os.path.join(d, f"{i:04d}.png")
            if not os.path.exists(dst):
                os.symlink(os.path.join(frames_dir, f"{i:04d}.png"), dst)


def main():
    n_scenes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    print(f"building {n_scenes}-scene 4K X-Test layout at {DATA}", flush=True)
    build_dataset(n_scenes)

    from fldrx.api import DEFAULT_NPZ, prepare_model
    from fldrx.config import apply_test_scales, papermodel
    from fldrx.eval.evaluator import evaluate

    n_scales = 5 if min(H, W) >= 1024 else 3   # small smoke sizes: 3 scales
    cfg = apply_test_scales(papermodel(), n_scales).replace(
        compute_dtype="bfloat16", flow_dtype="float32",
        x_test_data_path=DATA)
    interp, cfg, _ = prepare_model(DEFAULT_NPZ, cfg)

    results = {}
    for defer in ("0", "1", "0", "1"):        # ABAB: relay drift visibility
        os.environ["FLDRX_EVAL_DEFER"] = defer
        t0 = time.time()
        r = evaluate(interp, cfg, "X4K1000FPS", verbose=False)
        dt = time.time() - t0
        fps = r.n_samples / dt
        results.setdefault(defer, []).append(fps)
        print(f"defer={defer}: {dt:.1f}s wall, {fps:.3f} frames/s "
              f"(n={r.n_samples}, PSNR {r.psnr:.3f}, "
              f"pred_avg {r.pred_time_avg * 1000:.0f} ms)", flush=True)
    for k, v in sorted(results.items()):
        print(f"defer={k} steady (last run): {v[-1]:.3f} frames/s", flush=True)


if __name__ == "__main__":
    main()
