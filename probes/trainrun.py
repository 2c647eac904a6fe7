"""Hardware training evidence (VERDICT r4 item 8): a few-hundred-step TPU
training run through the REAL train() driver on a generated mini X-Train
dataset, logging the loss curve and steps/s, plus an on-hardware
save → resume → bitwise-continue check.

    python -u probes/trainrun.py [epochs] [resume_epochs]

Layout: 65 golden-clip frames (analytic scene, real PNG decode) rendered
once at 512x768 and symlinked into 64 sample dirs (XTrain's 65-frame clip
contract, reference main.py:444-781 + utils.py:122-199). batch 8 x 512^2
crops = the BASELINE config-5 geometry whose train step is the one
trainprobe timed (1.663 s/step) — and whose compiled program the XLA cache
already holds.

Three runs through train() (deterministic batches per (seed, epoch)):
  A: epochs [0, E)            — fresh init, writes ckpt
  B: epochs [E, E+R)          — continue_training=True from A's ckpt
  C: epochs [0, E+R)          — fresh init, one uninterrupted run
Bitwise check: params(B after E+R) == params(C after E+R).
"""
import os
import shutil
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PATCH = int(os.environ.get("FLDRX_TRAINRUN_PATCH", "512"))
H, W = PATCH, PATCH + 256
DATA = f"/tmp/fldrx_trainrun_xtrain_{H}x{W}"


def build_dataset():
    from PIL import Image

    from fldrx.eval.goldenclip import render_golden
    frames_dir = os.path.join(DATA, "_frames")
    if not os.path.exists(os.path.join(frames_dir, "0064.png")):
        os.makedirs(frames_dir, exist_ok=True)
        for i in range(65):
            img = render_golden(H, W, i / 64.0)
            u8 = np.clip(np.round((img + 1.0) * 127.5), 0, 255).astype(np.uint8)
            Image.fromarray(u8).save(os.path.join(frames_dir, f"{i:04d}.png"))
    # 64 sample dirs symlinking the same 65 frames → len(dataset)=64,
    # 8 steps/epoch at batch 8 (the reference layout: train/SCENE/SAMPLE/*.png)
    for s in range(8):
        for k in range(8):
            d = os.path.join(DATA, "train", f"{s:03d}", f"occ{k:03d}")
            if not os.path.isdir(d):
                os.makedirs(d)
                for i in range(65):
                    os.symlink(os.path.join(frames_dir, f"{i:04d}.png"),
                               os.path.join(d, f"{i:04d}.png"))


def run(tag, epochs, cont):
    import jax
    from fldrx.config import papermodel
    from fldrx.train.loop import train

    work = os.path.join(DATA, "work")
    cfg = papermodel().replace(
        epochs=epochs,
        patch_size=PATCH,
        x_train_data_path=os.path.join(DATA, "train"),
        checkpoint_dir=os.path.join(work, "ckpt"),
        text_dir=os.path.join(work, "text"),
        log_dir=os.path.join(work, "log"),
    )
    for d in (cfg.checkpoint_dir, cfg.text_dir, cfg.log_dir):
        os.makedirs(d, exist_ok=True)
    t0 = time.time()
    params, _ = train(cfg, continue_training=cont, seed=0,
                      no_validation=True, verbose=True)
    dt = time.time() - t0
    print(f"[{tag}] {epochs} epochs wall {dt:.1f}s", flush=True)
    return jax.tree.map(np.asarray, params)


def main():
    E = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    build_dataset()
    work = os.path.join(DATA, "work")
    shutil.rmtree(work, ignore_errors=True)

    run("A", E, cont=False)
    pB = run("B", E + R, cont=True)        # resumes at epoch E
    shutil.rmtree(work, ignore_errors=True)
    pC = run("C", E + R, cont=False)       # uninterrupted control

    import jax
    flatB, _ = jax.tree_util.tree_flatten_with_path(pB)
    flatC = jax.tree.leaves(pC)
    bad = []
    for (path, b), c in zip(flatB, flatC):
        if b.shape != c.shape or not np.array_equal(b, c):
            d = float(np.max(np.abs(b.astype(np.float64) - c.astype(np.float64))))
            bad.append((jax.tree_util.keystr(path), d))
    if bad:
        print(f"RESUME MISMATCH in {len(bad)} leaves (max|d| per leaf):")
        for k, d in bad[:10]:
            print(f"  {k}: {d:.3e}")
        sys.exit(1)
    print("resume bitwise-continue check: PASS "
          f"({len(flatC)} leaves identical after {E}+{R} vs {E + R} epochs)")


if __name__ == "__main__":
    main()
