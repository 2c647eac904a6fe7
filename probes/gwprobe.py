"""Probe: gather kernel tile-window vs group-window DMA mode at 4K.

Run as: FLDRX_GWIN=tile|group python -u /tmp/gwprobe.py  (fresh process per
mode; _GWIN is read at fastwarp import). Times a chained 4K C=4 gather_at
with smooth spill-free coords, plus a large-uniform-pan case (group-origin
adaptivity check) and prints the spill count for each.
"""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from fldrx.ops import fastwarp as fw

K = 10


def run(name, sx, sy, img):
    H, W, C = img.shape

    def chain(img):
        out = img
        for i in range(K):
            out = fw.gather_at(out, sx, sy) + np.float32(i) * 1e-9
        return jnp.sum(out)

    f = jax.jit(chain)
    float(f(img))
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        float(f(img))
    ms = (time.perf_counter() - t0) / reps / K * 1e3
    # spill count through the active origin mode
    sx_t = fw._tile_flatten(sx, H, W, tile=fw.GTILE)
    sy_t = fw._tile_flatten(sy, H, W, tile=fw.GTILE)
    cp, winx, qx = fw._win_geom(4)
    Kk = fw._pick_k(W // fw.GTILE)
    _, oy, ox = fw._gather_origins(sx_t, sy_t, H, W, fw.WINY_G, winx, qx,
                                   fw.WINY_G, winx, Kk, fw.GTILE)
    ok = fw._ok_mask(sx_t, sy_t, oy, ox, fw.WINY_G, winx)
    bad = int(jnp.sum(~jnp.all(ok, axis=1)))
    print(f"GWIN={os.environ.get('FLDRX_GWIN', 'tile'):>5s} "
          f"GTILE={fw.GTILE:>3d} {name:>8s} per-gather: {ms:7.2f} ms "
          f"spilled_tiles={bad}", flush=True)


def main():
    H, W, C = 2304, 4096, 3
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(H, W, C).astype(np.float32))
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    # smooth moderate flow (spill-free in both modes)
    sx = jnp.asarray(xx + 12 * np.sin(yy / 300) + 7 * np.cos(xx / 500))
    sy = jnp.asarray(yy + 9 * np.cos(xx / 400) + 5 * np.sin(yy / 350))
    run("smooth", sx, sy, img)
    # large uniform pan (tests group-origin adaptivity: should stay 0 spills)
    run("pan300", jnp.asarray(xx + 300.0), jnp.asarray(yy - 40.0), img)
    # shear: flow varies 0..160px across the width (group-mean origins lose
    # reach on variation WITHIN each 256px group => a few spilled tiles ok)
    run("shear", jnp.asarray(xx + 160.0 * xx / W), jnp.asarray(yy), img)


if __name__ == "__main__":
    main()
