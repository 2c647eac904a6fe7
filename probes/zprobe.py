"""Probe: in-kernel z-metric reduction (FLDRX_ZKERNEL) vs the XLA chain.

Times the per-pair z stage (two bwarp-masked frame warps reduced to
Σ_c|self−out·m|) both ways at 4K: use_kernel=False replays the current
tiled_out chain (gather kernel → [nt, N, C] HBM → XLA mask/diff/abs/sum);
use_kernel=True fuses mask+reduction into the gather kernel (the warped
frame never reaches HBM). The kernel math is identical, so the delta is
pure epilogue/output-traffic — adopt by flipping FLDRX_ZKERNEL=1 as a bench
env (z values differ from the XLA chain only in z_alpha/mean rounding
order; golden-clip gate before a default flip). Composes with FLDRX_GWIN /
FLDRX_PIPE_BF16 (fresh process per combination).
"""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from fldrx.ops import fastwarp as fw

REPS = 5


def run(name, flow, img0, img1):
    H, W, C = img0.shape

    def z_pair(use_kernel, i0, i1, fl):
        sx1, sy1 = fw._sample_coords(fl, H, W)
        sx0, sy0 = fw._sample_coords(-fl, H, W)
        zs = fw.gather_z_multi([i0, i1],
                               [(1, sx1, sy1, i0), (0, sx0, sy0, i1)],
                               use_kernel=use_kernel)
        return jnp.float32(0.37) * zs[0] / C, jnp.float32(0.41) * zs[1] / C

    for use_kernel in (False, True):
        f = jax.jit(lambda i0, i1, fl: jnp.sum(z_pair(use_kernel, i0, i1,
                                                      fl)[0])
                    + jnp.sum(z_pair(use_kernel, i0, i1, fl)[1]))
        float(f(img0, img1, flow))
        t0 = time.perf_counter()
        for _ in range(REPS):
            float(f(img0, img1, flow))
        ms = (time.perf_counter() - t0) / REPS * 1e3
        print(f"ZKERNEL={int(use_kernel)} GWIN="
              f"{os.environ.get('FLDRX_GWIN', 'tile'):>5s} PIPE_BF16="
              f"{os.environ.get('FLDRX_PIPE_BF16', '0')} {name:>8s} "
              f"z-stage/pair: {ms:7.2f} ms", flush=True)
    # value check at bench content (should be ~ulp apart)
    a = z_pair(False, img0, img1, flow)
    b = z_pair(True, img0, img1, flow)
    d = max(float(jnp.max(jnp.abs(a[0] - b[0]))),
            float(jnp.max(jnp.abs(a[1] - b[1]))))
    print(f"  max |z_xla − z_kernel| = {d:.3e}", flush=True)


def main():
    H, W, C = 2304, 4096, 3
    rng = np.random.RandomState(0)
    img0 = jnp.asarray(rng.rand(H, W, C).astype(np.float32))
    img1 = jnp.asarray(rng.rand(H, W, C).astype(np.float32))
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    smooth = np.stack([12 * np.sin(yy / 300) + 7 * np.cos(xx / 500),
                       9 * np.cos(xx / 400) + 5 * np.sin(yy / 350)], -1)
    run("smooth", jnp.asarray(smooth), img0, img1)
    shear = np.stack([160.0 * xx / W, np.zeros_like(yy)], -1)
    run("shear", jnp.asarray(shear), img0, img1)


if __name__ == "__main__":
    main()
