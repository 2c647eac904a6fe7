"""Probe: u-plane splat kernel cost at 4K (PIPE_BF16 / geometry sweeps).

Run as: [FLDRX_PIPE_BF16=1] python -u /tmp/spprobe.py  (fresh process per
env config). Times splat_at(planes_out=True) with smooth spill-free flow.
"""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from fldrx.ops import fastwarp as fw

K = 8


def main():
    H, W, C = 2304, 4096, 4
    rng = np.random.RandomState(0)
    vals = jnp.asarray(rng.rand(H, W, C).astype(np.float32))
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    tx = jnp.asarray(xx + 12 * np.sin(yy / 300) + 7 * np.cos(xx / 500))
    ty = jnp.asarray(yy + 9 * np.cos(xx / 400) + 5 * np.sin(yy / 350))

    def chain(v):
        s = jnp.float32(0)
        for i in range(K):
            o = fw.splat_at(v + np.float32(i) * 1e-9, tx, ty,
                            planes_out=True)
            s = s + jnp.sum(o[:, ::97])
        return s

    f = jax.jit(chain)
    float(f(vals))
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        float(f(vals))
    ms = (time.perf_counter() - t0) / reps / K * 1e3
    print(f"PIPE_BF16={os.environ.get('FLDRX_PIPE_BF16', '0')} "
          f"WINX_S={os.environ.get('FLDRX_WINX_S', '128'):>4s} "
          f"OYR_S={os.environ.get('FLDRX_OYR_S', '96'):>4s} "
          f"per-splat: {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
