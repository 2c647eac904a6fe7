"""Probe: gather kernel cost vs WINY_G (MXU contraction-quantum test).

Run as: FLDRX_WINY_G=128 python -u /tmp/wprobe.py   (fresh process per value;
WINY_G is read at fastwarp import). Times a chained 4K C=4 gather_at with
smooth spill-free coords.
"""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from fldrx.ops.fastwarp import gather_at

K = 10


def main():
    H, W, C = 2304, 4096, 3
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(H, W, C).astype(np.float32))
    # smooth flow field, moderate magnitude (spill-free)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    sx = jnp.asarray(xx + 12 * np.sin(yy / 300) + 7 * np.cos(xx / 500))
    sy = jnp.asarray(yy + 9 * np.cos(xx / 400) + 5 * np.sin(yy / 350))

    def chain(img):
        out = img
        for i in range(K):
            out = gather_at(out, sx, sy) + np.float32(i) * 1e-9
        return jnp.sum(out)

    f = jax.jit(chain)
    float(f(img))
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        float(f(img))
    ms = (time.perf_counter() - t0) / reps / K * 1e3
    print(f"WINY_G={os.environ.get('FLDRX_WINY_G', '128'):>4s} "
          f"WINX_G={os.environ.get('FLDRX_WINX_G', '128'):>4s} "
          f"GTILE={os.environ.get('FLDRX_GTILE', '32'):>3s} "
          f"per-gather: {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
