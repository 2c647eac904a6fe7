"""Probe: conv3x3_pixrows at the refine UNet's two big shapes.

Run as: python -u probes/convprobe.py. (The rows-per-grid-step block
height is frozen at 8 in ops/fastconv.py — the r4 sweep showed BH >= 16
exceeds the 128 MB VMEM budget at 4K.)
"""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from fldrx.ops.fastconv import conv3x3_pixrows

REPS = 3
CHAIN = 6


def probe(name, H, W, Cin, K):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, H, W, Cin).astype(np.float32)).astype(
        jnp.bfloat16)
    w = jnp.asarray((rng.rand(3, 3, Cin, K) * 0.1).astype(np.float32))
    b = jnp.zeros((K,), jnp.float32)
    w2 = jnp.asarray((rng.rand(3, 3, K, Cin) * 0.1).astype(np.float32))
    b2 = jnp.zeros((Cin,), jnp.float32)

    def chain(x):
        out = x
        for _ in range(CHAIN):
            y = conv3x3_pixrows(out, w, b)            # Cin -> K
            out = conv3x3_pixrows(y, w2, b2)          # K -> Cin (re-chain)
        return jnp.sum(out.astype(jnp.float32))

    f = jax.jit(chain)
    float(f(x))
    t0 = time.perf_counter()
    for _ in range(REPS):
        float(f(x))
    ms = (time.perf_counter() - t0) / REPS / CHAIN * 1e3
    gmac = (H * W * Cin * K * 9 + H * W * K * Cin * 9) / 1e9
    print(f"{name:>6s} "
          f"[{H}x{W}] {Cin}->{K}->{Cin}: {ms:7.2f} ms/pairconv "
          f"({gmac / max(ms, 1e-9) * 1e3 * 2:6.0f} GFLOP/s)", flush=True)


def main():
    # The r5 matrix (queue_results.log R5C-0b/0c) resolved the kernel's
    # decision space: lane-concat ky contraction + align=16 + in-kernel kx
    # shifts won every cell (enc1 16.56 / dec3 11.89 / enc3 4.74 ms) and is
    # now the only form; the KX=xla epilogue (26-27 ms enc1, remote-compiler
    # crash on ky-enc1) and the per-ky add form (17.61 enc1) were deleted.
    # This probe now times the production kernel, with FLDRX_CONV_ALIGN as
    # the remaining override.
    for align in ("16", "8"):
        os.environ["FLDRX_CONV_ALIGN"] = align
        print(f"--- FLDRX_CONV_ALIGN={align}", flush=True)
        for args in (("enc1", 576, 1024, 416, 64),  # quarter grid
                     ("dec3", 576, 1024, 256, 96),  # output head
                     ("enc3", 288, 512, 128, 64)):  # eighth grid
            # a failing cell must not kill the rest of the matrix
            try:
                probe(*args)
            except Exception as e:
                print(f"{args[0]:>6s} FAILED: "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
