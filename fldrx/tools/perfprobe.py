"""Per-op performance probe for the 4K synthesis hot path on real TPU.

Usage: python -m fldrx.tools.perfprobe  (expect minutes of compile first run;
run with `python -u` to stream output — stdout is block-buffered when piped).

Times, with a scalar-fetch fence (block_until_ready does not block under the
axon relay): individual warp kernels at 2304x4096, the s2d UNet, the blend,
flow precompute, and one full synthesize_at — on naturalistic moving content
with the real converted checkpoint. Per-jit-call overhead on this relay is
~3-5 ms; numbers below include it once each.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def _t(fn, *args, iters=5):
    f = jax.jit(fn)
    r = f(*args)
    jax.tree.map(lambda a: float(jnp.sum(a.astype(jnp.float32))), r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.tree.map(lambda a: float(jnp.sum(a.astype(jnp.float32))), r)
    return (time.perf_counter() - t0) / iters * 1e3


def natural_frames(H, W, shift=18):
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)

    def tex(px, py):
        return (np.sin((xx + px) / 17) * np.cos((yy + py) / 23)
                + 0.5 * np.sin((xx + px) / 5.3) * np.sin((yy + py) / 7.1))

    f0 = np.stack([tex(0, 0), tex(9, 4), tex(3, 11)], -1)
    f1 = np.stack([tex(shift, shift * .6), tex(9 + shift, 4 + shift * .6),
                   tex(3 + shift, 11 + shift * .6)], -1)
    return np.stack([f0, f1], 0)[None].astype(np.float32) * 0.6


def main():
    from fldrx.api import prepare_model, DEFAULT_NPZ
    from fldrx.config import papermodel_test5
    from fldrx.ops.fastwarp import bwarp_fast, softsplat_fast
    from fldrx.model.fldrnet import refine_unet_s2d

    cfg = papermodel_test5().replace(compute_dtype="bfloat16")
    interp, cfg, _ = prepare_model(DEFAULT_NPZ, cfg)
    params = interp.params
    H, W = 2304, 4096
    rng = np.random.RandomState(0)
    img3 = jnp.asarray((rng.rand(1, H, W, 3) * 2 - 1).astype(np.float32))
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    flow = jnp.asarray(np.stack([30 * np.sin(yy / 400),
                                 18 * np.cos(xx / 500)], -1)[None]
                       .astype(np.float32))
    z = jnp.asarray(rng.rand(1, H, W, 1).astype(np.float32))
    print(f"softsplat 3ch+z:   {_t(softsplat_fast, img3, flow, z):7.1f} ms",
          flush=True)
    print(f"bwarp 3ch:         {_t(bwarp_fast, img3, flow):7.1f} ms",
          flush=True)
    x26 = jnp.asarray(rng.rand(1, H, W, 26).astype(np.float32))
    rp = params["vfinet"]["refine"]
    print(f"s2d UNet bf16:     "
          f"{_t(lambda a: refine_unet_s2d(rp, a.astype(jnp.bfloat16)), x26):7.1f} ms",
          flush=True)

    frames = jnp.asarray(natural_frames(2160, 4096))
    fl, padded, extras = interp.precompute_flow(frames)
    float(jnp.sum(fl))
    t0 = time.perf_counter()
    for _ in range(3):
        fl, padded, extras = interp.precompute_flow(frames)
    float(jnp.sum(fl))
    print(f"flow precompute:   {(time.perf_counter()-t0)/3*1e3:7.1f} ms",
          flush=True)
    out = interp.synthesize_at(fl, padded, [[0.5]], (2160, 4096), extras)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(3):
        out = interp.synthesize_at(fl, padded, [[0.5]], (2160, 4096), extras)
    float(jnp.sum(out))
    print(f"synthesize_at:     {(time.perf_counter()-t0)/3*1e3:7.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
