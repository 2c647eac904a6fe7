"""Flow-stage probe: times `precompute_flow` (pyramid + PCA features +
coarse levels + full-res upscales + z metrics) at 4K under the current
measurement gates:

  - FLDRX_PCA_LAYOUT legacy/sumky (transpose-free PCA blocking)

(The WIDE_RESIZE / LEVEL_SPLAT gates this probe decided in R4F/R4H are
resolved: naive-einsum resize + exact coarse-level splat are now the only
paths — queue_results.log R4H-1..4.)

Each combo builds a fresh Interpolator (the compiled-fn cache is keyed on
shape only; env gates are read at trace time). Scalar-fetch fenced.

    python -u probes/flowprobe.py
"""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def natural_frames(H, W, shift=18):
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)

    def tex(px, py):
        return (np.sin((xx + px) / 17) * np.cos((yy + py) / 23)
                + 0.5 * np.sin((xx + py) / 5.3) * np.sin((yy + px) / 7.1)
                + 0.3 * np.sin((xx - px) / 61) * np.cos((yy + py) / 47))

    f0 = np.stack([tex(0, 0), tex(9, 4), tex(3, 11)], -1)
    f1 = np.stack([tex(shift + 4, shift - 5), tex(shift + 13, shift - 1),
                   tex(shift + 7, shift + 6)], -1)
    return np.stack([f0, f1], 0)[None].astype(np.float32) * 0.6


def main():
    import jax.numpy as jnp

    from fldrx.api import DEFAULT_NPZ, prepare_model
    from fldrx.config import papermodel_test5

    H, W = 2160, 4096
    frames = natural_frames(H, W)

    combos = [
        {"FLDRX_PCA_LAYOUT": "legacy"},
        {"FLDRX_PCA_LAYOUT": "sumky"},
        {"FLDRX_PCA_LAYOUT": "legacy"},   # ABAB control for relay drift
        {"FLDRX_PCA_LAYOUT": "sumky"},
    ]
    for env in combos:
        os.environ.update(env)
        cfg = papermodel_test5().replace(compute_dtype="bfloat16",
                                         flow_dtype="float32")
        interp, cfg, _ = prepare_model(DEFAULT_NPZ, cfg)
        fj = jnp.asarray(frames)

        def run():
            flow, padded, extras = interp.precompute_flow(fj)
            return float(jnp.sum(flow)) + float(jnp.sum(extras[2]))

        t0 = time.time()
        run()
        compile_s = time.time() - t0
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            run()
        ms = (time.perf_counter() - t0) / iters * 1e3
        tag = " ".join(f"{k.split('_', 1)[1]}={v}" for k, v in env.items())
        print(f"{tag}: {ms:7.1f} ms/pair flow (compile {compile_s:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
