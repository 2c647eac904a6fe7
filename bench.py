#!/usr/bin/env python
"""fldrx benchmark: interpolated 4K frames/sec/chip with the papermodel
test5scales pipeline (the reference's headline eval config).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline (BASELINE.json): 30 interpolated 4K frames/sec/chip on TPU v5p.
Uses synthetic 4K frames (2160x4096 padded to 2304x4096) so no dataset is
required; one warm-up compile + timed steady-state iterations.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_FPS = 30.0


def main():
    import jax
    import jax.numpy as jnp

    from fldrx.api import prepare_model, DEFAULT_NPZ
    from fldrx.config import papermodel_test5

    dtype = os.environ.get("FLDRX_BENCH_DTYPE", "bfloat16")
    cfg = papermodel_test5().replace(compute_dtype=dtype)
    try:
        interp, cfg, _ = prepare_model(DEFAULT_NPZ, cfg)
    except FileNotFoundError:
        # no checkpoint available: bench with random weights (same FLOPs)
        from fldrx.eval.pipeline import Interpolator
        from fldrx.model.fldrnet import init_params
        params = init_params(jax.random.PRNGKey(0), cfg)
        interp = Interpolator(params, cfg)

    H, W = 2160, 4096
    rng = np.random.RandomState(0)
    frames = (rng.rand(1, 2, H, W, 3) * 2 - 1).astype(np.float32)
    t = np.full((1, 1), 0.5, np.float32)

    frames_j = jnp.asarray(frames)
    t_j = jnp.asarray(t)

    # warm-up / compile
    out = interp(frames_j, t_j)
    jax.block_until_ready(out)

    iters = int(os.environ.get("FLDRX_BENCH_ITERS", "8"))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = interp(frames_j, t_j)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    fps = iters / dt
    print(json.dumps({
        "metric": "4K interpolated frames/sec/chip (papermodel test5scales)",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
    }))


if __name__ == "__main__":
    main()
