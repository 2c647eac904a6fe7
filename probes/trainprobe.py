"""Train-step throughput on the real chip (VERDICT r3 weak #6: the
2.16 s/step figure in config.py was measured in round 2 and never refreshed
after the r3/r4 kernel work).

    python -u probes/trainprobe.py [batch] [size]

Times the jitted single-chip train step (batch 8, 512² crops — BASELINE
config 5's geometry, reference main.py:444-781) with the deploy train
config: reports cold-compile seconds and steady steps/sec. Scalar-fetch
fenced (block_until_ready does not block under the axon relay).
"""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    import jax
    import jax.numpy as jnp

    from fldrx.config import papermodel
    from fldrx.model.fldrnet import init_params
    from fldrx.train.trainer import TrainState, make_train_step

    cfg = papermodel()
    params = init_params(jax.random.PRNGKey(0), cfg)
    state = TrainState.create(params, cfg, steps_per_epoch=100)
    step = make_train_step(cfg)

    rng = np.random.RandomState(0)
    batch = {
        "frames": jnp.asarray(rng.rand(B, 2, S, S, 3) * 2 - 1,
                              jnp.float32),
        "target": jnp.asarray(rng.rand(B, S, S, 3) * 2 - 1, jnp.float32),
        "t": jnp.full((B, 1), 0.5, jnp.float32),
    }

    t0 = time.time()
    state, metrics = step(state, batch)
    fence = float(jax.tree.leaves(metrics)[0])
    compile_s = time.time() - t0
    print(f"cold compile+first step: {compile_s:.1f}s (loss {fence:.4f})",
          flush=True)

    iters = 6
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch)
    float(jax.tree.leaves(metrics)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"train step (B={B}, {S}x{S}, S_trn={cfg.S_trn}): "
          f"{dt * 1000:.0f} ms/step = {1 / dt:.3f} steps/s "
          f"({B / dt:.2f} samples/s)", flush=True)


if __name__ == "__main__":
    main()
