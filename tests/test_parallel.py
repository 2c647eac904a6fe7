"""Parallelism tests on the 8-device virtual CPU mesh: spatially-sharded
eval matches single-device output; dryrun_multichip executes; mesh helpers."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from fldrx.config import papermodel
from fldrx.model.fldrnet import forward_test, init_params
from fldrx.parallel.mesh import batch_specs, make_mesh, shard_batch
from fldrx.parallel.spatial import make_sharded_eval
from fldrx.eval.pipeline import build_pyramid


def test_make_mesh_shapes():
    mesh = make_mesh(jax.devices()[:8])
    assert mesh.shape["dp"] * mesh.shape["sp"] == 8
    mesh2 = make_mesh(jax.devices()[:4], dp=2)
    assert mesh2.shape == {"dp": 2, "sp": 2}


def test_sharded_eval_matches_unsharded():
    cfg = papermodel().replace(S_tst=1, fast_warp=False)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    B, H, W = 2, 64, 128
    frames = (rng.rand(B, 2, H, W, 3) * 2 - 1).astype(np.float32)
    t = np.full((B, 1), 0.5, np.float32)

    # unsharded reference
    fr = jnp.asarray(frames)
    pyr = build_pyramid(fr, cfg, cfg.S_tst + 1)
    ref = np.asarray(forward_test(params, cfg, pyr, jnp.asarray(t)))

    mesh = make_mesh(jax.devices()[:4], dp=2, sp=2)
    call = make_sharded_eval(params, cfg, mesh)
    with mesh:
        got = np.asarray(call(frames, t))
    # the global PCA min/max and conv halos must make sharded == unsharded
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_shard_batch_specs():
    mesh = make_mesh(jax.devices()[:8], dp=4, sp=2)
    batch = {
        "frames": np.zeros((4, 2, 32, 64, 3), np.float32),
        "target": np.zeros((4, 32, 64, 3), np.float32),
        "t": np.zeros((4, 1), np.float32),
    }
    sharded = shard_batch(mesh, batch)
    assert sharded["frames"].sharding.spec == batch_specs()["frames"]
    np.testing.assert_array_equal(np.asarray(sharded["t"]), batch["t"])


def test_sharded_fast_eval_matches_unsharded():
    """shard_map level-0 synthesis with per-shard Pallas warps (interpret
    mode) + explicit halo exchange == the unsharded fast path (VERDICT r1
    item 4: multi-chip eval must keep the warp engine)."""
    import importlib
    import os

    os.environ["FLDRX_PALLAS_INTERPRET"] = "1"
    from fldrx.ops import fastwarp
    importlib.reload(fastwarp)
    try:
        from fldrx.config import papermodel
        from fldrx.eval.pipeline import Interpolator
        from fldrx.model.fldrnet import init_params
        from fldrx.parallel.mesh import make_mesh
        from fldrx.parallel.spatial import make_sharded_fast_eval

        cfg = papermodel().replace(S_tst=1, S_trn=1, fast_warp=True)
        params = init_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.RandomState(0)
        H, W = 64, 256
        yy, xx = np.mgrid[0:H, 0:W] / 32.0
        f0 = np.stack([np.sin(xx), np.cos(yy), np.sin(xx + yy)], -1)
        f1 = np.stack([np.sin(xx + 0.2), np.cos(yy + 0.1),
                       np.sin(xx + yy + 0.15)], -1)
        frames = np.stack([f0, f1], 0)[None].astype(np.float32) * 0.7
        t = np.full((1, 1), 0.5, np.float32)

        ref = Interpolator(params, cfg)(frames, t)

        mesh = make_mesh(jax.devices()[:8], dp=2, sp=4)
        call = make_sharded_fast_eval(params, cfg, mesh, halo=64)
        with mesh:
            got = call(frames, t)
        # tolerance: both pipelines run bf16 kernels but the z-metric path
        # differs (exact in the pack vs fast in the unsharded reference);
        # the difference amplifies through exp() in the softmax-splat
        # normalisation at a handful of pixels — compare bulk, not max
        got = np.asarray(got)
        ref = np.asarray(ref)
        d = np.abs(got - ref)
        assert d.mean() < 2e-3, d.mean()
        assert np.mean(d > 5e-2) < 5e-4, np.mean(d > 5e-2)
        assert d.max() < 0.3, d.max()

        # multi-t path: ONE flow/prep per pair (VERDICT r3 item 4 — the ×8
        # protocol must not pay the flow stage per t), same per-t results
        ts = [0.25, 0.5, 0.75]
        base_runs = call.counters["n_flow_runs"]
        with mesh:
            multi = np.asarray(call.multi(frames, ts))
        assert call.counters["n_flow_runs"] == base_runs + 1
        with mesh:
            singles = np.concatenate(
                [np.asarray(call(frames, np.full((1, 1), tv, np.float32)))
                 for tv in ts], 0)
        np.testing.assert_allclose(multi, singles, atol=1e-6)
    finally:
        os.environ.pop("FLDRX_PALLAS_INTERPRET", None)
        importlib.reload(fastwarp)


def test_sharded_fast_eval_spill_fallback():
    """Motion beyond the halo budget must trigger the exact-path fallback
    and produce the exact result (VERDICT r2 item 5: no silent shard-edge
    zero-fill). Uses a tiny halo so ordinary motion exceeds it."""
    import importlib
    import os

    os.environ["FLDRX_PALLAS_INTERPRET"] = "1"
    from fldrx.ops import fastwarp
    importlib.reload(fastwarp)
    try:
        from fldrx.config import papermodel
        from fldrx.model.fldrnet import forward_test, init_params
        from fldrx.parallel.mesh import make_mesh
        from fldrx.parallel.spatial import make_sharded_fast_eval
        from fldrx.eval.pipeline import build_pyramid

        cfg = papermodel().replace(S_tst=1, S_trn=1, fast_warp=True)
        params = init_params(jax.random.PRNGKey(0), cfg)
        # strong constant-ish motion: scale z_alpha so flows are nonzero
        rng = np.random.RandomState(4)
        H, W = 64, 256
        frames = (rng.rand(1, 2, H, W, 3) * 2 - 1).astype(np.float32)
        t = np.full((1, 1), 0.5, np.float32)

        ref_cfg = cfg.replace(fast_warp=False)
        pyr = build_pyramid(jnp.asarray(frames), ref_cfg, 2)
        ref = np.asarray(forward_test(params, ref_cfg, pyr,
                                      jnp.asarray(t)))

        mesh = make_mesh(jax.devices()[:8], dp=2, sp=4)
        # halo 32 → budget 0 px: ANY motion spills → exact fallback
        call = make_sharded_fast_eval(params, cfg, mesh, halo=32,
                                      on_spill="exact", verbose=False)
        with mesh:
            got = np.asarray(call(frames, t))
        np.testing.assert_allclose(got, ref, atol=2e-5)
    finally:
        os.environ.pop("FLDRX_PALLAS_INTERPRET", None)
        importlib.reload(fastwarp)


def test_t_parallel_eval_matches_sequential():
    """t-sharded multi-chip eval (SURVEY §2.9 multi-frame throughput mode):
    each device synthesizes its own t-values with the full local pipeline;
    results match per-t sequential synthesis."""
    from fldrx.config import papermodel
    from fldrx.eval.pipeline import Interpolator
    from fldrx.model.fldrnet import init_params
    from fldrx.parallel.mesh import make_mesh
    from fldrx.parallel.spatial import make_t_parallel_eval

    cfg = papermodel().replace(S_tst=1, S_trn=1, fast_warp=False)
    params = init_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.RandomState(0)
    H, W = 64, 96
    frames = (rng.rand(1, 2, H, W, 3) * 2 - 1).astype(np.float32)
    ts = np.linspace(1 / 8, 7 / 8, 8).astype(np.float32)

    interp = Interpolator(params, cfg)
    seq = np.stack([np.asarray(interp(frames, [[t]])[0]) for t in ts], 0)

    mesh = make_mesh(jax.devices()[:8], dp=4, sp=2)
    call = make_t_parallel_eval(params, cfg, mesh)
    with mesh:
        got = np.asarray(call(frames, ts))
    np.testing.assert_allclose(got, seq, atol=1e-5)
