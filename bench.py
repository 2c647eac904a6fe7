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


def _wait_for_device(budget_s: float) -> bool:
    """The axon relay occasionally flaps (a 5h outage ate round 3's probe
    window); a hung backend init can't be timed out in-process, so liveness
    is probed in a SUBPROCESS (tiny matmul) with retries until the budget
    runs out. Returns True once the chip answers; False → the caller exits
    nonzero fast instead of hanging the driver."""
    import signal
    import subprocess
    # the child pins the intended platform and REFUSES a CPU fallback (a
    # raising-but-not-hung relay would otherwise fall back to CPU, return 0
    # and green-light a bench against a dead backend)
    probe = ("import jax, jax.numpy as jnp;"
             "assert jax.default_backend() != 'cpu';"
             "x = jnp.ones((128, 128));"
             "print(float(jnp.sum(x @ x)))")
    env = dict(os.environ,
               JAX_PLATFORMS=os.environ.get("JAX_PLATFORMS", "axon"))
    deadline = time.time() + budget_s
    attempt = 0
    while True:
        attempt += 1
        # Popen + killpg (no pipes): a hung backend init can leave helper
        # processes holding inherited fds — subprocess.run(capture_output)
        # would block in communicate() after the kill, forever
        proc = subprocess.Popen([sys.executable, "-c", probe], env=env,
                                stdout=subprocess.DEVNULL,
                                stderr=subprocess.DEVNULL,
                                start_new_session=True)
        try:
            if proc.wait(timeout=180) == 0:
                return True
        except subprocess.TimeoutExpired:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                proc.kill()
            proc.wait()
        if time.time() >= deadline:
            return False
        print(f"bench: device probe attempt {attempt} failed; retrying "
              f"({int(deadline - time.time())}s left)", file=sys.stderr,
              flush=True)
        time.sleep(min(60, max(1, deadline - time.time())))


def main():
    if os.environ.get("JAX_PLATFORMS", "axon") not in ("cpu",):
        budget = float(os.environ.get("FLDRX_BENCH_WAIT", "900"))
        if not _wait_for_device(budget):
            print("bench: no live device within budget", file=sys.stderr)
            sys.exit(3)
    import jax
    import jax.numpy as jnp

    from fldrx.api import prepare_model, DEFAULT_NPZ
    from fldrx.config import papermodel_test5

    # deploy default = the PARITY-COMPLIANT mixed policy: bf16 UNet (its
    # deviation vs fast-f32 is 71 dB — negligible) with the flow/feature
    # path in f32 (bf16 flow alone costs ~8 dB of deviation). Measured cost
    # of f32 flow: ~0.03 fps.
    dtype = os.environ.get("FLDRX_BENCH_DTYPE", "bfloat16")
    flow_dtype = os.environ.get("FLDRX_BENCH_FLOW_DTYPE", "float32")
    unet_dtype = os.environ.get("FLDRX_BENCH_UNET_DTYPE", "")
    tchunk = int(os.environ.get("FLDRX_BENCH_T_CHUNK", "4"))
    # planes_out (default on, r4-measured 4.598 vs 4.577): skip the device
    # interleave kernel; eval consumers unpack on host worker threads
    # (bit-equal layout change — see config.py)
    planes = bool(int(os.environ.get("FLDRX_BENCH_PLANES_OUT", "1")))
    # (A pair-batched mode — FLDRX_BENCH_PAIRS, B independent pairs riding
    # one program with per-item PCA min-max — was TPU-measured in r5 and
    # DELETED: 4.256 fps at PAIRS=2/T_CHUNK=2 and 3.596 at T_CHUNK=4 vs
    # 4.686 defaults; two pairs' live flow extras + planes cost far more
    # than the shared launch prologues save. cfg.per_item_minmax stays: it
    # is the reference-parity semantics for any multi-pair batch, e.g.
    # dp-mesh eval — see config.py.)
    cfg = papermodel_test5().replace(compute_dtype=dtype, t_chunk=tchunk,
                                     flow_dtype=flow_dtype,
                                     unet_dtype=unet_dtype,
                                     planes_out=planes)
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
    content = os.environ.get("FLDRX_BENCH_CONTENT", "natural")
    if content == "noise":
        frames = (rng.rand(1, 2, H, W, 3) * 2 - 1).astype(np.float32)
    else:
        # naturalistic moving content: band-limited texture + camera-pan
        # motion between the two frames, so flow magnitudes and the warp
        # engine's spill-tier hit rates resemble real video (uniform noise
        # produces near-zero estimated flow — an unrealistically easy case)
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        def tex(px, py):
            return (np.sin((xx + px) / 17) * np.cos((yy + py) / 23)
                    + 0.5 * np.sin((xx + py) / 5.3) * np.sin((yy + px) / 7.1)
                    + 0.3 * np.sin((xx - px) / 61) * np.cos((yy + py) / 47))
        f0 = np.stack([tex(0, 0), tex(9, 4), tex(3, 11)], -1)
        f1 = np.stack([tex(22, 13), tex(31, 17), tex(25, 24)], -1)
        frames = np.stack([f0, f1], 0)[None].astype(np.float32) * 0.6
    if bool(int(os.environ.get("FLDRX_BENCH_U8", "1"))):  # default on
        # (r4-measured 4.587 vs 4.577; real eval frames are uint8 anyway)
        # ship uint8 and normalize on device (4× less H2D per pair; real
        # video frames are uint8-quantized anyway — see FLDRX_RAW_FRAMES)
        frames = np.clip(np.round((frames + 1.0) * 127.5), 0,
                         255).astype(np.uint8)   # content reaches ±1.07:
        # unclipped casts would WRAP and inject salt-and-pepper edges
    frames_j = jnp.asarray(frames)
    # the benchmark protocol: X-Test ×8 → 7 interpolated frames per pair
    # (main.py:359); flow is computed once per pair, synthesis per t
    multiple = int(os.environ.get("FLDRX_BENCH_MULTIPLE", "8"))
    t_values = np.linspace(1 / multiple, 1 - 1 / multiple, multiple - 1)

    # "multi" batches the t-values into chunked jitted programs. r2 sweep:
    # chunk 1 (per-t) 2.53 fps, 2 → 2.61, 3 → 2.64, 4 → 2.50 (memory
    # pressure; 7 at once OOMs — the side-effecting warp kernels pin their
    # buffers). r4 re-sweep after planes_out/u8/blend24 freed HBM:
    # 2 → 4.633, 3 → 4.653, 4 → 4.698 — chunk 4 is the default now.
    mode = os.environ.get("FLDRX_BENCH_MODE", "multi")

    def dispatch():
        """Enqueue one pair's full flow+synthesis; returns the last output
        WITHOUT fetching (JAX async dispatch — device work proceeds)."""
        flow, padded, extras = interp.precompute_flow(frames_j)
        if mode == "multi":
            # t-values batched into jitted synthesis programs of `tchunk`
            # (all 7 at once exceeds HBM: the side-effecting warp kernels
            # pin their buffers)
            out = None
            for k in range(0, len(t_values), tchunk):
                out = interp.synthesize_multi_at(
                    flow, padded, t_values[k:k + tchunk], (H, W), extras)
            return out[-1]
        out = None
        for tv in t_values:
            out = interp.synthesize_at(flow, padded, [[tv]], (H, W), extras)
        return out

    def measure():
        return float(jnp.sum(dispatch()))  # device fence: block_until_ready
        # can return early under relayed backends — force a scalar fetch

    if os.environ.get("FLDRX_BENCH_SPILLS"):
        # spill-tier visibility: how many 32x32 tiles of each warp call fall
        # outside the fast kernels' windows (and hence pay the exact-fixup
        # tiers) for THIS content (stderr; the JSON line stays clean)
        from fldrx.ops import fastwarp as fw
        flow, padded, extras = interp.precompute_flow(frames_j)
        flow_10, flow_01 = extras[0], extras[1]
        Hp, Wp = padded.shape[2], padded.shape[3]
        n_tiles = (Hp // 32) * (Wp // 32)
        for name, fl in (("splat_t0.5", 0.5 * flow_01),
                         ("gather_fb0.5", 0.5 * flow_10)):
            xs = jnp.arange(Wp, dtype=jnp.float32)
            ys = jnp.arange(Hp, dtype=jnp.float32)
            if name.startswith("splat"):
                tx = fw._tile_flatten(xs[None, :] + fl[0, ..., 0], Hp, Wp)
                ty = fw._tile_flatten(ys[:, None] + fl[0, ..., 1], Hp, Wp)
                cp, winx, qx = fw._win_geom(4, wide=False)
                oy, ox = fw._origins_strip(tx, ty, Wp // 32, Wp, fw.WINY_S,
                                           winx, qx, winx)
                ok = fw._ok_mask(tx, ty, oy, ox, fw.STRIPH, winx)
            else:
                # per-tile adaptive origins (fixed GTILE=32 geometry)
                tx = fw._tile_flatten(xs[None, :] + fl[0, ..., 0], Hp, Wp,
                                      tile=fw.GTILE)
                ty = fw._tile_flatten(ys[:, None] + fl[0, ..., 1], Hp, Wp,
                                      tile=fw.GTILE)
                cp, winx, qx = fw._win_geom(4)
                _, oy, ox = fw._gather_origins(
                    tx, ty, Hp, Wp, fw.WINY_G, winx, qx, fw.WINY_G, winx,
                    fw._pick_k(Wp // fw.GTILE), fw.GTILE)
                ok = fw._ok_mask(tx, ty, oy, ox, fw.WINY_G, winx)
            bad = int(jnp.sum(~jnp.all(ok, axis=1)))
            n_tiles = ok.shape[0]
            print(f"# spills[{name}]: {bad}/{n_tiles} tiles "
                  f"(tiers {fw.SPLAT_SPILL_TIERS if 'splat' in name else fw.GATHER_SPILL_TIERS})",
                  file=sys.stderr)

    measure()                          # warm-up / compile
    iters = int(os.environ.get("FLDRX_BENCH_ITERS", "3"))
    overlap = bool(int(os.environ.get("FLDRX_BENCH_OVERLAP", "0")))
    t0 = time.perf_counter()
    if overlap:
        # pair-overlap protocol: dispatch pair i+1 BEFORE fencing pair i, so
        # the host's per-jit-call relay dispatch (~3-5 ms x ~3 calls/pair)
        # hides under device compute instead of idling the chip between
        # pairs. Device work is identical; the fence moves one pair later.
        # (This mirrors the evaluator's FLDRX_EVAL_DEFER dispatch order.)
        prev = None
        for _ in range(iters):
            cur = dispatch()
            if prev is not None:
                float(jnp.sum(prev))   # fence pair i-1 while pair i runs
            prev = cur
        float(jnp.sum(prev))           # drain the last pair
    else:
        for _ in range(iters):
            measure()
    dt = time.perf_counter() - t0

    fps = iters * len(t_values) / dt
    print(json.dumps({
        "metric": "4K interpolated frames/sec/chip (papermodel test5scales, x8)",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
    }))


if __name__ == "__main__":
    main()
