"""Spatially-sharded evaluation — multi-chip 4K inference (SURVEY.md §2.9).

The level-0 synthesis at 4K is the memory/compute peak; sharding the image
width over the 'sp' mesh axis splits it across chips.

Two paths:

* `make_sharded_eval` — pjit/SPMD with the exact XLA warp ops
  (cfg.fast_warp=False): XLA's partitioner inserts halo exchanges for convs
  and all-reduces for the global PCA min/max automatically. Strict parity,
  but the warps run the slow scalarized route.

* `make_sharded_fast_eval` — shard_map level-0 synthesis keeping the Pallas
  warp engine: each device halo-exchanges `halo` columns of the full-res
  field pack with its 'sp' neighbours (jax.lax.ppermute; the ring's missing
  edges zero-fill, which matches the warps' zero-padding semantics), runs
  the per-shard fast kernels + the s2d refine UNet on the extended slab,
  and keeps the exact center (overlap-and-discard: the UNet apron and all
  warp reach within `halo` are computed redundantly at slab edges).
  Exactness bound: flows up to halo−TILE px are handled exactly; larger
  displacements land outside the slab and resolve to the zero-fill (the
  evaluator's exact path or t-parallel DP covers pathological motion).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax.experimental.shard_map import shard_map
except ImportError:                                    # newer jax
    from jax import shard_map

from ..config import FLDRConfig
from ..eval.pipeline import build_pyramid
from ..model.fldrnet import forward_test
from ..ops.pad import pad_amount

TILE_ALIGN = 32        # warp-engine tile size: shard widths must divide it


def make_sharded_eval(params, cfg: FLDRConfig, mesh: Mesh):
    """Returns fn(frames [B,2,H,W,3], t [B,1]) running batch-over-'dp' and
    width-over-'sp' sharded on `mesh`."""
    cfg = cfg.replace(fast_warp=False)

    def fn(params, frames, t):
        frames = jax.lax.with_sharding_constraint(
            frames, NamedSharding(mesh, P("dp", None, None, "sp", None)))
        ph = pad_amount(frames.shape[2], cfg.div_pad)
        pw = pad_amount(frames.shape[3], cfg.div_pad)
        if ph or pw:
            frames = jnp.pad(
                frames, [(0, 0), (0, 0), (0, ph), (0, pw), (0, 0)],
                mode="reflect" if cfg.padding == "reflect" else "constant")
        pyr = build_pyramid(frames, cfg, cfg.S_tst + 1)
        out = forward_test(params, cfg, pyr, t)
        return jax.lax.with_sharding_constraint(
            out, NamedSharding(mesh, P("dp", None, "sp", None)))

    jitted = jax.jit(fn)

    def call(frames, t):
        fr = jax.device_put(
            jnp.asarray(frames, jnp.float32),
            NamedSharding(mesh, P("dp", None, None, "sp", None)))
        tt = jax.device_put(jnp.asarray(t, jnp.float32).reshape(-1, 1),
                            NamedSharding(mesh, P("dp", None)))
        pr = jax.device_put(params, NamedSharding(mesh, P()))
        return jitted(pr, fr, tt)

    return call


# ---------------------------------------------------------------------------
# shard_map fast path: per-shard Pallas warps with explicit halo exchange
# ---------------------------------------------------------------------------

def _exchange_halo_w(x: jnp.ndarray, halo: int, axis_name: str = "sp"):
    """[.., W_local, C] → [.., W_local + 2·halo, C]: receive the left
    neighbour's rightmost and right neighbour's leftmost `halo` columns.
    Edge devices zero-fill (ppermute drops unpaired links), matching the
    zero-padding semantics of bwarp/softsplat beyond the frame."""
    n = jax.lax.psum(1, axis_name)
    right = [(i, i + 1) for i in range(n - 1)]
    left = [(i + 1, i) for i in range(n - 1)]
    from_left = jax.lax.ppermute(x[..., -halo:, :], axis_name, right)
    from_right = jax.lax.ppermute(x[..., :halo, :], axis_name, left)
    return jnp.concatenate([from_left, x, from_right], axis=-2)


def _bwarp_global(x_slab: jnp.ndarray, flow_slab: jnp.ndarray,
                  Wg: int, x_off) -> jnp.ndarray:
    """bwarp on a width slab with the GLOBAL image's p·S/(S−1)−0.5 sampling
    convention (fLDRnet.py:546-581 uses S = full W/H, so slab-local bwarp
    would shift sub-pixel coordinates). x_slab: [B, H, Ws, C]; flow_slab:
    [B, H, Ws, 2]; x_off: global column of the slab's first column (traced).
    """
    from ..ops.fastwarp import gather_at

    B, H, Ws, C = x_slab.shape
    xs = jnp.arange(Ws, dtype=jnp.float32) + x_off      # global columns
    ys = jnp.arange(H, dtype=jnp.float32)
    outs = []
    for b in range(B):
        gx = xs[None, :] + flow_slab[b, ..., 0]
        gy = ys[:, None] + flow_slab[b, ..., 1]
        sx_g = gx * (Wg / max(Wg - 1, 1)) - 0.5          # global sample col
        sy = gy * (H / max(H - 1, 1)) - 0.5
        sx = sx_g - x_off                                # slab-local
        out = gather_at(x_slab[b], sx, sy)
        # analytic ones-mask with GLOBAL frame bounds (ops/fastwarp.py:334)
        x0g = jnp.floor(sx_g)
        y0 = jnp.floor(sy)
        fx = sx_g - x0g
        fy = sy - y0

        def valid(xi, yi):
            return ((xi >= 0) & (xi < Wg) & (yi >= 0) & (yi < H)).astype(
                jnp.float32)

        x0i = x0g.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        ones = (valid(x0i, y0i) * (1 - fx) * (1 - fy)
                + valid(x0i + 1, y0i) * fx * (1 - fy)
                + valid(x0i, y0i + 1) * (1 - fx) * fy
                + valid(x0i + 1, y0i + 1) * fx * fy)
        mask = (ones >= 0.999).astype(jnp.float32)
        outs.append(out * mask[..., None])
    return jnp.stack(outs, 0)


def _field_pack_t(cfg: FLDRConfig, flow, frames, flow_10, flow_01,
                  z0, z1, t):
    """The t-DEPENDENT full-res fields of the level-0 synthesis, as one
    [B, H, W, 16] tensor: x0(3) x1(3) flow_t0(2) flow_t1(2) z0 z1 fb0(2)
    fb1(2). flow_10/flow_01/z0/z1 come precomputed from `_prep_pair`
    (t-independent, hoisted out of the ×8 per-t loop — VERDICT r3 item 4).
    Pure XLA (t-scales + low-res flowback composition), so it shards over
    'sp' under the SPMD partitioner."""
    from ..ops.resize import resize_2d
    from ..ops.warp import bwarp as bw_exact

    B = flow.shape[0]
    tb = t.reshape(B, 1, 1, 1).astype(jnp.float32)
    H, W = frames.shape[2], frames.shape[3]
    upscale = H // flow.shape[1]

    def up(f):
        return upscale * resize_2d(f, (H, W), "bilinear")

    flow = flow.astype(jnp.float32)
    x0 = frames[:, 0].astype(jnp.float32)
    x1 = frames[:, 1].astype(jnp.float32)
    flow_t0 = tb * flow_01
    flow_t1 = (1.0 - tb) * flow_10
    if min(flow.shape[1], flow.shape[2]) >= 96:
        # low-res composition + full-res analytic mask — must mirror the
        # unsharded fast path's gating (model/fldrnet.py synthesize)
        from ..model.fldrnet import _bwarp_ones_mask
        fb0 = up(bw_exact(flow[..., 0:2] * tb, (1.0 - tb) * flow[..., 2:4],
                          False)) * _bwarp_ones_mask((1.0 - tb) * flow_01)
        fb1 = up(bw_exact(flow[..., 2:4] * (1.0 - tb), tb * flow[..., 0:2],
                          False)) * _bwarp_ones_mask(tb * flow_10)
    else:
        fb0 = bw_exact(flow_10 * tb, (1.0 - tb) * flow_01)
        fb1 = bw_exact(flow_01 * (1.0 - tb), tb * flow_10)
    return jnp.concatenate(
        [x0, x1, flow_t0, flow_t1, z0, z1, fb0, fb1], axis=-1)


def _synth_local(params, cfg: FLDRConfig, Wg: int, halo: int,
                 pack_local, t):
    """Per-shard level-0 synthesis on the halo-extended slab; returns the
    center crop. Runs inside shard_map — every op here is device-local."""
    from ..model.fldrnet import refine_unet, refine_unet_s2d
    from ..ops.splat import softsplat
    from ..ops.fastwarp import splat_sum_fast

    ext = _exchange_halo_w(pack_local, halo)
    B = ext.shape[0]
    Wl = pack_local.shape[2]
    idx = jax.lax.axis_index("sp")
    x_off = idx * Wl - halo                     # global col of slab col 0
    x0, x1 = ext[..., 0:3], ext[..., 3:6]
    flow_t0, flow_t1 = ext[..., 6:8], ext[..., 8:10]
    z0, z1 = ext[..., 10:11], ext[..., 11:12]
    fb0, fb1 = ext[..., 12:14], ext[..., 14:16]

    # splats are translation-invariant: local coords = local pos + flow
    warped0 = softsplat(x0, flow_t0, z=z0, splat_fn=splat_sum_fast)
    warped1 = softsplat(x1, flow_t1, z=z1, splat_fn=splat_sum_fast)
    # gathers carry the global p·S/(S−1)−0.5 convention
    im0_tot = _bwarp_global(x0, fb0, Wg, x_off)
    im1_tot = _bwarp_global(x1, fb1, Wg, x_off)

    vp = params["vfinet"]
    refine_in = jnp.concatenate(
        [x0, x1, warped0, warped1, flow_t0, flow_t1, fb0, fb1,
         im0_tot, im1_tot], -1)
    unet = (refine_unet_s2d
            if refine_in.shape[1] % 4 == 0 and refine_in.shape[2] % 4 == 0
            else refine_unet)
    out = unet(vp["refine"], refine_in).astype(jnp.float32)

    tb = t.reshape(B, 1, 1, 1).astype(jnp.float32)
    T = vp["T_param"].astype(out.dtype)
    occ = jax.nn.softmax(out[..., :6] / T, axis=-1)
    w0 = (1 - tb) * occ[..., 0:1]
    w1 = tb * occ[..., 1:2]
    w2 = (1 - tb) * occ[..., 2:3]
    w3 = tb * occ[..., 3:4]
    w4 = (1 - tb) * occ[..., 4:5]
    w5 = tb * occ[..., 5:6]
    divisor = w0 + w1 + w2 + w3 + w4 + w5
    out_l = (w0 * warped0 + w1 * warped1 + w2 * im0_tot + w3 * im1_tot
             + w4 * x0 + w5 * x1) / divisor
    return out_l[:, :, halo:halo + Wl]


def make_sharded_fast_eval(params, cfg: FLDRConfig, mesh: Mesh,
                           halo: int = 256, on_spill: str = "exact",
                           verbose: bool = True):
    """Width-sharded multi-chip eval KEEPING the Pallas warp engine.

    Flow estimation runs replicated (it is 64x smaller than synthesis);
    the full-res field pack shards over 'sp' via the SPMD partitioner; the
    level-0 synthesis runs under shard_map with explicit halo exchange.
    Returns fn(frames [B,2,H,W,3], t [B,1]) → [B, H, W, 3].

    Shard-spill safety: the fast path is exact only for horizontal
    displacements within halo − TILE px of a shard edge; beyond that the
    slab resolves to zero-fill. The per-t jitted program therefore also
    returns the frame's max horizontal displacement (a cheap max-reduce over
    every field the shard_map warps consume), and `call` reacts per frame:
      on_spill='exact' — rerun that frame through the pjit exact path
                         (XLA-partitioned warps; slow but exact at any
                         motion), like the single-chip engine's spill
                         tiers (ops/fastwarp.py discipline);
      on_spill='warn'  — keep the fast result, print a loud warning.

    The work is split per PAIR vs per T (VERDICT r3 item 4 — the ×8
    protocol must not pay the flow stage 7×): `prep` computes pad → pyramid
    → flow → full-res endpoint flows → z metrics ONCE per pair (flow runs
    the fast warp engine, replicated per device under shard_map, since the
    Pallas kernels have no SPMD partitioning rule and the flow stage is 64×
    smaller than synthesis); the per-t program only t-scales flows, composes
    the low-res flowbacks and runs the shard_map synthesis. The returned
    `call(frames, t)` keeps the single-t signature; `call.multi(frames,
    t_values)` runs all t's on one prep (the evaluator-bridge path).
    `call.n_flow_runs` counts prep executions (tests assert hoisting).
    """
    from ..model.fldrnet import forward_flow, z_metrics
    from ..ops.resize import resize_2d

    nsp = mesh.shape["sp"]
    assert halo % TILE_ALIGN == 0

    def prep_fn(params, frames):
        ph = pad_amount(frames.shape[2], cfg.div_pad)
        pw = pad_amount(frames.shape[3], cfg.div_pad)
        if ph or pw:
            frames = jnp.pad(
                frames, [(0, 0), (0, 0), (0, ph), (0, pw), (0, 0)],
                mode="reflect" if cfg.padding == "reflect" else "constant")
        H, W = frames.shape[2], frames.shape[3]
        assert W % (nsp * TILE_ALIGN) == 0, (W, nsp)
        pyr = build_pyramid(frames, cfg, cfg.S_tst + 1)
        if getattr(cfg, "fast_warp", False):
            # Pallas warp engine for the flow recurrence: replicated
            # per-device shard_map (no comms; flow is 64× smaller than
            # synthesis, so redundant compute beats a scalarized XLA warp)
            n_in = 1 + len(pyr)
            flow = shard_map(
                lambda pr, *pyr_l: forward_flow(pr, cfg, list(pyr_l)),
                mesh=mesh, in_specs=(P(),) * n_in, out_specs=P(),
                check_rep=False)(params, *pyr)
        else:
            flow = forward_flow(params, cfg, pyr)
        flow = flow.astype(jnp.float32)
        x0 = frames[:, 0].astype(jnp.float32)
        x1 = frames[:, 1].astype(jnp.float32)
        upscale = H // flow.shape[1]
        flow_10 = upscale * resize_2d(flow[..., 0:2], (H, W), "bilinear")
        flow_01 = upscale * resize_2d(flow[..., 2:4], (H, W), "bilinear")
        # z metrics are t-independent (fLDRnet.py:439-446); exact XLA form
        # so they shard over 'sp' under the SPMD partitioner
        z0, z1 = z_metrics(params["vfinet"], x0, x1, flow_10, flow_01,
                           fast=False)
        return flow, frames, flow_10, flow_01, z0, z1

    def synth_fn(params, frames, flow, flow_10, flow_01, z0, z1, t):
        W = frames.shape[3]
        pack = _field_pack_t(cfg, flow, frames, flow_10, flow_01, z0, z1, t)
        # max horizontal reach of the shard_map warps: splat targets move
        # by flow_t*; gather samples by fb* (+2 px margin for the global
        # p·S/(S−1)−0.5 sampling shift)
        max_disp = jnp.maximum(
            jnp.max(jnp.abs(pack[..., 6:10:2])),          # flow_t0x, flow_t1x
            jnp.max(jnp.abs(pack[..., 12:16:2])) + 2.0)   # fb0x, fb1x
        pack = jax.lax.with_sharding_constraint(
            pack, NamedSharding(mesh, P(None, None, "sp", None)))
        synth = shard_map(
            functools.partial(_synth_local, params, cfg, W, halo),
            mesh=mesh,
            in_specs=(P(None, None, "sp", None), P()),
            out_specs=P(None, None, "sp", None),
            check_rep=False,
        )
        return synth(pack, t), max_disp

    prep_jit = jax.jit(prep_fn)
    synth_jit = jax.jit(synth_fn)
    exact_call = [None]
    counters = {"n_flow_runs": 0, "n_spill_fallbacks": 0}

    def _prep(frames):
        fr = jax.device_put(jnp.asarray(frames, jnp.float32),
                            NamedSharding(mesh, P()))
        pr = jax.device_put(params, NamedSharding(mesh, P()))
        counters["n_flow_runs"] += 1
        return pr, prep_jit(pr, fr)

    def _synth_one(pr, prep, frames, t, H, W):
        flow, padded, f10, f01, z0, z1 = prep
        tt = jax.device_put(jnp.asarray(t, jnp.float32).reshape(-1, 1),
                            NamedSharding(mesh, P()))
        out, max_disp = synth_jit(pr, padded, flow, f10, f01, z0, z1, tt)
        if float(max_disp) > halo - TILE_ALIGN:
            counters["n_spill_fallbacks"] += 1
            if on_spill == "exact":
                if verbose:
                    print(f"# sharded fast eval: motion {float(max_disp):.0f}"
                          f" px exceeds halo-{TILE_ALIGN} = "
                          f"{halo - TILE_ALIGN}; rerunning frame on the "
                          "exact pjit path", flush=True)
                if exact_call[0] is None:
                    # all devices on 'sp' (dp=1): the per-frame fallback
                    # runs B=1 frames
                    fb_mesh = Mesh(mesh.devices.reshape(1, -1),
                                   ("dp", "sp"))
                    exact_call[0] = make_sharded_eval(params, cfg, fb_mesh)
                return exact_call[0](frames, t)[:, :H, :W]
            print(f"# WARNING: sharded fast eval spill — max displacement "
                  f"{float(max_disp):.0f} px > {halo - TILE_ALIGN} px halo "
                  f"budget; shard-edge pixels may zero-fill "
                  f"(on_spill='warn')", flush=True)
        return out[:, :H, :W]

    def call(frames, t):
        H, W = frames.shape[2], frames.shape[3]
        pr, prep = _prep(frames)
        return _synth_one(pr, prep, frames, t, H, W)

    def multi(frames, t_values):
        """One flow prep for the whole pair, then per-t synthesis
        (the ×8 protocol's evaluator-bridge path). Returns [T, H, W, 3]
        stacked over the pair's B=1 frames."""
        H, W = frames.shape[2], frames.shape[3]
        pr, prep = _prep(frames)
        outs = [_synth_one(pr, prep, frames,
                           np.full((frames.shape[0], 1), tv, np.float32),
                           H, W)
                for tv in t_values]
        return jnp.concatenate([o for o in outs], 0)

    call.multi = multi
    call.counters = counters
    return call


# ---------------------------------------------------------------------------
# t-parallel eval: shard the interpolation times over devices
# ---------------------------------------------------------------------------

def make_t_parallel_eval(params, cfg: FLDRConfig, mesh: Mesh):
    """Multi-chip ×N interpolation throughput (SURVEY.md §2.9 "multi-frame
    throughput mode"): flow is computed once (replicated — it is 64x smaller
    than synthesis), then the (multiple−1) t-values shard over EVERY mesh
    device; each device runs the full fast-path level-0 synthesis for its
    t's locally — no halo exchange, no cross-device communication after the
    flow broadcast, and the Pallas warp engine runs unmodified per device.

    Returns fn(frames [1,2,H,W,3], t_values [T]) → [T, H, W, 3]. T need not
    divide the device count: the t list is padded by repeating its last
    entry up to the next multiple (the ×8 protocol's 7 t-values on 8
    devices run as one padded shard each) and the padded outputs dropped.
    """
    from ..model.fldrnet import forward_flow, forward_synthesis

    devices = mesh.devices.reshape(-1)
    n = len(devices)
    tmesh = Mesh(devices, ("t",))

    def fn(params, frames, ts):
        ph = pad_amount(frames.shape[2], cfg.div_pad)
        pw = pad_amount(frames.shape[3], cfg.div_pad)
        if ph or pw:
            frames = jnp.pad(
                frames, [(0, 0), (0, 0), (0, ph), (0, pw), (0, 0)],
                mode="reflect" if cfg.padding == "reflect" else "constant")
        pyr = build_pyramid(frames, cfg, cfg.S_tst + 1)
        flow = forward_flow(params, cfg, pyr)

        def synth_local(flow_r, frames_r, ts_local):
            T_local = ts_local.shape[0]
            outs = []
            for k in range(T_local):
                outs.append(forward_synthesis(
                    params, cfg, flow_r, frames_r, ts_local[k][None, None]))
            return jnp.concatenate(outs, 0)

        synth = shard_map(
            synth_local, mesh=tmesh,
            in_specs=(P(), P(), P("t")),
            out_specs=P("t"),
            check_rep=False,
        )
        return synth(flow, frames, ts)

    jitted = jax.jit(fn)

    def call(frames, t_values):
        H, W = frames.shape[2], frames.shape[3]
        ts = np.asarray(t_values, np.float32).reshape(-1)
        T = ts.shape[0]
        pad = (-T) % n
        if pad:
            ts = np.concatenate([ts, np.repeat(ts[-1:], pad)])
        fr = jax.device_put(jnp.asarray(frames, jnp.float32),
                            NamedSharding(tmesh, P()))
        tsj = jax.device_put(jnp.asarray(ts), NamedSharding(tmesh, P("t")))
        pr = jax.device_put(params, NamedSharding(tmesh, P()))
        return jitted(pr, fr, tsj)[:T, :H, :W]

    return call


def build_parallel_eval(params, cfg: FLDRConfig, mode: str = "t",
                        devices=None, halo: int = 256):
    """Multi-chip evaluator bridge for `fldrx.eval.evaluator.evaluate`
    (and the CLI's --mesh flag): returns
    fn(frames [1,2,H,W,3], t_values) → np [T, H, W, 3].

    mode 't'  — shard the t-values over every device (×N throughput for the
                ×8 protocol; uneven T is padded);
    mode 'sp' — width-shard each synthesis over all devices
                (make_sharded_fast_eval; for frames exceeding one chip's
                HBM), looping the pair's t-values.
    """
    import numpy as _np

    devices = list(devices if devices is not None else jax.devices())
    if mode == "t":
        mesh = Mesh(_np.array(devices), ("t",))
        call = make_t_parallel_eval(params, cfg, mesh)

        def fn(frames, t_values):
            with mesh:
                return _np.asarray(call(frames, list(t_values)))
        return fn
    if mode == "sp":
        mesh = Mesh(_np.array(devices).reshape(1, -1), ("dp", "sp"))
        call = make_sharded_fast_eval(params, cfg, mesh, halo=halo)

        def fn(frames, t_values):
            # flow/pyramid/z computed ONCE per pair (call.multi), not per t
            with mesh:
                return _np.asarray(call.multi(frames, list(t_values)))
        return fn
    raise ValueError(f"unknown parallel-eval mode: {mode!r}")
