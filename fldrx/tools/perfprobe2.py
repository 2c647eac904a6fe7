"""Ablation profiler for the packed-domain synthesis at 4K (round 3).

Times the REAL chunked multi-t synthesis program and ablated variants (each
stage stubbed out in turn) so per-stage costs are measured in context —
standalone microbenches mislead: the relay adds 3-5 ms per call and XLA
schedules stages differently inside the big program.

Usage: python -u -m fldrx.tools.perfprobe2  (minutes of compile, cached)
"""
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def natural_frames(H, W, shift=18):
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)

    def tex(px, py):
        return (np.sin((xx + px) / 17) * np.cos((yy + py) / 23)
                + 0.5 * np.sin((xx + px) / 5.3) * np.sin((yy + py) / 7.1))

    f0 = np.stack([tex(0, 0), tex(9, 4), tex(3, 11)], -1)
    f1 = np.stack([tex(shift, shift * .6), tex(9 + shift, 4 + shift * .6),
                   tex(3 + shift, 11 + shift * .6)], -1)
    return np.stack([f0, f1], 0)[None].astype(np.float32) * 0.6


def _run_levels(F, params, cfg, feats, S):
    fast = getattr(cfg, "fast_warp", False)
    vp = params["vfinet"]
    flow = None
    for level in range(S, 0, -1):
        flow = F.level_flow(vp, feats[level], flow, fast=fast)
    return F.level_flow(vp, feats[0], flow, fast=fast)


def timed(fn, *args, iters=4):
    r = fn(*args)
    jax.tree.map(lambda a: float(jnp.sum(a.astype(jnp.float32))), r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.tree.map(lambda a: float(jnp.sum(a.astype(jnp.float32))), r)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from fldrx.api import prepare_model, DEFAULT_NPZ
    from fldrx.config import papermodel_test5
    from fldrx.model import fldrnet as M

    cfg = papermodel_test5().replace(compute_dtype="bfloat16")
    interp, cfg, _ = prepare_model(DEFAULT_NPZ, cfg)
    params = interp.params
    cd = jnp.bfloat16

    frames = jnp.asarray(natural_frames(2160, 4096))
    flow, padded, extras = interp.precompute_flow(frames)
    print(f"flow precompute:    {timed(interp._compiled_flow(frames.shape), params, frames):7.1f} ms", flush=True)

    # ---- flow-precompute ablations (same in-context methodology): each
    # stage's inputs are replaced by trace-time zeros/cheap slices so the
    # stage drops out of the REAL program; Δ vs full = its in-context cost
    def flowpre(params, frames, skip=()):
        import fldrx.model.fldrnet as F
        from fldrx.eval.pipeline import build_pyramid
        from fldrx.ops.pad import pad_amount
        S = cfg.S_tst
        ph = pad_amount(frames.shape[2], cfg.div_pad)
        pw = pad_amount(frames.shape[3], cfg.div_pad)
        fr = frames
        if ph or pw:
            fr = jnp.pad(fr, [(0, 0), (0, 0), (0, ph), (0, pw), (0, 0)],
                         mode="reflect")
        if "pyramid" in skip:
            pyr = [fr[:, :, ::2 ** i, ::2 ** i] for i in range(S + 1)]
        else:
            pyr = build_pyramid(fr, cfg, S + 1)
        fd = F._stage_dtype(cfg, "flow_dtype", cd)

        def zeros_like_shapes(tree):
            return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), tree)

        if "features" in skip:
            feats = zeros_like_shapes(jax.eval_shape(
                lambda py: F.extract_features(params, cfg, py, S + 1, fd),
                pyr))
        else:
            feats = F.extract_features(params, cfg, pyr, S + 1, fd)
        if "levels" in skip:
            fl = zeros_like_shapes(jax.eval_shape(
                lambda fe: _run_levels(F, params, cfg, fe, S), feats))
        else:
            fl = _run_levels(F, params, cfg, feats, S)
        # flow_extras body with z / plane-pack knobs
        images = fr.astype(jnp.float32)
        flow_l = fl.astype(jnp.float32)
        H, W = images.shape[2], images.shape[3]
        upscale = H // flow_l.shape[1]
        from fldrx.ops.resize import resize_2d
        flow_10 = upscale * resize_2d(flow_l[..., 0:2], (H, W), "bilinear")
        flow_01 = upscale * resize_2d(flow_l[..., 2:4], (H, W), "bilinear")
        from fldrx.ops import fastwarp as fw
        ztiled = fw.GTILE == fw.TILE
        if "z" in skip:
            z0, z1 = zeros_like_shapes(jax.eval_shape(
                lambda a, b: F.z_metrics(params["vfinet"], images[:, 0],
                                         images[:, 1], a, b, True,
                                         fused=True, tiled_out=ztiled),
                flow_10, flow_01))
        else:
            z0, z1 = F.z_metrics(params["vfinet"], images[:, 0],
                                 images[:, 1], flow_10, flow_01, True,
                                 fused=True, tiled_out=ztiled)
        if "pack" in skip:
            planes = zeros_like_shapes(jax.eval_shape(
                lambda a: F._planes_batch(a), images[:, 0]))
            x0P = x1P = planes
            f10P = f01P = zeros_like_shapes(jax.eval_shape(
                lambda a: F._planes_batch(a), flow_10))
        else:
            x0P, x1P = F._planes_batch(images[:, 0]), F._planes_batch(
                images[:, 1])
            f10P, f01P = F._planes_batch(flow_10), F._planes_batch(flow_01)
        return (flow_10, flow_01, z0, z1, x0P, x1P, f10P, f01P)

    fvariants = [
        ("f.full", ()),
        ("f.-pyramid", ("pyramid",)),
        ("f.-features", ("features",)),
        ("f.-levels", ("levels",)),
        ("f.-z", ("z",)),
        ("f.-pack", ("pack",)),
        ("f.bare", ("pyramid", "features", "levels", "z", "pack")),
    ]
    fbase = None
    for name, skip in fvariants:
        f = jax.jit(partial(flowpre, skip=skip))
        ms = timed(f, params, frames)
        delta = "" if fbase is None else f"  (Δ {fbase - ms:+6.1f})"
        if fbase is None:
            fbase = ms
        print(f"{name:12s}: {ms:7.1f} ms{delta}", flush=True)

    t = jnp.full((1, 1), 0.375, jnp.float32)

    # ablation knobs threaded through a copy of synthesize_packed
    def synth(params, flow, padded, t, extras, skip=()):
        import fldrx.model.fldrnet as F
        p = params["vfinet"]
        from fldrx.ops.fastwarp import (_sample_coords, gather_multi,
                                        splat_multi)
        from fldrx.ops.repack import interleave_planes
        from fldrx.ops.resize import resize_2d
        B = 1
        images = padded.astype(jnp.float32)
        flow_l = flow.astype(jnp.float32)
        tb = t.reshape(B, 1, 1, 1)
        flow_10 = flow_l[..., 0:2]
        flow_01 = flow_l[..., 2:4]
        H, W = images.shape[2], images.shape[3]
        h, w = flow_l.shape[1], flow_l.shape[2]
        Hp4, Wp4 = H // 4, W // 4
        upscale = H // h
        x0, x1 = images[:, 0], images[:, 1]
        (flow_10f, flow_01f, z0, z1, x0P, x1P, f10P, f01P) = extras

        def softsplat_vals(x, z):
            m = jnp.exp(z)
            return jnp.concatenate([(x + 1.0) * 0.5 * m, m], -1)

        xsF = jnp.arange(W, dtype=jnp.float32)
        ysF = jnp.arange(H, dtype=jnp.float32)

        def norm_planes(s):
            s = s.reshape(4, Hp4, W, 4)
            nz = s[..., -1:]
            nz = jnp.where(nz == 0.0, jnp.ones_like(nz), nz)
            return ((s[..., :-1] / nz - 0.5) * 2.0).reshape(4, Hp4, W * 3)

        ztiled = z0.ndim == 3            # tiled z chain (flow_extras)
        if "splat" in skip:
            warped0P, warped1P = x0P, x1P
        else:
            if ztiled:
                def tile_b(x):
                    a = x.reshape(B, H // 32, 32, W // 32, 32, -1)
                    return jnp.moveaxis(a, 3, 2).reshape(
                        B, (H // 32) * (W // 32), 32 * 32, -1)
                vals0 = softsplat_vals(tile_b(x0), z0[..., None])
                vals1 = softsplat_vals(tile_b(x1), z1[..., None])
            else:
                vals0 = softsplat_vals(x0, z0)
                vals1 = softsplat_vals(x1, z1)
            ft0 = tb * flow_01f
            ft1 = (1.0 - tb) * flow_10f
            s0, s1 = splat_multi(
                [(vals0[0], xsF[None] + ft0[0, ..., 0],
                  ysF[:, None] + ft0[0, ..., 1]),
                 (vals1[0], xsF[None] + ft1[0, ..., 0],
                  ysF[:, None] + ft1[0, ..., 1])], vals_tiled=ztiled)
            warped0P = norm_planes(s0)[None]
            warped1P = norm_planes(s1)[None]

        if "flowback" in skip:
            fb0P = jnp.zeros((B, 4, Hp4, W * 2), jnp.float32)
            fb1P = fb0P
            sxy = None
        else:
            sx0, sy0 = _sample_coords((1.0 - tb[0]) * flow_01[0], h, w)
            sx1, sy1 = _sample_coords((tb[0]) * flow_10[0], h, w)
            g0, g1 = gather_multi([(flow_10 * tb)[0], (flow_01 * (1 - tb))[0]],
                                  [(0, sx0, sy0, False), (1, sx1, sy1, False)])
            fb0 = g0[None]
            fb1 = g1[None]
            fb0P5 = (upscale * F._upsample_to_planes(fb0, H, W)).reshape(
                B, 4, Hp4, W, 2) * 1.0
            fb1P5 = (upscale * F._upsample_to_planes(fb1, H, W)).reshape(
                B, 4, Hp4, W, 2) * 1.0
            fb0P = fb0P5.reshape(B, 4, Hp4, W * 2)
            fb1P = fb1P5.reshape(B, 4, Hp4, W * 2)

        if "gather" in skip or "flowback" in skip:
            im0P, im1P = x0P, x1P
        else:
            from fldrx.ops.fastwarp import tile_us_from_planes
            xsF2 = jnp.arange(W, dtype=jnp.float32)
            uoff = jnp.arange(4, dtype=jnp.float32).reshape(4, 1, 1)
            ys4 = 4.0 * jnp.arange(Hp4, dtype=jnp.float32).reshape(1, Hp4, 1)

            def tiled_coords(fbP5):
                sx = (xsF2[None, None, :] + fbP5[0, ..., 0]) * (
                    W / max(W - 1, 1)) - 0.5
                sy = (ys4 + uoff + fbP5[0, ..., 1]) * (H / max(H - 1, 1)) - 0.5
                return (tile_us_from_planes(sx, H, W),
                        tile_us_from_planes(sy, H, W))
            sx0, sy0 = tiled_coords(fb0P5)
            sx1, sy1 = tiled_coords(fb1P5)
            g0, g1 = gather_multi([x0[0], x1[0]],
                                  [(0, sx0, sy0, True), (1, sx1, sy1, True)],
                                  planes_out=True, coords_tiled=True)
            im0P, im1P = g0[None], g1[None]

        ft0P = tb * f01P
        ft1P = (1.0 - tb) * f10P

        def cells(P, u, k):
            return P[:, u].reshape(B, Hp4, Wp4, 4, k)

        if "unet" in skip:
            out = jnp.ones((B, Hp4, Wp4, 96), jnp.float32)
        else:
            comps = ((x0P, 3), (x1P, 3), (warped0P, 3), (warped1P, 3),
                     (ft0P, 2), (ft1P, 2), (fb0P, 2), (fb1P, 2),
                     (im0P, 3), (im1P, 3))
            refine_in = jnp.concatenate(
                [P[:, u].reshape(B, Hp4, Wp4, 4 * k).astype(cd)
                 for u in range(4) for P, k in comps], -1)
            out = M.refine_unet_s2d_core(
                p["refine"], refine_in,
                in_perm=M._uorder_perm(tuple(k for _, k in comps)))
            out = out.astype(jnp.float32)

        T = p["T_param"].astype(jnp.float32)
        tb5 = t.reshape(B, 1, 1, 1, 1)
        if "blend" in skip:
            return out
        logt = jnp.log(tb5)
        log1mt = jnp.log(1.0 - tb5)
        bias = jnp.concatenate(
            [log1mt, logt, log1mt, logt, log1mt, logt], -1)
        planes = []
        for u in range(4):
            p6 = jax.nn.softmax(
                out[..., u * 24:u * 24 + 24].reshape(B, Hp4, Wp4, 4, 6) / T
                + bias, -1)
            ou = (p6[..., 0:1] * cells(warped0P, u, 3)
                  + p6[..., 1:2] * cells(warped1P, u, 3)
                  + p6[..., 2:3] * cells(im0P, u, 3)
                  + p6[..., 3:4] * cells(im1P, u, 3)
                  + p6[..., 4:5] * cells(x0P, u, 3)
                  + p6[..., 5:6] * cells(x1P, u, 3))
            planes.append(ou.reshape(B, Hp4, W * 3))
        outP = jnp.stack(planes, 1)
        if "interleave" in skip:
            return outP
        return interleave_planes(outP[0]).reshape(B, H, W, 3)

    variants = [
        ("full", ()),
        ("-splat", ("splat",)),
        ("-gather", ("gather",)),
        ("-flowback", ("flowback",)),
                ("-unet", ("unet",)),
        ("-blend+il", ("blend",)),
        ("-interleave", ("interleave",)),
        ("warps only", ("unet", "blend")),
    ]
    base = None
    for name, skip in variants:
        f = jax.jit(partial(synth, skip=skip))
        ms = timed(f, params, flow, padded, t, extras)
        delta = "" if base is None else f"  (Δ {base - ms:+6.1f})"
        if base is None:
            base = ms
        print(f"{name:12s}: {ms:7.1f} ms{delta}", flush=True)


if __name__ == "__main__":
    main()
