"""Pallas warp-engine tests, run in interpreter mode on the CPU suite
(FLDRX_PALLAS_INTERPRET=1 set before importing fldrx.ops.fastwarp); on real
TPU the same assertions hold at bf16-MXU tolerance."""

import importlib
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fldrx.ops import fastwarp
from fldrx.ops.splat import softsplat, splat_sum
from fldrx.ops.warp import bwarp

TOL = 1.5e-2  # kernels intentionally run bf16 windows/matmuls


@pytest.fixture(scope="module", autouse=True)
def _interpret_mode():
    """Interpret-mode Pallas for this module only — the env flag must not
    leak into other tests (the parity suite needs the exact XLA fallback)."""
    os.environ["FLDRX_PALLAS_INTERPRET"] = "1"
    importlib.reload(fastwarp)
    yield
    os.environ.pop("FLDRX_PALLAS_INTERPRET", None)
    importlib.reload(fastwarp)


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    H, W, C = 128, 192, 3
    x = jnp.asarray(rng.rand(1, H, W, C).astype(np.float32) * 2 - 1)
    small = jnp.asarray((rng.randn(1, H, W, 2) * 5).astype(np.float32))
    big = jnp.asarray((rng.randn(1, H, W, 2) * 60).astype(np.float32))
    return x, small, big


def test_gather_matches_exact(data):
    x, small, big = data
    np.testing.assert_allclose(fastwarp.bwarp_fast(x, small),
                               bwarp(x, small), atol=TOL)
    np.testing.assert_allclose(
        fastwarp.bwarp_fast(x, small, with_mask=False),
        bwarp(x, small, with_mask=False), atol=TOL)


def test_gather_spills_exact(data):
    x, _, big = data
    np.testing.assert_allclose(fastwarp.bwarp_fast(x, big),
                               bwarp(x, big), atol=TOL)


def test_splat_matches_exact(data):
    x, small, big = data
    np.testing.assert_allclose(fastwarp.splat_sum_fast(x, small),
                               splat_sum(x, small), atol=TOL)
    np.testing.assert_allclose(fastwarp.splat_sum_fast(x, big),
                               splat_sum(x, big), atol=TOL)


def test_softsplat_wrapper(data):
    x, small, _ = data
    rng = np.random.RandomState(1)
    z = jnp.asarray(rng.rand(1, 128, 192, 1).astype(np.float32) * 0.5)
    np.testing.assert_allclose(fastwarp.softsplat_fast(x, small, z),
                               softsplat(x, small, z), atol=10 * TOL)


def _unplanes(P, C):
    """Invert the u-plane form [B, 4, H/4, W·C] → [B, H, W, C]."""
    B, _, Hp4, WC = P.shape
    W = WC // C
    s = jnp.stack([P[:, 0], P[:, 1], P[:, 2], P[:, 3]], axis=2)
    return s.reshape(B, Hp4 * 4, W, C)


def test_planes_outputs_match_plain(data):
    """planes_out is a pure layout permutation of the plain fast output —
    identical through kernels AND spill fixups (the planes kernel variants
    use the hat-form one-hots, bitwise equal on spill-free tiles)."""
    x, small, big = data
    rng = np.random.RandomState(3)
    z = jnp.asarray(rng.rand(1, 128, 192, 1).astype(np.float32) * 0.5)
    for fl in (small, big):
        np.testing.assert_allclose(
            np.asarray(fastwarp.bwarp_fast(x, fl)),
            np.asarray(_unplanes(fastwarp.bwarp_fast(x, fl,
                                                     planes_out=True), 3)),
            atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(fastwarp.softsplat_fast(x, fl, z)),
            np.asarray(_unplanes(fastwarp.softsplat_fast_planes(x, fl, z),
                                 3)),
            atol=1e-5)


def test_planes_fallback_on_odd_shapes():
    """Non-tile-divisible (but 4-divisible) shapes take the exact fallback
    and still produce the u-plane layout."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(1, 40, 48, 3).astype(np.float32))
    fl = jnp.asarray(rng.randn(1, 40, 48, 2).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(_unplanes(fastwarp.bwarp_fast(x, fl, planes_out=True),
                             3)),
        np.asarray(bwarp(x, fl)), atol=1e-6)


def test_splat_multi_matches_single(data):
    """The fused multi-problem splat (one continuous strip sweep with
    boundary drains) must equal per-problem splat_at planes output."""
    x, small, big = data
    H, W = 128, 192
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    probs = []
    for fl in (small, big):
        probs.append((x[0], xs + fl[0, ..., 0], ys + fl[0, ..., 1]))
    outs = fastwarp.splat_multi(probs)
    for (v, tx, ty), o in zip(probs, outs):
        ref = fastwarp.splat_at(v, tx, ty, planes_out=True)
        np.testing.assert_allclose(np.asarray(o), np.asarray(ref),
                                   atol=1e-5)


def test_splat_multi_shared_vals(data):
    """Cross-t vals sharing: when problems cycle through repeated vals
    OBJECTS (the chunk pattern vals0,vals1,vals0,vals1,…) the kernel's
    index_map routes p → p % n_vals — results must equal per-problem
    splat_at, including spill fixups."""
    x, small, big = data
    H, W = 128, 192
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    v0 = x[0]
    v1 = jnp.flip(x[0], axis=1) * 0.5
    probs = []
    for fl in (small, big, 0.5 * small):   # 3 "t-values" × 2 vals
        for v in (v0, v1):
            probs.append((v, xs + fl[0, ..., 0], ys + fl[0, ..., 1]))
    outs = fastwarp.splat_multi(probs)
    for (v, tx, ty), o in zip(probs, outs):
        ref = fastwarp.splat_at(v, tx, ty, planes_out=True)
        np.testing.assert_allclose(np.asarray(o), np.asarray(ref),
                                   atol=1e-5)


def test_splat_multi_coord_sharing(data):
    """FLDRX_TCOORDS machinery: problems given as (vals, base_idx, scale)
    with in-kernel coord reconstruction vs the plain splat_multi on the
    expanded coords. Same op order, but compilers may FMA-contract the
    in-kernel (iota + s·flow), so coords carry 1 ulp of freedom → one
    bf16 weight rounding on a ~0.1% pixel sprinkle; power-of-two scales
    make s·flow exact → those must be BITWISE equal. Origins, spill push
    and fixup tiers (the `big` base spills here) are shared machinery."""
    x, small, big = data
    H, W = 128, 192
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    v0 = x[0]
    v1 = jnp.flip(x[0], axis=1) * 0.5
    bases = [small[0], big[0]]
    scaled, plain = [], []
    # 0.5 is a power of two (exact s·flow → bitwise); 0.3/0.7 round
    for tv in (0.3, 0.5, 0.875):
        t = jnp.float32(tv)
        scaled.append((v0, 0, t))
        scaled.append((v1, 1, 1.0 - t))
        fl0 = t * bases[0]
        fl1 = (1.0 - t) * bases[1]
        plain.append((v0, xs + fl0[..., 0], ys + fl0[..., 1]))
        plain.append((v1, xs + fl1[..., 0], ys + fl1[..., 1]))
    outs_s = fastwarp.splat_multi(scaled, coord_bases=bases)
    outs_p = fastwarp.splat_multi(plain)
    for p, (o_s, o_p) in enumerate(zip(outs_s, outs_p)):
        a, b = np.asarray(o_s), np.asarray(o_p)
        if p in (2, 3):                      # t = 0.5: exact scales
            np.testing.assert_array_equal(a, b)
        else:
            # non-exact scales: 1-ulp coord freedom → bf16 weight rounding
            # on a pixel sprinkle in the kernel; on the spilling `big` base
            # the exact fixup recomputes whole tiles at the ulp-shifted
            # coords (f32-level ~1e-5 diffs across the spilled region)
            np.testing.assert_allclose(a, b, atol=5e-3)


def test_splat_multi_coord_sharing_tiled_vals(data):
    """coord_bases composed with vals_tiled (the synthesize_packed_multi
    configuration: tiled z/vals chain + in-kernel per-t coords). Power-of-
    two scales keep s·flow exact, so this one must be bitwise."""
    x, small, _ = data
    H, W = 128, 192
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    v0 = fastwarp._tile_flatten(x[0], H, W)
    v1 = fastwarp._tile_flatten(jnp.flip(x[0], axis=1) * 0.5, H, W)
    bases = [small[0], -small[0]]
    scaled, plain = [], []
    for tv in (0.25, 0.5):
        t = jnp.float32(tv)
        scaled += [(v0, 0, t), (v1, 1, 2.0 * t)]
        fl0 = t * bases[0]
        fl1 = (2.0 * t) * bases[1]
        plain += [(v0, xs + fl0[..., 0], ys + fl0[..., 1]),
                  (v1, xs + fl1[..., 0], ys + fl1[..., 1])]
    outs_s = fastwarp.splat_multi(scaled, vals_tiled=True, coord_bases=bases)
    outs_p = fastwarp.splat_multi(plain, vals_tiled=True)
    for o_s, o_p in zip(outs_s, outs_p):
        np.testing.assert_array_equal(np.asarray(o_s), np.asarray(o_p))


def test_splat_multi_plain_matches_single(data):
    """planes=False: the multi-problem strip sweep emits PLAIN rows (per-
    problem segments with boundary drains) — must equal per-problem
    splat_at, shared and distinct vals, spill-free and spilling flows."""
    x, small, big = data
    H, W = 128, 192
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    v0 = x[0]
    v1 = jnp.flip(x[0], axis=1) * 0.5
    probs = []
    for fl in (small, big):
        for v in (v0, v1):
            probs.append((v, xs + fl[0, ..., 0], ys + fl[0, ..., 1]))
    outs = fastwarp.splat_multi(probs, planes=False)
    for (v, tx, ty), o in zip(probs, outs):
        ref = fastwarp.splat_at(v, tx, ty)
        assert o.shape == ref.shape == (H, W, 3)
        np.testing.assert_allclose(np.asarray(o), np.asarray(ref),
                                   atol=1e-5)


def test_softsplat_fused_many_matches_per_problem(data):
    """The fused flow-recurrence feature-warp path (ONE plain multi-problem
    launch for all chunks of all problems) must match per-problem softmax
    splatting through the same kernels."""
    from fldrx.ops.splat import softsplat
    x, small, big = data
    rng = np.random.RandomState(11)
    feat = jnp.asarray(rng.rand(1, 128, 192, 7).astype(np.float32) * 2 - 1)
    z = jnp.asarray(rng.rand(1, 128, 192, 1).astype(np.float32) * 0.5)
    pairs = [(feat, small, z), (0.5 * feat, big, None)]
    outs = fastwarp.softsplat_fused_many(pairs)
    for (img, fl, zz), o in zip(pairs, outs):
        ref = softsplat(img, fl, zz, splat_fn=fastwarp.splat_sum_fast)
        np.testing.assert_allclose(np.asarray(o), np.asarray(ref),
                                   atol=1e-4)


def test_level_flow_fused_matches_chunked():
    """level_flow with the fused feature-warp launch (FLDRX_FLOW_FUSED
    path) must match the per-chunk splat path — same kernel math, one
    launch instead of 2×ceil(49/8)."""
    import jax as _jax
    from fldrx.config import papermodel
    from fldrx.model.fldrnet import init_params, level_flow

    cfg = papermodel().replace(fast_warp=True)
    params = init_params(_jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(13)
    feat = jnp.asarray(rng.rand(1, 128, 192, 96).astype(np.float32) - 0.5)
    prev = jnp.asarray(rng.randn(1, 64, 96, 4).astype(np.float32) * 2)
    a = level_flow(params["vfinet"], feat, prev, fast=True, fused=False)
    b = level_flow(params["vfinet"], feat, prev, fast=True, fused=True)
    c = level_flow(params["vfinet"], feat, prev, fast=False)
    # fused and chunked differ at bf16-kernel tolerance only (the weight
    # channel rides a cp=4/winx=128 tail chunk in the chunked path vs a
    # cp=8/winx=112 chunk fused — different window origins round the hat
    # weights differently; measured 9e-4 here, both ~2.3e-3 from exact)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-3)
    err_chunked = float(jnp.max(jnp.abs(a - c)))
    err_fused = float(jnp.max(jnp.abs(b - c)))
    assert err_fused < max(2 * err_chunked, float(TOL)), (err_fused,
                                                          err_chunked)


def test_gather_multi_matches_single(data):
    """The fused multi-problem gather (stacked source images, offset
    origins) must equal per-problem gather_at."""
    x, small, big = data
    H, W = 128, 192
    x2 = jnp.flip(x, axis=2)
    imgs = [x[0], x2[0]]
    probs = []
    for idx, fl in ((0, small), (1, big), (1, small)):
        sx, sy = fastwarp._sample_coords(fl[0], H, W)
        probs.append((idx, sx, sy, idx == 1))
    for planes in (False, True):
        outs = fastwarp.gather_multi(imgs, probs, planes_out=planes)
        for (idx, sx, sy, m), o in zip(probs, outs):
            ref = fastwarp.gather_at(imgs[idx], sx, sy, planes_out=planes,
                                     bwarp_mask=m)
            np.testing.assert_allclose(np.asarray(o), np.asarray(ref),
                                       atol=1e-5)


def test_gather_z_multi_matches_fallback(data):
    """The in-kernel z reduction (FLDRX_ZKERNEL path) must match the
    reference chain gather→mask→diff→abs→sum — spill-free AND spilling
    flows (spilled tiles resolve through the z-space exact fixup tiers)."""
    x, small, big = data
    H, W = 128, 192
    x2 = jnp.flip(x, axis=2)
    for fl in (small, big):
        sx1, sy1 = fastwarp._sample_coords(fl[0], H, W)
        sx0, sy0 = fastwarp._sample_coords(-fl[0], H, W)
        probs = [(1, sx1, sy1, x[0]), (0, sx0, sy0, x2[0])]
        zk = fastwarp.gather_z_multi([x[0], x2[0]], probs, use_kernel=True)
        zr = fastwarp.gather_z_multi([x[0], x2[0]], probs, use_kernel=False)
        for a, b in zip(zk, zr):
            assert a.shape == b.shape == ((H // fastwarp.GTILE)
                                          * (W // fastwarp.GTILE),
                                          fastwarp.GTILE ** 2)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3 * TOL)


def test_ones_mask_separable_matches_corner_sum():
    """ones_mask_sep (gx·gy closed form) vs the reference 4-corner weighted
    sum, on random coords plus dense sub-pixel bands at every frame border
    (where the factorization's ulp behavior matters)."""
    H, W = 48, 64
    rng = np.random.RandomState(7)
    coords = [rng.uniform(-4, W + 4, size=(256,)),
              np.linspace(-1.2, 0.2, 200),           # left band
              np.linspace(W - 1.2, W + 0.2, 200)]    # right band
    sx = jnp.asarray(np.concatenate(coords).astype(np.float32))[None, :]
    coords_y = [rng.uniform(-4, H + 4, size=(256,)),
                np.linspace(-1.2, 0.2, 200),
                np.linspace(H - 1.2, H + 0.2, 200)]
    sy = jnp.asarray(np.concatenate(coords_y).astype(np.float32))[:, None]
    sx = jnp.broadcast_to(sx, (656, 656))
    sy = jnp.broadcast_to(sy, (656, 656))

    def corner_sum(sx, sy):
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        fx = sx - x0
        fy = sy - y0

        def valid(xi, yi):
            return ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)).astype(
                jnp.float32)

        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        ones = (valid(x0i, y0i) * (1 - fx) * (1 - fy)
                + valid(x0i + 1, y0i) * fx * (1 - fy)
                + valid(x0i, y0i + 1) * (1 - fx) * fy
                + valid(x0i + 1, y0i + 1) * fx * fy)
        return (ones >= 0.999).astype(jnp.float32)

    got = np.asarray(fastwarp.ones_mask_sep(sx, sy, H, W))
    want = np.asarray(corner_sum(sx, sy))
    # disagreement allowed only within 2 ulp of the 0.999 threshold band
    gx = np.clip(np.minimum(np.asarray(sx) + 1, W - np.asarray(sx)), 0, 1)
    gy = np.clip(np.minimum(np.asarray(sy) + 1, H - np.asarray(sy)), 0, 1)
    band = np.abs(gx * gy - 0.999) < 1e-6
    np.testing.assert_array_equal(got[~band], want[~band])


def test_group_window_gather_matches_exact(data):
    """FLDRX_GWIN=group (one shared window DMA per K-tile grid step) must
    match the exact XLA gather — spill-free AND spilling flows (spills
    resolve through the exact fixup tiers), plain and planes/multi paths."""
    x, small, big = data
    H, W = 128, 192
    os.environ["FLDRX_GWIN"] = "group"
    importlib.reload(fastwarp)
    try:
        assert fastwarp._GWIN == "group"
        for fl in (small, big):
            np.testing.assert_allclose(fastwarp.bwarp_fast(x, fl),
                                       bwarp(x, fl), atol=TOL)
        # fused multi-problem launch with stacked images + offset origins
        x2 = jnp.flip(x, axis=2)
        imgs = [x[0], x2[0]]
        probs = []
        for idx, fl in ((0, small), (1, big)):
            sx, sy = fastwarp._sample_coords(fl[0], H, W)
            probs.append((idx, sx, sy, True))
        outs = fastwarp.gather_multi(imgs, probs, planes_out=True)
        for (idx, sx, sy, m), o in zip(probs, outs):
            ref = fastwarp.gather_at(imgs[idx], sx, sy, planes_out=True,
                                     bwarp_mask=m)
            np.testing.assert_allclose(np.asarray(o), np.asarray(ref),
                                       atol=TOL)
        # in-kernel z reduction through the group-window kernel variant
        zprobs = [(i, sx, sy, imgs[1 - i]) for i, sx, sy, _ in probs]
        zk = fastwarp.gather_z_multi(imgs, zprobs, use_kernel=True)
        zr = fastwarp.gather_z_multi(imgs, zprobs, use_kernel=False)
        for a, b in zip(zk, zr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3 * TOL)
    finally:
        os.environ.pop("FLDRX_GWIN", None)
        importlib.reload(fastwarp)


def test_pipe_bf16_close_to_exact(data):
    """FLDRX_PIPE_BF16=1 (wide weight pipelines in bf16) stays within a
    couple of extra roundings of the exact ops — gather and splat."""
    x, small, big = data
    os.environ["FLDRX_PIPE_BF16"] = "1"
    importlib.reload(fastwarp)
    try:
        assert fastwarp._PIPE_BF16
        for fl in (small, big):
            np.testing.assert_allclose(fastwarp.bwarp_fast(x, fl),
                                       bwarp(x, fl), atol=3 * TOL)
            np.testing.assert_allclose(fastwarp.splat_sum_fast(x, fl),
                                       splat_sum(x, fl), atol=3 * TOL)
    finally:
        os.environ.pop("FLDRX_PIPE_BF16", None)
        importlib.reload(fastwarp)


def test_gated_knob_composition(data):
    """All r3 gated kernel knobs TOGETHER (group windows + bf16 pipelines +
    in-kernel z + GK=16): the individual equivalence tests don't cover
    interactions, and the bench will run them composed if they all win."""
    x, small, big = data
    H, W = 128, 192
    x2 = jnp.flip(x, axis=2)
    for k, v in (("FLDRX_GWIN", "group"), ("FLDRX_PIPE_BF16", "1"),
                 ("FLDRX_ZKERNEL", "1"), ("FLDRX_GK", "16")):
        os.environ[k] = v
    importlib.reload(fastwarp)
    try:
        tol = 3 * TOL          # bf16 pipe adds ~2 roundings per tap
        for fl in (small, big):
            np.testing.assert_allclose(fastwarp.bwarp_fast(x, fl),
                                       bwarp(x, fl), atol=tol)
            np.testing.assert_allclose(fastwarp.splat_sum_fast(x, fl),
                                       splat_sum(x, fl), atol=tol)
        sx1, sy1 = fastwarp._sample_coords(small[0], H, W)
        sx0, sy0 = fastwarp._sample_coords(-small[0], H, W)
        probs = [(1, sx1, sy1, x[0]), (0, sx0, sy0, x2[0])]
        zk = fastwarp.gather_z_multi([x[0], x2[0]], probs, use_kernel=True)
        zr = fastwarp.gather_z_multi([x[0], x2[0]], probs, use_kernel=False)
        for a, b in zip(zk, zr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3 * tol)
    finally:
        for k in ("FLDRX_GWIN", "FLDRX_PIPE_BF16", "FLDRX_ZKERNEL",
                  "FLDRX_GK"):
            os.environ.pop(k, None)
        importlib.reload(fastwarp)


def test_fallback_on_odd_shapes():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(1, 30, 50, 3).astype(np.float32))
    fl = jnp.asarray(rng.randn(1, 30, 50, 2).astype(np.float32))
    np.testing.assert_allclose(fastwarp.bwarp_fast(x, fl), bwarp(x, fl),
                               atol=1e-6)


def test_splat_diff_gradients_match_xla():
    """custom VJP vs autodiff through the exact XLA scatter."""
    from fldrx.ops.splat import splat_sum
    rng = np.random.RandomState(10)
    B, H, W, C = 1, 64, 64, 3
    inp = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    flow = jnp.asarray((rng.rand(B, H, W, 2) * 6 + 0.2).astype(np.float32))
    cot = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))

    def loss_fast(i, f):
        return jnp.vdot(fastwarp.splat_sum_diff(i, f), cot)

    def loss_ref(i, f):
        return jnp.vdot(splat_sum(i, f), cot)

    gi_f, gf_f = jax.grad(loss_fast, (0, 1))(inp, flow)
    gi_r, gf_r = jax.grad(loss_ref, (0, 1))(inp, flow)
    np.testing.assert_allclose(np.asarray(gi_f), np.asarray(gi_r), atol=TOL)
    np.testing.assert_allclose(np.asarray(gf_f), np.asarray(gf_r),
                               atol=TOL * 10)


def test_bwarp_diff_gradients_match_xla():
    from fldrx.ops.warp import bwarp
    rng = np.random.RandomState(11)
    B, H, W, C = 1, 64, 64, 3
    x = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    flow = jnp.asarray((rng.rand(B, H, W, 2) * 6 + 0.2).astype(np.float32))
    cot = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))

    for wm in (True, False):
        def loss_fast(i, f):
            return jnp.vdot(fastwarp.bwarp_diff(i, f, wm), cot)

        def loss_ref(i, f):
            return jnp.vdot(bwarp(i, f, wm), cot)

        gi_f, gf_f = jax.grad(loss_fast, (0, 1))(x, flow)
        gi_r, gf_r = jax.grad(loss_ref, (0, 1))(x, flow)
        np.testing.assert_allclose(np.asarray(gi_f), np.asarray(gi_r),
                                   atol=TOL)
        np.testing.assert_allclose(np.asarray(gf_f), np.asarray(gf_r),
                                   atol=TOL * 10)
