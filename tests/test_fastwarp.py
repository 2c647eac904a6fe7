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


def test_splat_ywin_matches_exact(data, monkeypatch):
    """FLDRX_SPLAT_YWIN=1 (factored-placement u-plane splat): the
    [_YWIN, N] window matmul + one-hot placement must match the exact
    splat within the fast path's tolerance — including under large
    divergent flows (the tighter window pushes more tiles to the exact
    fixup tiers) — and the fused multi must match per-problem splat_at."""
    x, small, big = data
    H, W = 128, 192
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    monkeypatch.setenv("FLDRX_SPLAT_YWIN", "1")
    for fl in (small, big):
        tx = xs + fl[0, ..., 0]
        ty = ys + fl[0, ..., 1]
        out = fastwarp.splat_at(x[0], tx, ty, planes_out=True)
        plain = np.asarray(_unplanes(out[None], 4))[0, ..., :3]
        ref = np.asarray(splat_sum(x, fl))[0]
        np.testing.assert_allclose(plain, ref, atol=TOL)
    probs = [(x[0], xs + fl[0, ..., 0], ys + fl[0, ..., 1])
             for fl in (small, big)]
    outs = fastwarp.splat_multi(probs)
    for (v, tx, ty), o in zip(probs, outs):
        ref = fastwarp.splat_at(v, tx, ty, planes_out=True)
        np.testing.assert_allclose(np.asarray(o), np.asarray(ref),
                                   atol=1e-5)
    # plain-layout kernel under the gate (flow-stage feature warps)
    for fl in (small, big):
        np.testing.assert_allclose(fastwarp.splat_sum_fast(x, fl),
                                   splat_sum(x, fl), atol=TOL)
    plains = fastwarp.splat_multi(probs, planes=False)
    for (v, tx, ty), o in zip(probs, plains):
        ref = fastwarp.splat_at(v, tx, ty, planes_out=False)
        np.testing.assert_allclose(np.asarray(o), np.asarray(ref),
                                   atol=1e-5)


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


def test_gather_z_multi_matches_chain(data):
    """gather_z_multi (one fused launch + XLA reduce) must match the
    explicit chain gather→mask→diff→abs→sum — spill-free AND spilling
    flows (spilled tiles resolve through the exact fixup tiers)."""
    x, small, big = data
    H, W = 128, 192
    x2 = jnp.flip(x, axis=2)
    for fl in (small, big):
        sx1, sy1 = fastwarp._sample_coords(fl[0], H, W)
        sx0, sy0 = fastwarp._sample_coords(-fl[0], H, W)
        probs = [(1, sx1, sy1, x[0]), (0, sx0, sy0, x2[0])]
        zk = fastwarp.gather_z_multi([x[0], x2[0]], probs)
        for (idx, sx, sy, self_img), a in zip(probs, zk):
            g = fastwarp.gather_at([x[0], x2[0]][idx], sx, sy,
                                   bwarp_mask=True)
            z = jnp.sum(jnp.abs(self_img - g), axis=-1)
            b = fastwarp._tile_flatten(z[..., None], H, W,
                                       tile=fastwarp.GTILE)[..., 0]
            assert a.shape == ((H // fastwarp.GTILE)
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
