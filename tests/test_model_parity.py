"""End-to-end parity: the JAX fLDRnet with converted checkpoint weights vs the
CPU-torch oracle of the reference forward, on small random frames."""

import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from fldrx.config import papermodel, apply_test_scales
from fldrx.model.fldrnet import forward_test, init_params
from fldrx.ops.resize import resize_2d
from fldrx.tools.convert_ckpt import (DEFAULT_SRC, load_reference_state_dict,
                                      state_dict_to_params)
from reference_oracle import oracle_forward_test

CKPT = DEFAULT_SRC
needs_ckpt = pytest.mark.skipif(not os.path.exists(CKPT),
                                reason="reference checkpoint not available")


def build_pyramids(frames_nchw, scales, S):
    """frames_nchw: [B,3,2,H,W] numpy. Returns (torch-layout list, jax-layout
    list) of per-level pyramids built with the fldrx bicubic resize (itself
    golden-tested against torch)."""
    B, C, T, H, W = frames_nchw.shape
    x = jnp.asarray(np.transpose(frames_nchw, (0, 2, 3, 4, 1)))  # [B,2,H,W,C]
    pyr_jax, pyr_torch = [], []
    for i, s in enumerate(scales[:S + 1]):
        f = 8 / s
        lev = x if i == 0 else resize_2d(
            x.reshape(B * T, H, W, C), (int(H * f), int(W * f)), "bicubic"
        ).reshape(B, T, int(H * f), int(W * f), C)
        pyr_jax.append(lev)
        pyr_torch.append(np.transpose(np.asarray(lev), (0, 4, 1, 2, 3)))
    return pyr_torch, pyr_jax


@needs_ckpt
@pytest.mark.parametrize("t_val", [0.5, 0.125])
def test_forward_parity_with_checkpoint(t_val):
    sd, _ = load_reference_state_dict(CKPT)
    sd_t = {k: torch.from_numpy(v) for k, v in sd.items()}
    params_np, _ = state_dict_to_params(sd)
    import jax
    params = jax.tree.map(jnp.asarray, params_np)

    cfg = apply_test_scales(papermodel(), 5).replace(S_tst=2)
    # S_tst=2 keeps the test fast but exercises bottom + recurrent + synthesis
    rng = np.random.RandomState(0)
    B, H, W = 1, 128, 192
    base = rng.rand(B, 3, 1, H // 4, W // 4) * 2 - 1
    up = torch.nn.functional.interpolate(
        torch.from_numpy(base[:, :, 0]), size=(H, W), mode="bicubic",
        align_corners=False).numpy()
    # two frames: smooth image and a shifted copy (a plausible motion pair)
    f0 = up
    f1 = np.roll(up, shift=3, axis=-1)
    frames = np.stack([f0, f1], axis=2).astype(np.float32)  # [B,3,2,H,W]

    pyr_t, pyr_j = build_pyramids(frames, cfg.scales, cfg.S_tst)
    t = np.full((B, 1), t_val, np.float32)

    ref = oracle_forward_test(sd_t, pyr_t, t, cfg.S_tst)
    # strict-parity path: fast_warp=False (exact XLA warps, full-res flowback)
    got = forward_test(params, cfg.replace(fast_warp=False), pyr_j,
                       jnp.asarray(t))
    got_nchw = np.moveaxis(np.asarray(got), -1, 1)

    assert got_nchw.shape == ref.shape
    diff = np.abs(got_nchw - ref)
    # f32-vs-f64 PCA + conv accumulation-order tolerance; outputs are in [-1,1]
    assert diff.max() < 5e-3, f"max diff {diff.max()}"
    assert diff.mean() < 5e-4, f"mean diff {diff.mean()}"

    # fast path (low-res flowback composition; exact-op fallbacks on CPU):
    # bounded drift vs the oracle — full PSNR deltas recorded in PARITY.md
    got_fast = forward_test(params, cfg, pyr_j, jnp.asarray(t))
    dfast = np.abs(np.moveaxis(np.asarray(got_fast), -1, 1) - ref)
    assert dfast.max() < 5e-2, f"fast-path max diff {dfast.max()}"
    assert dfast.mean() < 2e-3, f"fast-path mean diff {dfast.mean()}"


@needs_ckpt
def test_forward_train_shapes():
    sd, _ = load_reference_state_dict(CKPT)
    params_np, _ = state_dict_to_params(sd)
    import jax
    from fldrx.model.fldrnet import forward_train
    params = jax.tree.map(jnp.asarray, params_np)
    cfg = papermodel().replace(S_trn=2, S_tst=2, phase="train")
    rng = np.random.RandomState(1)
    B, H, W = 2, 64, 64
    frames = (rng.rand(B, 3, 2, H, W) * 2 - 1).astype(np.float32)
    pyr_t, pyr_j = build_pyramids(frames, cfg.scales, cfg.S_trn)
    t = np.full((B, 1), 0.5, np.float32)
    out = forward_train(params, cfg, pyr_j, jnp.asarray(t))
    assert len(out["out_pyramid"]) == 3
    assert out["out_pyramid"][0].shape == (B, H, W, 3)
    assert out["out_pyramid"][1].shape == (B, H // 2, W // 2, 3)
    assert out["flow_refine_pyramid"][0].shape == (B, H // 8, W // 8, 4)
    assert out["occ_0"].shape == (B, H, W, 1)
    assert all(np.isfinite(np.asarray(o)).all() for o in out["out_pyramid"])


def test_init_params_forward_runs():
    """Random-init model must run the full test forward (no checkpoint)."""
    import jax
    cfg = papermodel().replace(S_tst=1)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(2)
    B, H, W = 1, 64, 64
    frames = (rng.rand(B, 3, 2, H, W) * 2 - 1).astype(np.float32)
    _, pyr_j = build_pyramids(frames, cfg.scales, cfg.S_tst)
    out = forward_test(params, cfg, pyr_j, jnp.full((B, 1), 0.5))
    assert out.shape == (B, H, W, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_synthesize_packed_matches_fast(monkeypatch):
    """The packed-domain synthesis is the plain fast path under a layout
    permutation; the only numeric difference is scalar-t multiplication
    order through the linear resize (boundary-pixel corner flips), so the
    deviation PSNR must stay above 90 dB.

    Pins FLDRX_Z_HALFRES=0: this test is the LAYOUT contract, so both
    sides must use the same (full-res) z policy — the half-res z default
    (r5) only changes flow_extras' z, and its quality budget is covered by
    the goldenclip pins."""
    monkeypatch.setenv("FLDRX_Z_HALFRES", "0")
    import jax
    from fldrx.model.fldrnet import (can_use_packed, flow_extras,
                                     init_params, synthesize,
                                     synthesize_packed)

    cfg = papermodel().replace(fast_warp=True, packed_synth=True)
    params = init_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.RandomState(5)
    B, H, W = 1, 768, 1024
    images = jnp.asarray((rng.rand(B, 2, H, W, 3) * 2 - 1).astype(np.float32))
    flow_l = jnp.asarray((rng.rand(B, H // 8, W // 8, 4) * 6 - 3)
                         .astype(np.float32))
    t = jnp.full((B, 1), 0.375, jnp.float32)
    assert can_use_packed(flow_l, images)

    out_plain, fr_p, _, _ = synthesize(params["vfinet"], flow_l, images, t,
                                       fast=True)
    extras = flow_extras(params, cfg, flow_l, images)
    assert len(extras) == 8
    out_packed, fr_q, _, _ = synthesize_packed(params["vfinet"], flow_l,
                                               images, t, precomputed=extras)
    np.testing.assert_array_equal(np.asarray(fr_p), np.asarray(fr_q))
    mse = float(np.mean((np.asarray(out_plain - out_packed) / 2) ** 2))
    psnr = -10 * np.log10(max(mse, 1e-30))
    assert psnr > 90.0, psnr


def test_synthesize_packed_multi_matches_single():
    """The cross-t fused chunk program is per-problem identical to the
    single-t packed synthesis — same launches, same math, so the outputs
    must be bitwise equal for every t in the chunk."""
    import jax
    from fldrx.model.fldrnet import (flow_extras, init_params,
                                     synthesize_packed,
                                     synthesize_packed_multi)

    cfg = papermodel().replace(fast_warp=True, packed_synth=True)
    params = init_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.RandomState(7)
    B, H, W = 1, 256, 320
    images = jnp.asarray((rng.rand(B, 2, H, W, 3) * 2 - 1).astype(np.float32))
    flow_l = jnp.asarray((rng.rand(B, H // 8, W // 8, 4) * 6 - 3)
                         .astype(np.float32))
    extras = flow_extras(params, cfg, flow_l, images)
    ts = [jnp.full((B, 1), tv, jnp.float32) for tv in (0.25, 0.625, 0.875)]
    multi = synthesize_packed_multi(params["vfinet"], flow_l, images, ts,
                                    precomputed=extras)
    for t, (out_m, fr_m, _, _) in zip(ts, multi):
        out_s, fr_s, _, _ = synthesize_packed(params["vfinet"], flow_l,
                                              images, t, precomputed=extras)
        np.testing.assert_array_equal(np.asarray(fr_s), np.asarray(fr_m))
        np.testing.assert_array_equal(np.asarray(out_s), np.asarray(out_m))


def test_synthesize_packed_planes_out_is_pure_layout():
    """planes_out=True returns the u-plane form whose host unpack
    (ops.repack.planes_to_plain_np) is bit-equal to the interleaved
    device output."""
    import jax
    from fldrx.model.fldrnet import (flow_extras, init_params,
                                     synthesize_packed_multi)
    from fldrx.ops.repack import planes_to_plain_np

    cfg = papermodel().replace(fast_warp=True, packed_synth=True)
    params = init_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.RandomState(9)
    B, H, W = 1, 256, 320
    images = jnp.asarray((rng.rand(B, 2, H, W, 3) * 2 - 1).astype(np.float32))
    flow_l = jnp.asarray((rng.rand(B, H // 8, W // 8, 4) * 6 - 3)
                         .astype(np.float32))
    extras = flow_extras(params, cfg, flow_l, images)
    ts = [jnp.full((B, 1), tv, jnp.float32) for tv in (0.25, 0.875)]
    plain = synthesize_packed_multi(params["vfinet"], flow_l, images, ts,
                                    precomputed=extras)
    planes = synthesize_packed_multi(params["vfinet"], flow_l, images, ts,
                                     precomputed=extras, planes_out=True)
    for (out_p, _, _, _), (out_q, _, _, _) in zip(plain, planes):
        assert out_q.shape == (B, 4, H // 4, W * 3)
        np.testing.assert_array_equal(
            np.asarray(out_p), planes_to_plain_np(np.asarray(out_q)))


def test_blend24_softmax_algebra_matches_grouped():
    """The fast path's 24-minor blend softmax (stability max over all 24 —
    constant within each group of 6, so each group softmax is unchanged up
    to ~ulp exponent scaling — and the group denominator via a
    block-diagonal ones [24,24] matmul) must match the plain (4,6)
    jax.nn.softmax to float-roundoff. This is the ONLY blend form the
    packed path ships (adopted r4: 4.583 vs 4.577 fps); `synthesize`
    keeps the reference arithmetic."""
    import jax

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 7, 9, 24).astype(np.float32) * 3)
    ref = jax.nn.softmax(x.reshape(2, 7, 9, 4, 6), axis=-1)
    G24 = jnp.asarray(np.kron(np.eye(4, dtype=np.float32),
                              np.ones((6, 6), np.float32)))
    e = jnp.exp(x - jnp.max(x, axis=-1, keepdims=True))
    denom = jnp.einsum("bhwq,qr->bhwr", e, G24,
                       precision=jax.lax.Precision.HIGHEST)
    got = (e / denom).reshape(2, 7, 9, 4, 6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-7, rtol=2e-6)
def test_refine_unet_s2d_matches_plain():
    """Space-to-depth UNet is a weight-exact repacking of refine_unet:
    outputs match to float-roundoff at any %4 shape."""
    import jax
    import jax.numpy as jnp
    from fldrx.config import papermodel
    from fldrx.model.fldrnet import init_params, refine_unet, refine_unet_s2d

    cfg = papermodel()
    params = init_params(jax.random.PRNGKey(2), cfg)
    rp = params["vfinet"]["refine"]
    rng = np.random.RandomState(0)
    for H, W in ((32, 48), (64, 64)):
        x = jnp.asarray(rng.rand(2, H, W, cfg.unet_in).astype(np.float32) * 2 - 1)
        a = np.asarray(refine_unet(rp, x))
        b = np.asarray(refine_unet_s2d(rp, x))
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)
