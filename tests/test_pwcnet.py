"""PWC-Net component tests: cost-volume oracle, deconv parity with torch,
full-forward shape/finiteness, converter key-map round trip."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from fldrx.model.pwcnet import (_backward_warp_pwc, _deconv4x4s2,
                                init_pwc_params, pwc_forward,
                                get_bidirectional_flow)
from fldrx.ops.correlation import correlation_cost_volume


def numpy_cost_volume(f1, f2, d=4):
    B, H, W, C = f1.shape
    out = np.zeros((B, H, W, (2 * d + 1) ** 2), np.float64)
    f2p = np.pad(f2, [(0, 0), (d, d), (d, d), (0, 0)])
    k = 0
    for dy in range(-d, d + 1):
        for dx in range(-d, d + 1):
            sh = f2p[:, dy + d:dy + d + H, dx + d:dx + d + W]
            out[..., k] = (f1 * sh).mean(-1)
            k += 1
    return out


def test_cost_volume_matches_oracle():
    rng = np.random.RandomState(0)
    f1 = rng.randn(2, 12, 14, 8).astype(np.float32)
    f2 = rng.randn(2, 12, 14, 8).astype(np.float32)
    ref = numpy_cost_volume(f1, f2)
    got = np.asarray(correlation_cost_volume(jnp.asarray(f1), jnp.asarray(f2)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    # zero-displacement channel (k=40) equals mean(f1*f2)
    np.testing.assert_allclose(got[..., 40], (f1 * f2).mean(-1),
                               rtol=1e-5, atol=1e-6)


def test_deconv_matches_torch():
    rng = np.random.RandomState(1)
    cin, cout = 3, 2
    x = rng.randn(1, 8, 10, cin).astype(np.float32)
    w_t = rng.randn(cin, cout, 4, 4).astype(np.float32)   # torch [in,out,kh,kw]
    b = rng.randn(cout).astype(np.float32)
    ref = F.conv_transpose2d(
        torch.from_numpy(np.moveaxis(x, -1, 1).copy()),
        torch.from_numpy(w_t), torch.from_numpy(b), stride=2, padding=1).numpy()
    from fldrx.model.pwcnet import deconv_weight_from_torch
    p = {"w": jnp.asarray(deconv_weight_from_torch(w_t)), "b": jnp.asarray(b)}
    got = np.moveaxis(np.asarray(_deconv4x4s2(p, jnp.asarray(x))), -1, 1)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_pwc_backward_warp_matches_torch():
    """Decoder.Backward uses a strict >0.999 mask on a linspace grid
    (PWCNet.py:146-177)."""
    rng = np.random.RandomState(2)
    B, H, W, C = 1, 10, 12, 4
    x = rng.randn(B, H, W, C).astype(np.float32)
    flow = (rng.randn(B, H, W, 2) * 2).astype(np.float32)

    # torch oracle per reference semantics
    tx = torch.from_numpy(np.moveaxis(x, -1, 1).copy())
    tf = torch.from_numpy(np.moveaxis(flow, -1, 1).copy())
    hor = torch.linspace(-1.0, 1.0, W).view(1, 1, 1, W).expand(B, -1, H, -1)
    ver = torch.linspace(-1.0, 1.0, H).view(1, 1, H, 1).expand(B, -1, -1, W)
    grid = torch.cat([hor, ver], 1)
    nf = torch.cat([tf[:, 0:1] / ((W - 1.0) / 2.0),
                    tf[:, 1:2] / ((H - 1.0) / 2.0)], 1)
    inp = torch.cat([tx, torch.ones(B, 1, H, W)], 1)
    out = F.grid_sample(inp, (grid + nf).permute(0, 2, 3, 1),
                        mode="bilinear", padding_mode="zeros",
                        align_corners=False)
    mask = out[:, -1:]
    mask = (mask > 0.999).float()
    ref = (out[:, :-1] * mask).numpy()

    got = np.moveaxis(np.asarray(
        _backward_warp_pwc(jnp.asarray(x), jnp.asarray(flow))), -1, 1)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_pwc_forward_shapes():
    params = init_pwc_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(3)
    im0 = rng.rand(1, 96, 128, 3).astype(np.float32)
    im1 = rng.rand(1, 96, 128, 3).astype(np.float32)
    flow = pwc_forward(params, jnp.asarray(im0), jnp.asarray(im1))
    assert flow.shape == (1, 96, 128, 2)
    assert np.isfinite(np.asarray(flow)).all()
    bi = get_bidirectional_flow(params, jnp.asarray(im0), jnp.asarray(im1))
    assert bi.shape == (1, 96, 128, 4)


def test_pwc_forward_non64_divisible():
    params = init_pwc_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(4)
    im = rng.rand(1, 100, 150, 3).astype(np.float32)
    flow = pwc_forward(params, jnp.asarray(im), jnp.asarray(im))
    assert flow.shape == (1, 100, 150, 2)


def _synth_pwc_state_dict(rng):
    """Synthetic torch state dict shaped like the reference PWCNet
    (OpticalFlow/PWCNet.py:24-252) — the converter tests' shared fixture."""
    from fldrx.model.pwcnet import _DECODER_IN, _LEVEL_CHANNELS

    sd = {}

    def add_conv(name, ci, co, k=3):
        # fan-in scaled: unit-variance weights explode through the deep
        # lrelu chain and NaN the forward smoke check
        sd[f"{name}.weight"] = torch.from_numpy(
            (rng.randn(co, ci, k, k) / np.sqrt(ci * k * k)).astype(np.float32))
        sd[f"{name}.bias"] = torch.from_numpy(
            (rng.randn(co) * 0.01).astype(np.float32))

    def add_deconv(name, ci, co):
        sd[f"{name}.weight"] = torch.from_numpy(
            (rng.randn(ci, co, 4, 4) / np.sqrt(ci * 16)).astype(np.float32))
        sd[f"{name}.bias"] = torch.from_numpy(
            (rng.randn(co) * 0.01).astype(np.float32))

    names = ("One", "Two", "Thr", "Fou", "Fiv", "Six")
    cin = 3
    for nm, cout in zip(names, _LEVEL_CHANNELS):
        add_conv(f"moduleExtractor.module{nm}.0", cin, cout)
        add_conv(f"moduleExtractor.module{nm}.2", cout, cout)
        add_conv(f"moduleExtractor.module{nm}.4", cout, cout)
        cin = cout
    for nm, level in (("Two", 2), ("Thr", 3), ("Fou", 4), ("Fiv", 5),
                      ("Six", 6)):
        cur = _DECODER_IN[level]
        if level < 6:
            prev = _DECODER_IN[level + 1]
            add_deconv(f"module{nm}.moduleUpflow", 2, 2)
            add_deconv(f"module{nm}.moduleUpfeat",
                       prev + 128 + 128 + 96 + 64 + 32, 2)
        widths = [(cur, 128), (cur + 128, 128), (cur + 256, 96),
                  (cur + 352, 64), (cur + 416, 32), (cur + 448, 2)]
        for sub, (ci, co) in zip(("One", "Two", "Thr", "Fou", "Fiv", "Six"),
                                 widths):
            add_conv(f"module{nm}.module{sub}.0", ci, co)
    rin = 81 + 32 + 2 + 2 + 128 + 128 + 96 + 64 + 32
    for i, (ci, co) in zip((0, 2, 4, 6, 8, 10, 12),
                           [(rin, 128), (128, 128), (128, 128), (128, 96),
                            (96, 64), (64, 32), (32, 2)]):
        add_conv(f"moduleRefiner.moduleMain.{i}", ci, co)
    return sd


def test_pwc_converter_roundtrip(tmp_path):
    """convert_pwc_checkpoint key-map round trip on a synthetic torch state
    dict shaped like the reference PWCNet (OpticalFlow/PWCNet.py:24-252):
    the converted pytree must match init_pwc_params structurally, with conv
    weights OIHW->HWIO transposed and deconv weights flipped/transposed."""
    from fldrx.model.pwcnet import convert_pwc_checkpoint

    sd = _synth_pwc_state_dict(np.random.RandomState(0))
    path = str(tmp_path / "pwc-synth.pt")
    torch.save(sd, path)
    p = convert_pwc_checkpoint(path)

    # structure matches a fresh init exactly (treedef + leaf shapes)
    ref = init_pwc_params(jax.random.PRNGKey(0))
    ref_paths = {str(k): np.shape(v) for k, v in
                 jax.tree_util.tree_leaves_with_path(ref)}
    got_paths = {str(k): np.shape(v) for k, v in
                 jax.tree_util.tree_leaves_with_path(p)}
    assert ref_paths == got_paths

    # value spot-checks: conv OIHW->HWIO
    w_t = sd["moduleExtractor.moduleOne.0.weight"].numpy()
    np.testing.assert_array_equal(p["extractor"]["level0"][0]["w"],
                                  np.transpose(w_t, (2, 3, 1, 0)))
    # deconv: flipped spatially, (kh, kw, in_ct, out_ct)
    w_d = sd["moduleTwo.moduleUpflow.weight"].numpy()
    np.testing.assert_array_equal(
        p["dec2"]["upflow"]["w"],
        np.flip(w_d, (2, 3)).transpose(2, 3, 0, 1))
    # converted params drive the forward pass (shapes flow through)
    im = np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32)
    fl = pwc_forward(p, jnp.asarray(im), jnp.asarray(im))
    assert fl.shape == (1, 64, 64, 2)
    assert np.isfinite(np.asarray(fl)).all()


def test_pwc_converter_cli_npz(tmp_path):
    """The convert_ckpt --pwc branch (tools/convert_ckpt.py): .pt → .npz →
    load_params_npz must round-trip the teacher pytree bit-exactly
    (reference blob: useful.py:110 './OpticalFlow/pwc-checkpoint.pt')."""
    from fldrx.tools.convert_ckpt import convert_pwc, load_params_npz

    sd = _synth_pwc_state_dict(np.random.RandomState(2))
    src = str(tmp_path / "pwc-synth.pt")
    torch.save(sd, src)
    dst = str(tmp_path / "pwc.npz")
    assert convert_pwc(src, dst) == dst
    p, extras, meta = load_params_npz(dst)
    assert not extras and not meta
    ref = init_pwc_params(jax.random.PRNGKey(0))
    ref_paths = {str(k): np.shape(v) for k, v in
                 jax.tree_util.tree_leaves_with_path(ref)}
    got_paths = {str(k): np.shape(v) for k, v in
                 jax.tree_util.tree_leaves_with_path(p)}
    assert ref_paths == got_paths
    w_t = sd["moduleExtractor.moduleOne.0.weight"].numpy()
    np.testing.assert_array_equal(p["extractor"]["level0"][0]["w"],
                                  np.transpose(w_t, (2, 3, 1, 0)))


def test_correlation_pallas_matches_xla():
    """Pallas cost-volume kernel (interpret mode on CPU) == XLA unroll."""
    import os
    os.environ["FLDRX_PALLAS_INTERPRET"] = "1"
    import importlib
    from fldrx.ops import correlation as corr
    importlib.reload(corr)
    try:
        rng = np.random.RandomState(5)
        f1 = jnp.asarray(rng.randn(2, 16, 24, 12).astype(np.float32))
        f2 = jnp.asarray(rng.randn(2, 16, 24, 12).astype(np.float32))
        a = np.asarray(corr.correlation_cost_volume(f1, f2))
        b = np.asarray(corr.correlation_cost_volume_pallas(f1, f2))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
        # gradient path routes through the XLA formulation
        g = jax.grad(lambda x: jnp.sum(
            corr.correlation_cost_volume_pallas(x, f2) ** 2))(f1)
        g_ref = jax.grad(lambda x: jnp.sum(
            corr.correlation_cost_volume(x, f2) ** 2))(f1)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-5)
    finally:
        del os.environ["FLDRX_PALLAS_INTERPRET"]
        importlib.reload(corr)
