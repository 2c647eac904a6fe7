"""Golden tests: block-PCA feature extraction vs a torch re-expression of the
reference's to_pca_diff (pca_comp.py:473-528), including the exact channel
ordering contract that the trained conv weights depend on."""

import numpy as np
import torch
import torch.nn as nn

import jax.numpy as jnp

from fldrx.ops.block_pca import block_pca_features, blocks_from_images, fit_block_pca


def torch_to_pca_diff(im, wiS, comps, mean, EV, mean_vec):
    """Reference to_pca_diff re-expressed for CPU torch (pca_comp.py:473-528).
    im: [chan, H, W] f32; mean [64] f64; EV [comps,64] f64; mean_vec [comps]."""
    chan, height, width = im.shape
    blocks_y = height // wiS
    blocks_x = width // wiS
    imtem = torch.as_tensor(im).unsqueeze(0)
    toblock = nn.Unfold(kernel_size=wiS, stride=wiS)
    imtem = toblock(imtem).squeeze(0)
    blocked = (
        imtem.reshape(-1, blocks_y, blocks_x)
        .permute(0, 2, 1)
        .reshape(chan, wiS ** 2, blocks_x, blocks_y)
        .permute(0, 2, 3, 1)
        .reshape(chan, blocks_x, blocks_y, wiS, wiS)
    )
    pca_ready = blocked.reshape(-1, wiS * wiS)
    loc = pca_ready - mean
    tr = torch.matmul(loc, EV.permute(1, 0))
    tr = tr / mean_vec
    tr = tr.reshape(chan, blocks_x, blocks_y, comps).permute(0, 3, 2, 1)
    tr = tr.reshape(-1, blocks_y, blocks_x)
    mi, ma = torch.min(tr), torch.max(tr)
    tr = (tr - mi) / (ma - mi)
    return tr * 2 - 1


def test_blocks_row_major():
    x = np.arange(16 * 24, dtype=np.float32).reshape(16, 24)
    b = np.asarray(blocks_from_images(jnp.asarray(x), 8))
    assert b.shape == (2, 3, 64)
    # first block row-major: rows 0..7 of cols 0..7
    np.testing.assert_array_equal(b[0, 0], x[:8, :8].reshape(-1))
    np.testing.assert_array_equal(b[1, 2], x[8:16, 16:24].reshape(-1))


def test_block_pca_matches_reference_channels():
    rng = np.random.RandomState(0)
    B, H, W, C = 2, 32, 48, 3
    nf, wiS = 16, 8
    frames = np.tanh(rng.randn(B, 2, H, W, C)).astype(np.float32)
    mean = rng.randn(64)
    EV = rng.randn(nf, 64)
    mean_vec = np.abs(rng.randn(nf)) + 0.5

    # reference path: [B,C,T,H,W] reshaped to [B*C*T, H, W] (chan = b*6+c*2+t),
    # output reshaped to [B, 6*nf, h, w]
    im = np.moveaxis(frames, -1, 1)          # [B,2,H,W,C]->[B,2,C?]... careful
    # frames is [B,T,H,W,C]; reference layout is [B,C,T,H,W]
    im = np.transpose(frames, (0, 4, 1, 2, 3)).reshape(B * C * 2, H, W)
    ref = torch_to_pca_diff(
        torch.from_numpy(im).double(), wiS, nf,
        torch.from_numpy(mean), torch.from_numpy(EV), torch.from_numpy(mean_vec),
    )
    ref = ref.reshape(B, C * 2 * nf, H // wiS, W // wiS).numpy()

    got = block_pca_features(
        jnp.asarray(frames), jnp.asarray(mean), jnp.asarray(EV),
        jnp.asarray(mean_vec), wiS=wiS, compute_dtype=jnp.float64,
    )
    got = np.moveaxis(np.asarray(got), -1, 1)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-8)

    # f32 path stays within the documented tolerance of the f64 reference
    got32 = block_pca_features(
        jnp.asarray(frames), jnp.asarray(mean), jnp.asarray(EV),
        jnp.asarray(mean_vec), wiS=wiS, compute_dtype=jnp.float32,
    )
    got32 = np.moveaxis(np.asarray(got32), -1, 1)
    np.testing.assert_allclose(got32, ref, rtol=1e-3, atol=2e-4)


def test_fit_block_pca_reconstruction():
    """PCA fit sanity: with n_components=64 the transform is invertible; with
    16 components reconstruction error decreases vs 4 components."""
    rng = np.random.RandomState(1)
    imgs = rng.randn(4, 32, 32) * 0.3
    st_full = fit_block_pca(imgs, 64)
    blocks = np.asarray(blocks_from_images(jnp.asarray(imgs), 8)).reshape(-1, 64)
    c = blocks - st_full.mean
    rec = (c @ st_full.eigenvectors.T) @ st_full.eigenvectors + st_full.mean
    np.testing.assert_allclose(rec, blocks, atol=1e-8)

    def rec_err(k):
        st = fit_block_pca(imgs, k)
        t = (blocks - st.mean) @ st.eigenvectors.T
        r = t @ st.eigenvectors + st.mean
        return np.mean((r - blocks) ** 2)

    assert rec_err(16) < rec_err(4)
    # orthonormal eigenvectors
    st16 = fit_block_pca(imgs, 16)
    np.testing.assert_allclose(st16.eigenvectors @ st16.eigenvectors.T,
                               np.eye(16), atol=1e-10)


def test_multi_scale_pca_machinery():
    """exac_one_ev=False consumes per-scale PCA params (pick_pca
    non-simpleEVs surface, fLDRnet.py:225-278): per-level features use the
    level's own EV set and differ from the shared scale-8 path."""
    import jax
    from fldrx.config import papermodel
    from fldrx.eval.pipeline import build_pyramid
    from fldrx.model.fldrnet import extract_features, init_params

    cfg = papermodel().replace(S_tst=1, exac_one_ev=False)
    params = init_params(jax.random.PRNGKey(0), cfg)
    assert "pca_multi" in params and "s16" in params["pca_multi"]
    rng = np.random.RandomState(0)
    frames = jnp.asarray((rng.rand(1, 2, 64, 64, 3) * 2 - 1).astype(np.float32))
    pyr = build_pyramid(frames, cfg, 2)

    # distinct s16 params -> level-1 features change, level-0 unchanged.
    # (the perturbation must survive the global min-max normalisation: a
    # uniform EV scale or mean shift cancels out — roll the components)
    p2 = jax.tree.map(lambda x: x, params)
    p2["pca_multi"]["s16"] = {
        "mean": params["pca"]["mean"],
        "ev": jnp.roll(params["pca"]["ev"], 1, axis=0),
        "mean_vec": params["pca"]["mean_vec"],
    }
    f_a = extract_features(params, cfg, pyr, 2)
    f_b = extract_features(p2, cfg, pyr, 2)
    np.testing.assert_allclose(np.asarray(f_a[0]), np.asarray(f_b[0]),
                               atol=1e-6)
    assert np.abs(np.asarray(f_a[1]) - np.asarray(f_b[1])).max() > 1e-3

    # one-EV config ignores pca_multi entirely
    cfg1 = cfg.replace(exac_one_ev=True)
    f_c = extract_features(params, cfg1, pyr, 2)
    f_d = extract_features(p2, cfg1, pyr, 2)
    np.testing.assert_allclose(np.asarray(f_c[1]), np.asarray(f_d[1]),
                               atol=1e-6)


def test_fit_pca_multi_from_batch():
    from fldrx.config import papermodel
    from fldrx.train.loop import fit_pca_from_batch

    cfg = papermodel().replace(exac_one_ev=False)
    rng = np.random.RandomState(1)
    frames = (rng.rand(2, 2, 128, 128, 3) * 2 - 1).astype(np.float32)
    out = fit_pca_from_batch(frames, cfg)
    assert set(out) == {"pca", "pca_multi"}
    assert set(out["pca_multi"]) == {"s8", "s16", "s32", "s64"}
    for v in out["pca_multi"].values():
        assert v["ev"].shape == (cfg.dctvfi_nf, cfg.wiS ** 2)
    # one-EV: only the shared fit
    out1 = fit_pca_from_batch(frames, papermodel())
    assert set(out1) == {"pca"}


def test_block_pca_sumky_layout_equivalent(monkeypatch):
    """FLDRX_PCA_LAYOUT=sumky (transpose-free ky-sum formulation) computes
    the same affine map as the legacy blocked einsum — only the f32
    summation association differs (~ulp)."""
    from fldrx.ops import block_pca as bp

    rng = np.random.RandomState(7)
    frames = jnp.asarray(rng.randn(2, 2, 48, 64, 3).astype(np.float32) * 0.5)
    mean = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    ev = jnp.asarray(rng.randn(16, 64).astype(np.float32) * 0.3)
    mv = jnp.asarray(np.abs(rng.randn(16)).astype(np.float32) + 0.5)
    monkeypatch.delenv("FLDRX_PCA_LAYOUT", raising=False)
    a = np.asarray(bp.block_pca_features(frames, mean, ev, mv))
    monkeypatch.setenv("FLDRX_PCA_LAYOUT", "sumky")
    b = np.asarray(bp.block_pca_features(frames, mean, ev, mv))
    np.testing.assert_allclose(a, b, atol=2e-6)


def test_block_pca_per_item_minmax():
    """per_item_minmax=True: B=1 is bitwise-identical to the default, and a
    B=2 batch reproduces each item's standalone (B=1) features exactly —
    the contract that makes pair-batched eval parity-safe."""
    from fldrx.ops import block_pca as bp

    rng = np.random.RandomState(11)
    frames = jnp.asarray(rng.randn(2, 2, 48, 64, 3).astype(np.float32) * 0.5)
    mean = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    ev = jnp.asarray(rng.randn(16, 64).astype(np.float32) * 0.3)
    mv = jnp.asarray(np.abs(rng.randn(16)).astype(np.float32) + 0.5)
    one = frames[0:1]
    base = np.asarray(bp.block_pca_features(one, mean, ev, mv))
    per1 = np.asarray(bp.block_pca_features(one, mean, ev, mv,
                                            per_item_minmax=True))
    np.testing.assert_array_equal(base, per1)
    batched = np.asarray(bp.block_pca_features(frames, mean, ev, mv,
                                               per_item_minmax=True))
    for i in range(2):
        solo = np.asarray(bp.block_pca_features(frames[i:i + 1], mean, ev, mv))
        np.testing.assert_array_equal(batched[i:i + 1], solo)
