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
