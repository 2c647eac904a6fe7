"""Tests for inventory-completeness extras: pca_inverse, loss variants,
flow visualization, diagnostics."""

import numpy as np

import jax
import jax.numpy as jnp

from fldrx.ops.block_pca import (blocks_from_images, fit_block_pca,
                                 pca_inverse)
from fldrx.train.losses import (distillation_loss, orthogonality_loss,
                                smoothness_loss, warping_loss,
                                warping_loss_endflow)
from fldrx.eval.visualize import flow_to_image, make_color_wheel, pyramid_grid


def test_tb_event_writer_roundtrip(tmp_path):
    """The dependency-free TensorBoard writer produces records our own
    parser (CRC-checked TFRecord framing + Event proto) reads back; the
    file carries the brain.Event:2 version header first."""
    from fldrx.utils.tbevents import EventWriter, read_events

    w = EventWriter(str(tmp_path))
    w.add_scalar("Loss/train", 0.5, step=1)
    w.add_scalars({"Loss/train": 0.25, "PSNR/val": 33.5}, step=2)
    w.close()
    got = read_events(w.path)
    assert got[0] == (1, {"Loss/train": 0.5})
    assert got[1][0] == 2
    assert abs(got[1][1]["PSNR/val"] - 33.5) < 1e-6
    with open(w.path, "rb") as f:
        raw = f.read()
    assert b"brain.Event:2" in raw[:64]


def test_pca_inverse_roundtrip():
    rng = np.random.RandomState(0)
    img = rng.randn(64, 96)                    # 96 blocks ≥ 64 → full rank
    st = fit_block_pca(img[None], 64)
    blocks = np.asarray(blocks_from_images(jnp.asarray(img), 8))
    t = (blocks.reshape(-1, 64) - st.mean) @ st.eigenvectors.T
    rec = pca_inverse(jnp.asarray(t.reshape(8, 12, 64)),
                      jnp.asarray(st.mean), jnp.asarray(st.eigenvectors))
    np.testing.assert_allclose(np.asarray(rec), img, atol=1e-4)


def test_pca_inverse_lossy():
    rng = np.random.RandomState(1)
    img = rng.randn(32, 48) * 0.2
    st = fit_block_pca(img[None], 16)
    blocks = np.asarray(blocks_from_images(jnp.asarray(img), 8))
    t = (blocks.reshape(-1, 64) - st.mean) @ st.eigenvectors.T
    rec = np.asarray(pca_inverse(jnp.asarray(t.reshape(4, 6, 16)),
                                 jnp.asarray(st.mean),
                                 jnp.asarray(st.eigenvectors)))
    assert rec.shape == img.shape
    # top-16 PCA reconstruction correlates strongly with the input
    assert np.corrcoef(rec.ravel(), img.ravel())[0, 1] > 0.4


def test_orthogonality_loss_zero_for_orthonormal():
    st = fit_block_pca(np.random.RandomState(2).randn(2, 32, 32), 16)
    v = float(orthogonality_loss(jnp.asarray(st.eigenvectors)))
    assert v < 1e-10
    bad = jnp.ones((4, 8))
    assert float(orthogonality_loss(bad)) > 1.0


def test_loss_variants_finite():
    rng = np.random.RandomState(3)
    frames = jnp.asarray(rng.rand(2, 2, 32, 32, 3).astype(np.float32))
    gt = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    flow = jnp.asarray(rng.randn(2, 32, 32, 4).astype(np.float32))
    endflow = (flow[..., :2], flow[..., 2:])
    for v in (smoothness_loss(flow, gt),
              warping_loss(frames, flow),
              warping_loss_endflow(frames, gt, endflow)):
        assert np.isfinite(float(v)) and float(v) >= 0


def test_distillation_loss_runs():
    rng = np.random.RandomState(4)
    pyr = [jnp.asarray(rng.randn(1, 8 * (2 ** -0 if i == 0 else 1), 8, 4)
                       .astype(np.float32)) for i in range(2)]
    pyr = [jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32)),
           jnp.asarray(rng.randn(1, 4, 4, 4).astype(np.float32))]
    gtflow = jnp.asarray(rng.randn(1, 64, 64, 4).astype(np.float32))
    v = float(distillation_loss(pyr, gtflow))
    assert np.isfinite(v) and v > 0


def test_flow_visualization():
    wheel = make_color_wheel()
    assert wheel.shape == (55, 3)
    flow = np.zeros((16, 16, 2), np.float32)
    flow[..., 0] = 3.0
    img = flow_to_image(flow)
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
    # uniform flow → uniform color
    assert (img == img[0, 0]).all()


def test_pyramid_grid():
    rng = np.random.RandomState(5)
    preds = [jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32)),
             jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32))]
    flows = [jnp.asarray(rng.randn(2, 4, 4, 4).astype(np.float32))]
    target = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
    grid = pyramid_grid(preds, flows, np.asarray(target))
    assert grid.dtype == np.uint8
    assert grid.shape == (32, 16 * 4, 3)      # 2 rows x (2 preds+1 flow+1 gt)


def test_pca_diagnostics_tool():
    from fldrx.tools.pca_diagnostics import reconstruction_psnr, sweep
    rng = np.random.RandomState(6)
    yy, xx = np.mgrid[0:64, 0:64]
    img = np.sin(xx / 5.0) * 100 + 128 + rng.randn(64, 64)
    p, _ = reconstruction_psnr(img, 8, 16)
    assert p > 25


def test_checkpoint_ev_reconstruction():
    """The shipped learned EV basis reconstructs natural-ish content well —
    the reference's checkpoint-EV reconstruction diagnostic
    (pca_comp.py:680-770)."""
    import os
    import pytest

    from fldrx.tools.pca_diagnostics import checkpoint_ev_reconstruction

    ckpt = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "checkpoints", "fldrnet_best.npz")
    if not os.path.exists(ckpt):
        pytest.skip("converted checkpoint unavailable")
    yy, xx = np.mgrid[0:256, 0:256]
    img = (np.sin(xx / 23.0) * np.cos(yy / 31.0) * 90 + 128
           + np.sin((xx + yy) / 57.0) * 30)
    psnrs = checkpoint_ev_reconstruction([img], ckpt_npz=ckpt)
    # 16-of-64 learned components keep smooth content nearly lossless
    assert psnrs[0] > 30.0, psnrs
