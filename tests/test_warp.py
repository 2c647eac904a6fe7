"""Golden tests: fldrx.ops.warp.bwarp vs the reference bwarp semantics
(torch grid_sample with the 2*p/(S-1)-1 normalisation, fLDRnet.py:546-581)."""

import numpy as np
import torch
import torch.nn as nn

import jax.numpy as jnp

from fldrx.ops.warp import bwarp


def torch_bwarp(x, flo, withmask=True):
    """Reference bwarp re-expressed for CPU torch (fLDRnet.py:546-581)."""
    B, C, H, W = x.size()
    xx = torch.arange(0, W).view(1, 1, 1, W).expand(B, 1, H, W)
    yy = torch.arange(0, H).view(1, 1, H, 1).expand(B, 1, H, W)
    grid = torch.cat((xx, yy), 1).float()
    vgrid = grid + flo
    vgrid[:, 0, :, :] = 2.0 * vgrid[:, 0, :, :].clone() / max(W - 1, 1) - 1.0
    vgrid[:, 1, :, :] = 2.0 * vgrid[:, 1, :, :].clone() / max(H - 1, 1) - 1.0
    vgrid = vgrid.permute(0, 2, 3, 1)
    output = nn.functional.grid_sample(x, vgrid, align_corners=False)
    mask = torch.ones(x.size())
    mask = nn.functional.grid_sample(mask, vgrid, align_corners=False)
    mask = mask.masked_fill_(mask < 0.999, 0)
    mask = mask.masked_fill_(mask > 0, 1)
    return output * mask if withmask else output


def test_bwarp_matches_reference_semantics():
    rng = np.random.RandomState(0)
    B, H, W, C = 2, 24, 31, 3
    x = rng.randn(B, H, W, C).astype(np.float32)
    flow = (rng.randn(B, H, W, 2) * 3).astype(np.float32)

    ref = torch_bwarp(
        torch.from_numpy(np.moveaxis(x, -1, 1).copy()),
        torch.from_numpy(np.moveaxis(flow, -1, 1).copy()),
    ).numpy()
    got = np.asarray(bwarp(jnp.asarray(x), jnp.asarray(flow)))
    np.testing.assert_allclose(np.moveaxis(got, -1, 1), ref, rtol=1e-4, atol=1e-5)


def test_bwarp_zero_flow_near_identity():
    # zero flow: sampling grid is p*S/(S-1)-0.5, i.e. NOT identity — assert the
    # torch oracle agrees on this subtlety too.
    rng = np.random.RandomState(1)
    x = rng.randn(1, 16, 16, 1).astype(np.float32)
    flow = np.zeros((1, 16, 16, 2), np.float32)
    ref = torch_bwarp(
        torch.from_numpy(np.moveaxis(x, -1, 1).copy()),
        torch.from_numpy(np.moveaxis(flow, -1, 1).copy()),
    ).numpy()
    got = np.asarray(bwarp(jnp.asarray(x), jnp.asarray(flow)))
    np.testing.assert_allclose(np.moveaxis(got, -1, 1), ref, rtol=1e-4, atol=1e-5)


def test_bwarp_no_mask():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 12, 12, 2).astype(np.float32)
    flow = (rng.randn(1, 12, 12, 2) * 5).astype(np.float32)
    ref = torch_bwarp(
        torch.from_numpy(np.moveaxis(x, -1, 1).copy()),
        torch.from_numpy(np.moveaxis(flow, -1, 1).copy()),
        withmask=False,
    ).numpy()
    got = np.asarray(bwarp(jnp.asarray(x), jnp.asarray(flow), with_mask=False))
    np.testing.assert_allclose(np.moveaxis(got, -1, 1), ref, rtol=1e-4, atol=1e-5)
