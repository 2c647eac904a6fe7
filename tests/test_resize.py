"""Golden tests: fldrx resize vs torch.nn.functional.interpolate (CPU).

The reference relies on torch's align_corners=False bicubic/bilinear in ~10
places; these tests pin our matmul-based resize to torch bit-for-bit (within
f32 accumulation tolerance) across the scale factors the model actually uses.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from fldrx.ops.resize import resize_2d


def _torch_resize(x_nhwc, out_hw, mode, align_corners):
    t = torch.from_numpy(np.moveaxis(x_nhwc, -1, 1)).double()
    kw = {} if mode == "nearest" else {"align_corners": align_corners}
    y = F.interpolate(t, size=out_hw, mode=mode, **kw)
    return np.moveaxis(y.numpy(), 1, -1)


CASES = [
    # (H, W, out_h, out_w) — the pyramid scale factors: 1/2,1/4,...,×2,×8
    (64, 96, 32, 48),
    (64, 96, 16, 24),
    (64, 96, 8, 12),
    (32, 48, 64, 96),
    (16, 24, 128, 192),   # ×8 flow upscale
    (17, 23, 40, 56),     # non-integer ratios
    (8, 8, 64, 64),
]


@pytest.mark.parametrize("mode", ["bicubic", "bilinear", "nearest"])
@pytest.mark.parametrize("case", CASES)
def test_resize_matches_torch(mode, case):
    H, W, oh, ow = case
    rng = np.random.RandomState(0)
    x = rng.randn(2, H, W, 3).astype(np.float32)
    ref = _torch_resize(x, (oh, ow), mode, False)
    got = np.asarray(resize_2d(jnp.asarray(x), (oh, ow), mode, False))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_resize_identity():
    x = np.random.RandomState(1).randn(1, 16, 16, 2).astype(np.float32)
    got = np.asarray(resize_2d(jnp.asarray(x), (16, 16), "bicubic"))
    np.testing.assert_array_equal(got, x)


def test_resize_matches_torch_scale_factor_chain():
    """The driver builds the pyramid with scale_factor=8/s_i on 256-divisible
    sizes (main.py:855-856) — exactness there is the parity-critical case."""
    H, W = 256, 512
    x = np.random.RandomState(2).randn(1, H, W, 3).astype(np.float32)
    for s in (16, 32, 64, 128, 256):
        f = 8 / s
        oh, ow = int(H * f), int(W * f)
        ref = _torch_resize(x, (oh, ow), "bicubic", False)
        got = np.asarray(resize_2d(jnp.asarray(x), (oh, ow), "bicubic", False))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
