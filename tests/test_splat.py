"""Golden tests for softmax splatting against a NumPy oracle of the CUDA
kernel semantics (softSplat.py:12-52 forward; :320-352 softmax wrapper), plus
gradient checks mirroring the backward kernels (gather for grad-input,
dW/dflow·input·gradOut for grad-flow)."""

import numpy as np

import jax
import jax.numpy as jnp

from fldrx.ops.splat import splat_sum, softsplat


def numpy_splat_sum(inp, flow):
    """Oracle: per-pixel 4-corner bilinear scatter-add (NHWC)."""
    B, H, W, C = inp.shape
    out = np.zeros_like(inp, dtype=np.float64)
    for b in range(B):
        for y in range(H):
            for x in range(W):
                ox = x + flow[b, y, x, 0]
                oy = y + flow[b, y, x, 1]
                x0, y0 = int(np.floor(ox)), int(np.floor(oy))
                for (xi, yi, w) in [
                    (x0, y0, (x0 + 1 - ox) * (y0 + 1 - oy)),
                    (x0 + 1, y0, (ox - x0) * (y0 + 1 - oy)),
                    (x0, y0 + 1, (x0 + 1 - ox) * (oy - y0)),
                    (x0 + 1, y0 + 1, (ox - x0) * (oy - y0)),
                ]:
                    if 0 <= xi < W and 0 <= yi < H:
                        out[b, yi, xi, :] += inp[b, y, x, :] * w
    return out


def numpy_softsplat(img, flow, z=None):
    """Oracle for FunctionSoftsplat softmax mode (softSplat.py:330-352)."""
    inp01 = (img + 1) / 2
    m = np.exp(z) if z is not None else np.ones(img.shape[:3] + (1,), img.dtype)
    s = numpy_splat_sum(np.concatenate([inp01 * m, m], -1), flow)
    norm = s[..., -1:].copy()
    norm[norm == 0.0] = 1.0
    return (s[..., :-1] / norm - 0.5) * 2


def test_splat_sum_matches_oracle():
    rng = np.random.RandomState(0)
    B, H, W, C = 2, 9, 11, 3
    inp = rng.randn(B, H, W, C).astype(np.float32)
    flow = (rng.randn(B, H, W, 2) * 2.5).astype(np.float32)
    ref = numpy_splat_sum(inp, flow)
    got = np.asarray(splat_sum(jnp.asarray(inp), jnp.asarray(flow)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_softsplat_matches_oracle():
    rng = np.random.RandomState(1)
    B, H, W, C = 1, 8, 10, 3
    img = np.tanh(rng.randn(B, H, W, C)).astype(np.float32)
    flow = (rng.randn(B, H, W, 2) * 2).astype(np.float32)
    z = (rng.randn(B, H, W, 1) * 0.5).astype(np.float32)
    ref = numpy_softsplat(img, flow, z)
    got = np.asarray(softsplat(jnp.asarray(img), jnp.asarray(flow), jnp.asarray(z)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    ref0 = numpy_softsplat(img, flow, None)
    got0 = np.asarray(softsplat(jnp.asarray(img), jnp.asarray(flow), None))
    np.testing.assert_allclose(got0, ref0, rtol=1e-4, atol=1e-5)


def test_splat_grads_match_finite_differences():
    """The CUDA backward kernels implement the exact analytic gradient of the
    forward scatter; JAX autodiff through our scatter must agree with finite
    differences of the forward (and hence with the CUDA kernels)."""
    rng = np.random.RandomState(2)
    B, H, W, C = 1, 6, 7, 2
    inp = rng.randn(B, H, W, C).astype(np.float64)
    # keep flow away from integer lattice so floor() is locally constant
    flow = (rng.rand(B, H, W, 2) * 2 + 0.2).astype(np.float64)
    cot = rng.randn(B, H, W, C).astype(np.float64)

    def f(i, fl):
        return jnp.vdot(splat_sum(i, fl), jnp.asarray(cot))

    g_inp, g_flow = jax.grad(f, argnums=(0, 1))(jnp.asarray(inp), jnp.asarray(flow))

    eps = 1e-6
    for _ in range(5):
        b, y, x, c = (rng.randint(B), rng.randint(H), rng.randint(W), rng.randint(C))
        d = np.zeros_like(inp); d[b, y, x, c] = eps
        fd = (numpy_splat_sum(inp + d, flow) - numpy_splat_sum(inp - d, flow))
        fd = (fd * cot).sum() / (2 * eps)
        np.testing.assert_allclose(np.asarray(g_inp)[b, y, x, c], fd, rtol=1e-4, atol=1e-6)

    for _ in range(5):
        b, y, x, c = (rng.randint(B), rng.randint(H), rng.randint(W), rng.randint(2))
        d = np.zeros_like(flow); d[b, y, x, c] = eps
        fd = (numpy_splat_sum(inp, flow + d) - numpy_splat_sum(inp, flow - d))
        fd = (fd * cot).sum() / (2 * eps)
        np.testing.assert_allclose(np.asarray(g_flow)[b, y, x, c], fd, rtol=1e-4, atol=1e-6)
