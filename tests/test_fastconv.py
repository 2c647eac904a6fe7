"""Pallas pixel-rows conv tests (interpret mode on CPU)."""

import importlib
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module", autouse=True)
def _interpret_mode():
    os.environ["FLDRX_PALLAS_INTERPRET"] = "1"
    from fldrx.ops import fastconv
    importlib.reload(fastconv)
    yield
    os.environ.pop("FLDRX_PALLAS_INTERPRET", None)
    from fldrx.ops import fastconv
    importlib.reload(fastconv)


def test_conv3x3_pixrows_matches_lax():
    from fldrx.ops import fastconv

    rng = np.random.RandomState(0)
    for (H, W, Cin, K) in ((16, 24, 8, 4), (8, 8, 3, 5)):
        x = jnp.asarray(rng.randn(2, H, W, Cin).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, Cin, K).astype(np.float32) * 0.2)
        b = jnp.asarray(rng.randn(K).astype(np.float32))
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST) + b
        got = fastconv.conv3x3_pixrows(x, w, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-2, rtol=1e-2)  # bf16 operands


def test_conv3x3_pixrows_unet_shapes():
    """The packed-UNet layer shapes flow through (small spatial analog)."""
    from fldrx.ops import fastconv

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 16, 32, 26).astype(np.float32) * 0.3)
    w = jnp.asarray(rng.randn(3, 3, 26, 16).astype(np.float32) * 0.1)
    b = jnp.zeros((16,), np.float32)
    out = fastconv.conv3x3_pixrows(x, w, b)
    assert out.shape == (1, 16, 32, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_conv3x3_align16_bitwise(monkeypatch):
    """FLDRX_CONV_ALIGN=16 (bf16-tile-aligned ky tap offsets) must be
    bitwise equal to the align=8 default: the extra row-width columns are
    zero pad that never reaches a kept output (crop to W)."""
    from fldrx.ops import fastconv

    rng = np.random.RandomState(3)
    # W chosen so align=8 and align=16 give DIFFERENT padded widths
    x = jnp.asarray(rng.randn(1, 16, 30, 20).astype(np.float32) * 0.3)
    w = jnp.asarray(rng.randn(3, 3, 20, 8).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(8).astype(np.float32))
    monkeypatch.delenv("FLDRX_CONV_ALIGN", raising=False)
    a = np.asarray(fastconv.conv3x3_pixrows(x, w, b))
    monkeypatch.setenv("FLDRX_CONV_ALIGN", "16")
    c = np.asarray(fastconv.conv3x3_pixrows(x, w, b))
    np.testing.assert_array_equal(a, c)


def test_conv3x3_kx_xla_mode_bitwise(monkeypatch):
    """FLDRX_CONV_KX=xla (kx shift-adds as an XLA epilogue) must be bitwise
    equal to the in-kernel form: same ky-summed f32 accumulator, same kx
    add order, same bias/cast — only where the adds run differs."""
    from fldrx.ops import fastconv

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 16, 30, 20).astype(np.float32) * 0.3)
    w = jnp.asarray(rng.randn(3, 3, 20, 8).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(8).astype(np.float32))
    monkeypatch.setenv("FLDRX_CONV_KX", "kernel")
    a = np.asarray(fastconv.conv3x3_pixrows(x, w, b))
    monkeypatch.setenv("FLDRX_CONV_KX", "xla")
    c = np.asarray(fastconv.conv3x3_pixrows(x, w, b))
    np.testing.assert_array_equal(a, c)
