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


def test_fallback_on_odd_shapes():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(1, 30, 50, 3).astype(np.float32))
    fl = jnp.asarray(rng.randn(1, 30, 50, 2).astype(np.float32))
    np.testing.assert_allclose(fastwarp.bwarp_fast(x, fl), bwarp(x, fl),
                               atol=1e-6)
