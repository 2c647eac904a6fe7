"""Padding helpers matching the reference driver's test-time padding.

The reference reflect-pads H,W up to (2^S_tst)*8 divisibility on the
bottom/right only (main.py:842-849, run_on_your_images.py:127-134).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["pad_to_divisible", "pad_amount"]


def pad_amount(size: int, div: int) -> int:
    return (div - size % div) % div


def pad_to_divisible(x: jnp.ndarray, div: int, mode: str = "reflect"):
    """Pad [..., H, W, C] on bottom/right so H and W are multiples of `div`.

    Returns (padded, (H_orig, W_orig)). torch F.pad 'reflect' == jnp.pad
    'reflect' (no edge repeat).
    """
    H, W = x.shape[-3], x.shape[-2]
    ph, pw = pad_amount(H, div), pad_amount(W, div)
    if ph == 0 and pw == 0:
        return x, (H, W)
    pad_width = [(0, 0)] * (x.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
    mode = {"reflect": "reflect", "constant": "constant"}[mode]
    return jnp.pad(x, pad_width, mode=mode), (H, W)
