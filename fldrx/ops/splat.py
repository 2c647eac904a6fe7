"""Softmax splatting (forward warp) — TPU-native scatter-add.

Parity target: the reference's CUDA softsplat (softSplat.py:12-158 kernels,
:220-361 wrapper). Each source pixel bilinearly scatter-adds `input * w_corner`
into the 4 integer neighbours of (x,y)+flow; the softmax wrapper shifts the
input to [0,1], appends an importance channel exp(z) (or 1), splats, divides by
the splatted importance (0→1) and rescales to [-1,1].

TPU-first notes:
  * The CUDA kernel resolves write races with `atomicAdd` (nondeterministic
    float accumulation). XLA's scatter-add on TPU is deterministic — parity
    tests tolerate the reference's nondeterminism, not reproduce it
    (SURVEY.md §5.2).
  * The op is linear in `input`, so JAX autodiff gives the exact
    gradient-as-gather of the CUDA backward kernels for free; the flow
    gradient flows through the bilinear corner weights exactly as in
    kernel_Softsplat_updateGradFlow. No custom_vjp needed for correctness.
  * The Pallas warp engine (fldrx/ops/fastwarp.py) replaces this on the hot
    4K path; this XLA version is the strict-parity reference, the portable
    fallback, and the default autodiff path.

Layout: NHWC input, flow [B,H,W,2] (x-disp, y-disp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["splat_sum", "softsplat"]


def splat_sum(inp: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Raw summation splat: out[yy,xx] += inp[y,x] * bilinear_w, 4 corners.

    Exact semantics of kernel_Softsplat_updateOutput (softSplat.py:12-52):
    corners outside the frame are dropped.
    """
    B, H, W, C = inp.shape
    cd = inp.dtype
    fx = jnp.arange(W, dtype=flow.dtype)[None, None, :] + flow[..., 0]
    fy = jnp.arange(H, dtype=flow.dtype)[None, :, None] + flow[..., 1]
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    tx = (fx - x0).astype(cd)[..., None]   # [B,H,W,1]
    ty = (fy - y0).astype(cd)[..., None]

    corners = (
        (x0i,     y0i,     (1 - tx) * (1 - ty)),   # NW
        (x0i + 1, y0i,     tx * (1 - ty)),          # NE
        (x0i,     y0i + 1, (1 - tx) * ty),          # SW
        (x0i + 1, y0i + 1, tx * ty),                # SE
    )

    N = H * W

    def scatter_one(flat_out, xi, yi, w):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)   # [B,H,W]
        upd = inp * (w * valid[..., None].astype(cd))               # [B,H,W,C]
        upd = upd.reshape(B, N, C)
        idx = idx.reshape(B, N)

        def per_batch(o, i, u):
            return o.at[i].add(u, mode="drop")

        return jax.vmap(per_batch)(flat_out, idx, upd)

    out = jnp.zeros((B, N, C), dtype=cd)
    for xi, yi, w in corners:
        out = scatter_one(out, xi, yi, w)
    return out.reshape(B, H, W, C)


def softsplat(img: jnp.ndarray, flow: jnp.ndarray, z: jnp.ndarray | None = None,
              splat_fn=None) -> jnp.ndarray:
    """Softmax-splatting wrapper, parity with FunctionSoftsplat 'softmax' mode
    (softSplat.py:320-352):

        inp01 = (img + 1) / 2
        m     = exp(z)            (or 1 when z is None)
        s     = splat([inp01 * m, m], flow)
        norm  = s[..., -1:];  norm[norm == 0] = 1
        out   = (s[..., :-1] / norm - 0.5) * 2

    `z` is [B,H,W,1] (importance metric); `splat_fn` lets the Pallas kernel be
    injected for the hot path.
    """
    if splat_fn is None:
        splat_fn = splat_sum
    B, H, W, C = img.shape
    inp01 = (img + 1.0) * 0.5
    if z is None:
        m = jnp.ones((B, H, W, 1), dtype=img.dtype)
        weighted = inp01
    else:
        m = jnp.exp(z.astype(img.dtype))
        weighted = inp01 * m
    s = splat_fn(jnp.concatenate([weighted, m], axis=-1), flow)
    norm = s[..., -1:]
    norm = jnp.where(norm == 0.0, jnp.ones_like(norm), norm)
    out = s[..., :-1] / norm
    return (out - 0.5) * 2.0
