"""Learned block-PCA ("fLDR") feature extraction — the paper's core idea.

Parity targets:
  * `to_pca_diff` (reference pca_comp.py:473-528): the in-graph transform run
    every forward — 8×8 blocking, (x-Mean)@EVᵀ, /meanVec, global min-max to
    [-1,1].
  * `to_pca` + `MYPCA.fit` (pca_comp.py:370-470, useful.py:40-101): the
    one-time PCA fit on the first training batch (SVD of centred blocks).

TPU-first notes:
  * Blocking is a reshape/transpose (space-to-depth); the projection is a
    [N,64]@[64,16] matmul → MXU. The reference computes this in float64
    (learned EV/Mean parameters are f64, useful.py:66-75); TPU has no native
    f64, so we compute in f32 (config.compute_dtype) with a documented
    tolerance (SURVEY.md §7 hard-part 3).
  * The global min-max normalisation (pca_comp.py:521-526) reduces over the
    ENTIRE batch tensor — under pjit with a sharded batch, jnp.min/jnp.max
    lower to all-reduces automatically, keeping sharded and unsharded results
    identical (SURVEY.md §7 hard-part 4).

Channel-order contract (checkpoint parity): the reference reshapes
[B,3,2,H,W] → [B*6,H,W] (chan index = c*2+t) before to_pca_diff and reshapes
the result to [B, 6*nf, h, w], so feature channel = c*32 + t*16 + comp. The
downstream split feat_x.reshape(B,2,48,...) (fLDRnet.py:368) therefore MIXES
frames between the two halves — a reference quirk the trained conv weights
bake in. We reproduce exactly: see `block_pca_features`.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["block_pca_features", "fit_block_pca", "PCAState", "blocks_from_images"]


@dataclasses.dataclass
class PCAState:
    """Result of the one-time PCA fit (MYPCA equivalent, useful.py:40-101)."""
    mean: np.ndarray        # [64]
    eigenvectors: np.ndarray  # [n_comp, 64]
    mean_vec: np.ndarray    # [n_comp] — mean |component| (pca_comp.py:427)
    eigenvalues: np.ndarray | None = None


def blocks_from_images(x: jnp.ndarray, wiS: int = 8) -> jnp.ndarray:
    """[..., H, W] → [..., hb, wb, wiS*wiS] with (ky,kx) row-major flattening.

    Matches the reference's nn.Unfold + reshape dance (pca_comp.py:490-499):
    each row is one wiS×wiS block read row-major.
    """
    *lead, H, W = x.shape
    hb, wb = H // wiS, W // wiS
    x = x.reshape(*lead, hb, wiS, wb, wiS)
    # [..., hb, wiS, wb, wiS] -> [..., hb, wb, wiS, wiS]
    x = jnp.moveaxis(x, -3, -2)
    return x.reshape(*lead, hb, wb, wiS * wiS)


def block_pca_features(frames: jnp.ndarray, mean: jnp.ndarray, ev: jnp.ndarray,
                       mean_vec: jnp.ndarray, wiS: int = 8,
                       compute_dtype=jnp.float32,
                       per_item_minmax: bool = False) -> jnp.ndarray:
    """to_pca_diff equivalent.

    frames: [B, 2, H, W, C] in [-1,1] (two input frames, NHWC)
    mean:   [wiS²]   ev: [nf, wiS²]   mean_vec: [nf]
    returns [B, H/wiS, W/wiS, C*2*nf] with channel = c*(2*nf) + t*nf + comp,
    globally min-max normalised to [-1,1] over the whole output tensor
    (including the batch axis — reference pca_comp.py:521-526).

    per_item_minmax: reduce min/max per batch item instead of batch-wide.
    Bitwise-identical at B=1 (min/max are order-independent); at B>1 it is
    what the reference computes when fed the same items one at a time
    (eval uses batch=1, main.py:132-151) — the switch exists so
    pair-batched eval (several independent frame pairs in one program)
    reproduces per-pair reference outputs exactly.
    """
    B, T, H, W, C = frames.shape
    assert T == 2
    cd = compute_dtype
    x = frames.astype(cd)
    nf = ev.shape[0]
    hb, wb = H // wiS, W // wiS
    if os.environ.get("FLDRX_PCA_LAYOUT", "legacy") == "sumky":
        # Transpose-free formulation (measurement gate): the legacy path
        # pays two image-scale relayouts per level (NHWC→channel-major, then
        # the block moveaxis — the class of 4K transposes PROFILE.md prices
        # at 10-35 ms each). Here every reshape is a free minor-dim split:
        # the blocks' ky axis is peeled as 8 row-slices and each contributes
        # ONE [.., wiS·C] @ [wiS·C, C·nf] block-diagonal matmul (the kx taps
        # and the channel-preserving identity live in the weight). Same
        # affine map as (block − mean)@EVᵀ distributed over the sum — f32
        # HIGHEST either way; only the summation association differs (~ulp).
        evr = ev.astype(cd).reshape(nf, wiS, wiS)        # [n, ky, kx]
        eyeC = jnp.eye(C, dtype=cd)
        proj = None
        x6 = x.reshape(B, T, hb, wiS, wb, wiS * C)
        for ky in range(wiS):
            xk = x6[:, :, :, ky]                         # [B,T,hb,wb,wiS*C]
            # Wk[(kx*C + c), (c2*nf + n)] = evr[n, ky, kx] · δ(c, c2)
            wk = (evr[:, ky, :].T[:, None, None, :]      # [kx, 1, 1, n]
                  * eyeC[None, :, :, None])              # → [kx, c, c2, n]
            wk = wk.reshape(wiS * C, C * nf)
            p = jax.lax.dot_general(xk, wk, (((4,), (0,)), ((), ())),
                                    precision=jax.lax.Precision.HIGHEST)
            proj = p if proj is None else proj + p       # [B,T,hb,wb,C*nf]
        mproj = jnp.einsum("k,nk->n", mean.astype(cd), ev.astype(cd),
                           precision=jax.lax.Precision.HIGHEST)
        proj = proj - jnp.tile(mproj, C)
        proj = proj / jnp.tile(mean_vec.astype(cd), C)
        # channel (c2*nf + n) per t → target c*(2·nf) + t*nf + n: one
        # feature-grid-scale transpose (≈ H·W/64 elements — cheap)
        feat = jnp.transpose(proj.reshape(B, T, hb, wb, C, nf),
                             (0, 2, 3, 4, 1, 5)).reshape(B, hb, wb,
                                                         C * 2 * nf)
    else:
        # [B,2,H,W,C] -> [B,C,2,H,W] to get channel order (c, t)
        xc = jnp.transpose(x, (0, 4, 1, 2, 3))
        b = blocks_from_images(xc, wiS)                 # [B,C,2,hb,wb,64]
        # HIGHEST precision: the reference computes this projection in f64;
        # bf16 MXU accumulation would dominate the f32-vs-f64 tolerance
        # budget.
        proj = jnp.einsum("...k,nk->...n", b - mean.astype(cd),
                          ev.astype(cd),
                          precision=jax.lax.Precision.HIGHEST)
        proj = proj / mean_vec.astype(cd)               # [B,C,2,hb,wb,nf]
        # channel = c*(2*nf) + t*nf + comp
        feat = jnp.transpose(proj, (0, 3, 4, 1, 2, 5)).reshape(
            B, hb, wb, C * 2 * nf)
    if per_item_minmax:
        axes = tuple(range(1, feat.ndim))
        mi = jnp.min(feat, axis=axes, keepdims=True)
        ma = jnp.max(feat, axis=axes, keepdims=True)
    else:
        mi = jnp.min(feat)
        ma = jnp.max(feat)
    feat = (feat - mi) / (ma - mi)
    return feat * 2.0 - 1.0


def pca_inverse(feats: jnp.ndarray, mean: jnp.ndarray, ev: jnp.ndarray,
                mean_vec: jnp.ndarray | None = None, wiS: int = 8,
                minmax: tuple | None = None) -> jnp.ndarray:
    """Inverse of the block-PCA transform: components → blocks → image
    (reference pca_inverse, pca_comp.py:309-367; diagnostics path).

    feats: [..., hb, wb, n_comp] (per channel-image); if `minmax` (mi, ma) is
    given the [-1,1]-normalised features are first unscaled; `mean_vec`
    un-applies the mean-|component| normalisation. Returns [..., hb*wiS,
    wb*wiS].
    """
    x = feats.astype(jnp.float32)
    if minmax is not None:
        mi, ma = minmax
        x = (x + 1.0) * 0.5 * (ma - mi) + mi
    if mean_vec is not None:
        x = x * mean_vec.astype(x.dtype)
    blocks = jnp.einsum("...n,nk->...k", x, ev.astype(x.dtype),
                        precision=jax.lax.Precision.HIGHEST)
    blocks = blocks + mean.astype(x.dtype)
    *lead, hb, wb, k2 = blocks.shape
    blocks = blocks.reshape(*lead, hb, wb, wiS, wiS)
    blocks = jnp.moveaxis(blocks, -2, -3)        # [..., hb, wiS, wb, wiS]
    return blocks.reshape(*lead, hb * wiS, wb * wiS)


def fit_block_pca(images: np.ndarray, n_components: int, wiS: int = 8) -> PCAState:
    """One-time PCA fit (to_pca fit path, pca_comp.py:370-470 + MYPCA.fit).

    images: [N, H, W] host array (each channel/frame flattened into N); the
    reference fits in float64 via CuPy SVD — we use NumPy f64 on host (this is
    a once-per-training operation, not a device op).
    Returns PCAState with top-n_components right singular vectors.
    """
    images = np.asarray(images, dtype=np.float64)
    N, H, W = images.shape
    hb, wb = H // wiS, W // wiS
    b = images.reshape(N, hb, wiS, wb, wiS).transpose(0, 1, 3, 2, 4)
    data = b.reshape(-1, wiS * wiS)
    mean = data.mean(axis=0)
    centred = data - mean
    # full SVD of [n_blocks, 64]: right singular vectors = principal axes
    _, s, vt = np.linalg.svd(centred, full_matrices=False)
    ev = vt[:n_components, :]
    transformed = centred @ ev.T
    mean_vec = np.abs(transformed).mean(axis=0)     # pca_comp.py:427
    eigenvalues = (s ** 2) / data.shape[0]
    return PCAState(mean=mean, eigenvectors=ev, mean_vec=mean_vec,
                    eigenvalues=eigenvalues)
