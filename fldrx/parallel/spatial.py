"""Spatially-sharded evaluation — multi-chip 4K inference (SURVEY.md §2.9).

The level-0 synthesis at 4K is the memory/compute peak; sharding the image
width over the 'sp' mesh axis splits it across chips. XLA's SPMD partitioner
inserts halo exchanges for the convs and all-reduces for the global PCA
min/max (block_pca's jnp.min/max reduce over the whole tensor, so sharded and
unsharded results agree exactly).

Note: this path uses the exact XLA warp ops (cfg.fast_warp=False) — Pallas
custom calls do not auto-partition under SPMD; a sharded warp engine with
explicit halo DMA is future work (shard_map + per-shard kernels).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import FLDRConfig
from ..eval.pipeline import build_pyramid
from ..model.fldrnet import forward_test
from ..ops.pad import pad_amount


def make_sharded_eval(params, cfg: FLDRConfig, mesh: Mesh):
    """Returns fn(frames [B,2,H,W,3], t [B,1]) running batch-over-'dp' and
    width-over-'sp' sharded on `mesh`."""
    cfg = cfg.replace(fast_warp=False)

    def fn(params, frames, t):
        frames = jax.lax.with_sharding_constraint(
            frames, NamedSharding(mesh, P("dp", None, None, "sp", None)))
        ph = pad_amount(frames.shape[2], cfg.div_pad)
        pw = pad_amount(frames.shape[3], cfg.div_pad)
        if ph or pw:
            frames = jnp.pad(
                frames, [(0, 0), (0, 0), (0, ph), (0, pw), (0, 0)],
                mode="reflect" if cfg.padding == "reflect" else "constant")
        pyr = build_pyramid(frames, cfg, cfg.S_tst + 1)
        out = forward_test(params, cfg, pyr, t)
        return jax.lax.with_sharding_constraint(
            out, NamedSharding(mesh, P("dp", None, "sp", None)))

    jitted = jax.jit(fn)

    def call(frames, t):
        fr = jax.device_put(
            jnp.asarray(frames, jnp.float32),
            NamedSharding(mesh, P("dp", None, None, "sp", None)))
        tt = jax.device_put(jnp.asarray(t, jnp.float32).reshape(-1, 1),
                            NamedSharding(mesh, P("dp", None)))
        pr = jax.device_put(params, NamedSharding(mesh, P()))
        return jitted(pr, fr, tt)

    return call
