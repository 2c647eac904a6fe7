"""Device mesh + sharding helpers — the distributed story of the rebuild.

The reference is single-GPU (SURVEY.md §2.9: no torch.distributed anywhere);
this module is the greenfield TPU-native design:

  * axis 'dp' — data parallelism over frame pairs / batch
  * axis 'sp' — spatial parallelism: shard the image W axis for level-0
    synthesis at 4K (the memory/compute peak). XLA's SPMD partitioner inserts
    halo exchanges for the convs and all-reduces for the global PCA min/max.

Collectives ride ICI via XLA; there is no hand-written NCCL analog.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              dp: Optional[int] = None, sp: Optional[int] = None) -> Mesh:
    """Build a (dp, sp) mesh. Default: as much dp as possible, sp the rest."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None and sp is None:
        # favour dp; peel a spatial factor of 2 when the device count allows
        sp = 2 if n % 2 == 0 and n >= 4 else 1
        dp = n // sp
    elif dp is None:
        dp = n // sp
    elif sp is None:
        sp = n // dp
    assert dp * sp == n, f"mesh {dp}x{sp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, ("dp", "sp"))


def batch_specs() -> Dict[str, P]:
    """PartitionSpecs for a training batch: batch over dp, width over sp."""
    return {
        "frames": P("dp", None, None, "sp", None),   # [B,2,H,W,C]
        "target": P("dp", None, "sp", None),          # [B,H,W,C]
        "t": P("dp", None),                           # [B,1]
    }


def shard_batch(mesh: Mesh, batch: Dict[str, np.ndarray]):
    specs = batch_specs()
    return {
        k: jax.device_put(v, NamedSharding(mesh, specs.get(k, P("dp"))))
        for k, v in batch.items()
    }


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def frames_spec() -> P:
    """Sharding for eval frames [B,2,H,W,C]: width over sp, batch over dp."""
    return P("dp", None, None, "sp", None)
