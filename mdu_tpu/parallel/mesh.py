"""Device mesh helpers.

The reference has no multi-device story (SURVEY.md §2: no torch.distributed
anywhere); its only parallelism is single-GPU tile batching.  Here tile
batches shard over a `jax.sharding.Mesh` axis ('tiles') and training uses a
('dp', 'tp') mesh — collectives ride ICI via XLA.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_tile_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.array(devs), ("tiles",))


def make_train_mesh(dp: int, tp: int, devices: Optional[Sequence] = None) -> Mesh:
    devs = list(devices or jax.devices())
    assert len(devs) >= dp * tp, f"need {dp * tp} devices, have {len(devs)}"
    arr = np.array(devs[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
