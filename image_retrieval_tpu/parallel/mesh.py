"""Device mesh and sharding helpers.

The reference's only "distribution" is a client-server Milvus split
(reference docker/standalone/docker-compose.yml:1-47). Here distribution is
in-program: a jax.sharding.Mesh whose `data` axis shards gallery rows and
batches, and whose `model` axis shards weight matrices; XLA inserts ICI
collectives from sharding annotations.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from image_retrieval_tpu.config import MeshConfig


def make_mesh(
    cfg: Optional[MeshConfig] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh. data=-1 consumes all remaining devices."""
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = max(1, cfg.model)
    data = cfg.data if cfg.data > 0 else n // model
    # data < 1 catches model > device count under data=-1 (n // model == 0
    # would otherwise build a zero-device mesh and fail obscurely downstream)
    if data < 1 or data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data*model} devices, have {n}")
    grid = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(grid, cfg.axis_names)


def shard_rows(x, mesh: Mesh, axis: str = "data"):
    """Place an (N, ...) array with rows sharded over `axis`."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(x, mesh: Mesh):
    """Fully replicate an array over the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P()))


def row_spec(ndim: int, axis: str = "data") -> P:
    return P(axis, *([None] * (ndim - 1)))
