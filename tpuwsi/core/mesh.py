"""Device-mesh construction and sharding helpers.

TPU-native replacement for the reference's NCCL/DDP process-group setup
(reference: train.py:431 ``init_distributed_device``, train.py:624-635 DDP wrap,
sbatch-ssl.sh:55 torchrun). Instead of N processes + NCCL all-reduce, we build a
``jax.sharding.Mesh`` over all addressable devices and let GSPMD insert
collectives over ICI; gradients are reduced implicitly by sharding the batch
axis and keeping params replicated (pure DP) or sharded over the ``model`` axis
(optional TP for large heads).

Axis conventions:
  data   — batch-parallel axis (the reference's only parallelism)
  model  — tensor-parallel axis (reserved; size 1 for reference parity)
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """How to lay the addressable devices out as a logical mesh."""

    data: int = -1  # -1 = all remaining devices
    model: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int]:
        model = max(1, self.model)
        data = self.data
        if data == -1:
            if n_devices % model != 0:
                raise ValueError(
                    f"n_devices={n_devices} not divisible by model={model}"
                )
            data = n_devices // model
        if data * model != n_devices:
            raise ValueError(
                f"mesh {data}x{model} != n_devices {n_devices}"
            )
        return data, model


def create_mesh(
    config: MeshConfig | None = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2-D (data, model) mesh over the given (default: all) devices.

    Device order follows ``jax.devices()`` which is contiguous along ICI rings
    on TPU, so the fastest-varying (model) axis rides the fastest links.
    """
    if devices is None:
        devices = jax.devices()
    config = config or MeshConfig()
    data, model = config.resolve(len(devices))
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def local_mesh(n: int | None = None) -> Mesh:
    """1-D data mesh over n (default all) local devices — test convenience."""
    devices = jax.devices()[: n or len(jax.devices())]
    arr = np.asarray(devices).reshape(len(devices), 1)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard leading (batch) dim over the data axis, replicate the rest."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, batch_axis: int = 0):
    """Place a pytree of host arrays onto the mesh, batch-dim sharded.

    Single-process: a plain sharded device_put. Multi-host (mesh spans more
    than one process): each host holds only its strided slice of the global
    batch (io/wsi.py batches(process_index=...)), so the global array is
    assembled with ``jax.make_array_from_process_local_data`` — the
    TPU-native replacement for DistributedSampler + DDP input scatter
    (reference train.py:732, sbatch-ssl.sh:55 torchrun).

    ``batch_axis``: which axis is the per-example batch dim — 1 for the
    stacked (steps, batch, ...) super-batches of the scanned multi-step
    driver (--steps-per-dispatch), 0 otherwise."""
    multiproc = any(
        d.process_index != jax.process_index() for d in mesh.devices.flat
    )

    def put(x):
        x = np.asarray(x)
        if batch_axis == 0:
            sharding = data_sharding(mesh, x.ndim)
        else:
            spec = [None] * x.ndim
            spec[batch_axis] = DATA_AXIS
            sharding = NamedSharding(mesh, P(*spec))
        if multiproc:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)
