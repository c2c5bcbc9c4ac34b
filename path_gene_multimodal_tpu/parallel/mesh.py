"""Device mesh + sharding for tile-parallel inference and training.

The reference's only parallelism is one-WSI-per-LSF-job plus single-GPU
batching (SURVEY.md §2 parallelism inventory). The TPU-native design adds
**in-slide data parallelism over the tile axis**: a 1-D mesh
(``axis "tiles"``), batches sharded across it with ``NamedSharding``,
weights replicated (models are small: ViT-B, ConvNeXtV2-tiny, ResNet34 —
TP/PP are not needed), and XLA inserting all-gathers/psums where results
reassemble. Multi-host extends the same mesh over DCN via
``jax.distributed.initialize`` (``init_distributed``); the slide-level
file protocol (``core.jobs``) continues to coordinate across slides.

The "sequence axis" of this workload is the tile axis (SURVEY.md §5
long-context): 100k tiles shard exactly like tokens, with no cross-tile
attention — so no ring/Ulysses machinery is needed; halo exchange only
appears in whole-slide segmentation stitching (``parallel.halo``).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TILE_AXIS = "tiles"


def make_mesh(num_devices: int | None = None, axis: str = TILE_AXIS) -> Mesh:
    devices = jax.devices()
    n = len(devices) if num_devices is None else num_devices
    if n <= 0:  # 0/negative would silently slice devices[:n]
        raise ValueError(f"requested {n} devices; need a positive count")
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]), (axis,))


def dp_mesh_for_batch(
    batch_size: int, *, logger: Any | None = None, label: str = "batch"
) -> Mesh:
    """The shared ``--dp`` CLI bring-up: build the all-local-devices
    tile-axis mesh and verify ``batch_size`` splits evenly across it
    (``shard_batch`` needs even splits on the leading axis). Raises
    ``ValueError`` with a user-facing message otherwise."""
    mesh = make_mesh()
    n = mesh.devices.size
    if batch_size % n:
        raise ValueError(
            f"{label} {batch_size} is not a multiple of the {n}-device mesh "
            f"(pick a batch size divisible by {n})"
        )
    if logger is not None:
        logger.info("data-parallel over %d devices (%s %d)", n, label, batch_size)
    return mesh


def batch_sharding(mesh: Mesh, ndim: int, axis: str = TILE_AXIS) -> NamedSharding:
    """Shard the leading (batch/tile) dimension, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Replicate a parameter pytree onto every device of the mesh."""
    rep = replicate(mesh)
    return jax.device_put(params, rep)


def shard_batch(batch: Any, mesh: Mesh, axis: str = TILE_AXIS) -> Any:
    """Place a host batch sharded over the tile axis; 0-d leaves (step
    counters etc.) replicate — P('tiles') on a scalar cannot place."""
    return jax.tree.map(
        lambda x: jax.device_put(
            x,
            batch_sharding(mesh, np.ndim(x), axis) if np.ndim(x) else replicate(mesh),
        ),
        batch,
    )


def pad_to_multiple(arr: np.ndarray, multiple: int) -> tuple[np.ndarray, int]:
    """Pad the leading axis to a multiple (sharding requires even splits).
    Returns (padded, original_length)."""
    n = arr.shape[0]
    pad = (-n) % multiple
    if pad:
        arr = np.concatenate([arr, np.zeros((pad, *arr.shape[1:]), arr.dtype)], axis=0)
    return arr, n


def init_distributed(coordinator: str | None = None, **kw: Any) -> None:
    """Multi-host bring-up (single-host no-op)."""
    if coordinator:
        jax.distributed.initialize(coordinator_address=coordinator, **kw)
