"""Device mesh construction and sharding helpers.

The reference has no distributed layer at all (SURVEY.md §2.12: its only
cross-process channels are HTTP and Bolt). Here the corpus dimension is
sharded across chips over ICI: a 1-D ``Mesh`` with a ``"data"`` axis holds
the index rows via ``NamedSharding(P("data", None))``; per-shard top-k
results are merged with an all-gather. Multi-slice (DCN) layouts extend the
same mesh with an outer axis — nothing in the index code assumes axis
count.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CORPUS_AXIS = "data"
REPLICA_AXIS = "replica"
SLICE_AXIS = "slice"


def default_mesh(
    n_devices: Optional[int] = None, axis_name: str = CORPUS_AXIS
) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (all by default)."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices but only {len(devices)} present"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replica_mesh(replicas: int, shards: int) -> Mesh:
    """("replica", "data") mesh: the corpus shards over "data" within each
    replica group and replicates across groups; query batches split across
    "replica". Trades HBM (× replicas) for QPS (× replicas) when search is
    compute-bound rather than memory-bound."""
    devices = jax.devices()
    if replicas * shards > len(devices):
        raise ValueError(
            f"requested {replicas}x{shards} devices, only {len(devices)} present"
        )
    grid = np.asarray(devices[: replicas * shards]).reshape(replicas, shards)
    return Mesh(grid, (REPLICA_AXIS, CORPUS_AXIS))


def slice_mesh(slices: int, shards: int, replicas: int = 1) -> Mesh:
    """("slice", "replica", "data") mesh — the multi-pod layout. The corpus
    partitions across slices (DCN) and shards within each slice over its
    chips (ICI); replicas within a slice duplicate the slice's partition
    for QPS. Query-time merge is hierarchical: per-shard top-k merges over
    ICI inside the slice, then only (B, k) candidates per slice cross DCN
    (see DeviceFlatIndex._search_sliced)."""
    devices = jax.devices()
    need = slices * replicas * shards
    if need > len(devices):
        raise ValueError(
            f"requested {slices}x{replicas}x{shards} devices, only "
            f"{len(devices)} present"
        )
    grid = np.asarray(devices[:need]).reshape(slices, replicas, shards)
    return Mesh(grid, (SLICE_AXIS, REPLICA_AXIS, CORPUS_AXIS))


def corpus_axes(mesh: Mesh, axis_name: str = CORPUS_AXIS):
    """The mesh axes the corpus rows shard over: ("slice", "data") on a
    multi-slice mesh, else just the data axis."""
    if SLICE_AXIS in mesh.axis_names:
        return (SLICE_AXIS, axis_name)
    return axis_name


def corpus_sharding(mesh: Mesh, axis_name: str = CORPUS_AXIS) -> NamedSharding:
    """Rows sharded across the corpus axes; feature dim replicated."""
    return NamedSharding(mesh, P(corpus_axes(mesh, axis_name), None))


def row_sharding(mesh: Mesh, axis_name: str = CORPUS_AXIS) -> NamedSharding:
    """1-D array sharded across the corpus axes (e.g. validity masks)."""
    return NamedSharding(mesh, P(corpus_axes(mesh, axis_name)))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def round_up(value: int, multiple: int) -> int:
    return -(-value // multiple) * multiple


def shard_count(mesh: Optional[Mesh], axis_name: str = CORPUS_AXIS) -> int:
    """Total corpus shards: data shards × slices (when present)."""
    if mesh is None:
        return 1
    n = mesh.shape[axis_name]
    if SLICE_AXIS in mesh.axis_names:
        n *= mesh.shape[SLICE_AXIS]
    return n


def mesh_axis_names(mesh: Mesh) -> Sequence[str]:
    return mesh.axis_names
