"""Partition / Clusters / Cover representations and conversions.

Reference parity (``src/defs.h:25-42``, ``src/defs.cpp:30-79``):

- ``Partition``  — int32 array [n], point -> shard id (non-overlapping).
- ``Clusters``   — list of int arrays, shard -> member point ids.
- ``Cover``      — list of int arrays, point -> shard ids (overlapping
  assignments; a point may belong to several shards).

These live on host as NumPy: they are irregular bookkeeping, not compute.
Device-side code uses the dense ``Partition`` array or padded cluster tensors
produced by :func:`pad_clusters`.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

Partition = np.ndarray  # [n] int32
Clusters = List[np.ndarray]  # num_clusters x [size_i] int32
Cover = List[np.ndarray]  # n x [num_shards_of_point] int32


def num_parts(partition: Partition) -> int:
    return int(partition.max()) + 1 if partition.size else 0


def partition_to_clusters(partition: Partition, k: int | None = None) -> Clusters:
    """point->shard array to shard->points lists (defs.cpp:30-41)."""
    partition = np.asarray(partition)
    if k is None:
        k = num_parts(partition)
    order = np.argsort(partition, kind="stable")
    sorted_parts = partition[order]
    boundaries = np.searchsorted(sorted_parts, np.arange(k + 1))
    return [
        order[boundaries[i] : boundaries[i + 1]].astype(np.int32) for i in range(k)
    ]


def clusters_to_partition(clusters: Clusters, n: int | None = None) -> Partition:
    """shard->points lists to point->shard array (inverse of the above)."""
    if n is None:
        n = int(max((c.max() for c in clusters if len(c)), default=-1)) + 1
    partition = np.full(n, -1, dtype=np.int32)
    for part_id, members in enumerate(clusters):
        partition[np.asarray(members, dtype=np.int64)] = part_id
    return partition


def clusters_to_cover(clusters: Clusters, n: int | None = None) -> Cover:
    """shard->points to point->shards, supporting overlap (defs.cpp:43-55)."""
    if n is None:
        n = int(max((c.max() for c in clusters if len(c)), default=-1)) + 1
    cover: List[List[int]] = [[] for _ in range(n)]
    for part_id, members in enumerate(clusters):
        for p in np.asarray(members):
            cover[int(p)].append(part_id)
    return [np.asarray(c, dtype=np.int32) for c in cover]


def cover_to_clusters(cover: Cover, k: int | None = None) -> Clusters:
    """point->shards to shard->points (defs.cpp:57-62)."""
    if k is None:
        k = int(max((c.max() for c in cover if len(c)), default=-1)) + 1
    clusters: List[List[int]] = [[] for _ in range(k)]
    for point, shards in enumerate(cover):
        for s in np.asarray(shards):
            clusters[int(s)].append(point)
    return [np.asarray(c, dtype=np.int32) for c in clusters]


def remap_partition_ids(partition: Partition) -> Partition:
    """Compact partition ids to remove empty parts (defs.cpp:64-79)."""
    partition = np.asarray(partition)
    used = np.unique(partition)
    remap = np.full(int(used.max()) + 1 if used.size else 0, -1, dtype=np.int32)
    remap[used] = np.arange(used.size, dtype=np.int32)
    return remap[partition]


def cluster_sizes(clusters: Clusters) -> np.ndarray:
    return np.asarray([len(c) for c in clusters], dtype=np.int64)


def max_part_size(n: int, k: int, eps: float) -> int:
    """The balance constraint L_max = (1+eps) * ceil(n/k) used throughout the
    reference (e.g. ``partition.cpp:88``, ``partitioning.cpp:183``)."""
    return int((1.0 + eps) * np.ceil(n / max(k, 1)))


def pad_clusters(
    clusters: Clusters, pad_to: int | None = None, fill: int = -1
) -> tuple[np.ndarray, np.ndarray]:
    """Pack ragged clusters into a dense [k, pad_to] id tensor + sizes [k].

    Fixed shapes are what XLA wants; ``fill`` marks padding slots. This is the
    device-side counterpart of ``Clusters`` used by the IVF search layout.
    """
    sizes = cluster_sizes(clusters).astype(np.int32)
    if pad_to is None:
        pad_to = int(sizes.max()) if sizes.size else 0
    out = np.full((len(clusters), pad_to), fill, dtype=np.int32)
    for i, members in enumerate(clusters):
        out[i, : len(members)] = members
    return out, sizes


def check_cover_consistency(cover: Cover, clusters: Clusters) -> bool:
    """Property check: cover and clusters describe the same assignment."""
    back = clusters_to_cover(clusters, n=len(cover))
    return all(
        np.array_equal(np.sort(a), np.sort(b)) for a, b in zip(cover, back)
    )
