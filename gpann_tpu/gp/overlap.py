"""Overlapping (multi-assignment) partitioning.

Reference parity: ``src/overlapping_partitioning.cpp``.

- :func:`overlapping_graph_partitioning` (OGP, ``:50-141``): partition the
  kNN graph into k' = ceil((n + overlap*n) / L_max) clusters, then rounds of
  globally-highest-affinity extra assignments: each point's affinity to a
  foreign cluster is the number of its kNN neighbors whose *base* partition is
  that cluster; every round admits only moves at the round's maximum affinity,
  per-cluster up to capacity, until the overlap budget is spent.
- :func:`make_overlapping_with_centroids` (``:143-227``): train a k-means
  tree router on the clusters, rank each point's closest foreign clusters by
  representative distance (keep 5), sort all (point, cluster) ratings
  globally by distance and admit greedily under capacity.
- :func:`overlapping_kmeans_partitioning_spann` (``:229-235``): wrapper
  applying the centroid method on top of any base partition.

The affinity computation vectorizes the reference's per-thread RatingMap
(``:15-48``) into one scatter-add; admission keeps the same
globally-max-affinity-first semantics.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from gpann_tpu.core.distances import Metric
from gpann_tpu.core.partition import Clusters, Partition, partition_to_clusters
from gpann_tpu.gp.partitioning import partition_dense_graph
from gpann_tpu.graph.knn import ApproximateKNNGraphBuilder


def overlapping_graph_partitioning(
    points: np.ndarray,
    num_clusters: int,
    eps: float = 0.05,
    overlap: float = 0.2,
    strong: bool = False,
    metric: Metric = "l2",
    seed: int = 555,
    degree: int = 10,
    graph: Optional[np.ndarray] = None,
) -> Clusters:
    """OGP (overlapping_partitioning.cpp:50-141)."""
    n = points.shape[0]
    max_cluster_size = int((1.0 + eps) * n / num_clusters)
    num_extra = int(overlap * n)
    total_assignments = n + num_extra
    k_eff = int(np.ceil(total_assignments / max_cluster_size))

    if graph is None:
        builder = ApproximateKNNGraphBuilder(metric=metric, seed=seed, strong=strong)
        graph = builder.build(points, degree)
    part = partition_dense_graph(graph, k_eff, eps, seed=seed)
    k_eff = int(part.max()) + 1

    member = np.zeros((n, k_eff), dtype=bool)  # cover as dense bool
    member[np.arange(n), part] = True
    sizes = np.bincount(part, minlength=k_eff).astype(np.int64)

    u = np.repeat(np.arange(n), graph.shape[1])
    v = graph.reshape(-1)
    valid = v >= 0
    u, v = u[valid], v[valid]
    # affinity to each cluster = #neighbors whose base partition is there
    aff = np.zeros((n, k_eff), dtype=np.int32)
    np.add.at(aff, (u, part[v]), 1)

    remaining = num_extra
    while remaining > 0:
        masked = np.where(member | (sizes[None, :] >= max_cluster_size), -1, aff)
        best_target = masked.argmax(axis=1)
        best_aff = masked[np.arange(n), best_target]
        best = int(best_aff.max())
        if best <= 0:
            break
        movers = np.nonzero(best_aff == best)[0]
        targets = best_target[movers]
        # per-cluster admission up to room, then global budget
        order = np.argsort(targets, kind="stable")
        movers, targets = movers[order], targets[order]
        within = np.arange(len(movers)) - np.searchsorted(targets, targets)
        room = max_cluster_size - sizes
        admit = within < room[targets]
        movers, targets = movers[admit], targets[admit]
        if len(movers) > remaining:
            movers, targets = movers[:remaining], targets[:remaining]
        if len(movers) == 0:
            break
        member[movers, targets] = True
        np.add.at(sizes, targets, 1)
        remaining -= len(movers)

    return [np.nonzero(member[:, c])[0].astype(np.int32) for c in range(k_eff)]


def make_overlapping_with_centroids(
    points: np.ndarray,
    clusters: Clusters,
    max_cluster_size: int,
    num_extra_assignments: int,
    metric: Metric = "l2",
    seed: int = 555,
    num_keep: int = 5,
) -> Clusters:
    """Centroid-distance-ranked overlap (overlapping_partitioning.cpp:143-227).

    Returns a new Clusters list (input order preserved, empties dropped).
    """
    from gpann_tpu.route.kmeans_tree import KMeansTreeRouter, KMeansTreeRouterOptions

    clusters = [np.asarray(c, np.int32) for c in clusters if len(c)]
    n = points.shape[0]
    kc = len(clusters)

    num_centroids = 64
    opts = KMeansTreeRouterOptions(
        num_centroids=num_centroids,
        min_cluster_size=350,
        budget=kc * num_centroids,
        search_budget=0,
    )
    router = KMeansTreeRouter(metric=metric).train(points, clusters, opts, seed=seed)

    # per-point min distance to each cluster's representatives
    min_d, _ = router.flat.query_votes(points, num_voting_neighbors=len(router.flat))
    member = np.zeros((n, kc), dtype=bool)
    for c, mem in enumerate(clusters):
        member[mem, c] = True
    min_d = np.where(member, np.inf, min_d)

    sizes = np.asarray([len(c) for c in clusters], dtype=np.int64)
    # keep the 5 closest foreign clusters per point, flatten, global sort
    keep = min(num_keep, kc)
    targets = np.argsort(min_d, axis=1, kind="stable")[:, :keep]
    dists = np.take_along_axis(min_d, targets, axis=1)
    flat_p = np.repeat(np.arange(n), keep)
    flat_c = targets.reshape(-1)
    flat_d = dists.reshape(-1)
    finite = np.isfinite(flat_d)
    flat_p, flat_c, flat_d = flat_p[finite], flat_c[finite], flat_d[finite]
    order = np.argsort(flat_d, kind="stable")

    extra: list[list[int]] = [[] for _ in range(kc)]
    left = num_extra_assignments
    for idx in order:
        if left == 0:
            break
        c = int(flat_c[idx])
        if sizes[c] < max_cluster_size:
            extra[c].append(int(flat_p[idx]))
            sizes[c] += 1
            left -= 1
    return [
        np.concatenate([clusters[c], np.asarray(extra[c], np.int32)])
        if extra[c]
        else clusters[c]
        for c in range(kc)
    ]


def overlapping_kmeans_partitioning_spann(
    points: np.ndarray,
    partition: Partition,
    requested_num_clusters: int,
    eps: float = 0.05,
    overlap: float = 0.2,
    metric: Metric = "l2",
    seed: int = 555,
) -> Clusters:
    """Wrapper (overlapping_partitioning.cpp:229-235)."""
    num_extra = int(overlap * points.shape[0])
    max_cluster_size = int((1.0 + eps) * points.shape[0] / requested_num_clusters)
    clusters = partition_to_clusters(partition)
    return make_overlapping_with_centroids(
        points, clusters, max_cluster_size, num_extra, metric=metric, seed=seed
    )
