"""Flat (non-overlapping) partitioning methods.

Reference parity: ``src/partitioning.cpp`` — the 8 entry points of
``partitioning.h:5-23`` plus the Random baseline from ``partition.cpp:64-79``.

Methods:

- :func:`graph_partitioning` (GP, the flagship): approximate kNN graph ->
  symmetrize -> balanced multilevel partition (``partitioning.cpp:251-264``);
  KaMinPar is replaced by :mod:`gpann_tpu.gp.lp`.
- :func:`recursive_kmeans_partitioning` / :func:`kmeans_partitioning` —
  k-means with recursive re-splitting of overloaded clusters
  (``partitioning.cpp:12-88,143-146``).
- :func:`rebalancing_kmeans_partitioning` (RKM) — k-means + greedy point
  re-migration (``partitioning.cpp:90-141``).
- :func:`balanced_kmeans_partitioning` (BalancedKMeans) — BKM+ penalty method
  (``partition.cpp:13-21`` -> ``kmeans.cpp:253``).
- :func:`flat_kmeans_partitioning` (FlatKMeans) — plain Lloyd, no balance
  (``partition.cpp:23-26``).
- :func:`pyramid_partitioning` — subsample -> 10k aggregates -> kNN graph ->
  partition -> capacity-constrained nearest-aggregate assignment with retry
  rounds (``partitioning.cpp:266-356``).
- :func:`hierarchical_kmeans` + :func:`our_pyramid_partitioning` — recursive
  coarsening to <=64 centroids/level, weighted kNN-graph partition of the
  leaf centroids, projection to the full set (``partitioning.cpp:360-552``).
- :func:`random_partition` — seeded shuffle baseline (``partition.cpp:64-79``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from gpann_tpu.cluster.kmeans import balanced_kmeans, kmeans, random_sample, rebalance_greedy
from gpann_tpu.core.distances import Metric, topk_neighbors
from gpann_tpu.core.partition import Partition, remap_partition_ids
from gpann_tpu.gp.lp import partition_graph
from gpann_tpu.graph.knn import ApproximateKNNGraphBuilder, symmetrize_to_csr


def random_partition(n: int, k: int, seed: int = 555) -> Partition:
    """Seeded shuffled striping (partition.cpp:64-79)."""
    part = np.repeat(np.arange(k, dtype=np.int32), -(-n // k))[:n]
    np.random.default_rng(seed).shuffle(part)
    return part


def flat_kmeans_partitioning(
    points: np.ndarray, k: int, metric: Metric = "l2", seed: int = 555
) -> Partition:
    """Plain Lloyd assignment, no balance guarantee (partition.cpp:23-26)."""
    _, assign = kmeans(points, k=k, metric=metric, seed=seed)
    return remap_partition_ids(assign)


def balanced_kmeans_partitioning(
    points: np.ndarray, k: int, eps: float = 0.05, metric: Metric = "l2",
    seed: int = 555,
) -> Partition:
    """BKM+ balanced k-means (partition.cpp:13-21)."""
    _, assign = balanced_kmeans(points, k=k, eps=eps, metric=metric, seed=seed)
    return assign


def recursive_kmeans_partitioning(
    points: np.ndarray,
    max_cluster_size: int,
    num_clusters: Optional[int] = None,
    metric: Metric = "l2",
    seed: int = 555,
    depth: int = 0,
) -> Partition:
    """K-means, recursively re-splitting overloaded clusters with fresh part
    ids (partitioning.cpp:12-88)."""
    n = points.shape[0]
    if num_clusters is None:
        num_clusters = int(np.ceil(n / max_cluster_size))
    if num_clusters <= 0 or n == 0:
        return np.zeros(n, np.int32)
    _, part = kmeans(points, k=num_clusters, metric=metric, seed=seed)
    part = remap_partition_ids(part)
    num_clusters = int(part.max()) + 1
    sizes = np.bincount(part, minlength=num_clusters)
    next_id = num_clusters
    for c in np.nonzero(sizes > max_cluster_size)[0]:
        members = np.nonzero(part == c)[0]
        sub = recursive_kmeans_partitioning(
            points[members], max_cluster_size, None, metric, seed, depth + 1
        )
        # sub-part 0 keeps id c; others get fresh ids (partitioning.cpp:60-85)
        remapped = np.where(sub == 0, c, sub - 1 + next_id)
        part[members] = remapped
        next_id += int(sub.max())
    return remap_partition_ids(part)


def rebalancing_kmeans_partitioning(
    points: np.ndarray,
    max_cluster_size: int,
    num_clusters: Optional[int] = None,
    metric: Metric = "l2",
    seed: int = 555,
) -> Partition:
    """K-means + greedy re-migration of overflow points to the nearest
    non-full centroid (partitioning.cpp:90-141)."""
    n = points.shape[0]
    if num_clusters is None:
        num_clusters = int(np.ceil(n / max_cluster_size))
    if num_clusters <= 0 or n == 0:
        return np.zeros(n, np.int32)
    cents, part = kmeans(points, k=num_clusters, metric=metric, seed=seed)
    return rebalance_greedy(points, cents, part, max_cluster_size, metric)


def kmeans_partitioning(
    points: np.ndarray, k: int, eps: float = 0.05, metric: Metric = "l2",
    seed: int = 555,
) -> Partition:
    """KMeans method of partition.cpp: recursive splitting under the balance
    cap (partitioning.cpp:143-146)."""
    max_cluster_size = int(points.shape[0] * (1.0 + eps) / k)
    return recursive_kmeans_partitioning(
        points, max_cluster_size, num_clusters=k, metric=metric, seed=seed
    )


def partition_dense_graph(
    graph: np.ndarray,
    num_clusters: int,
    eps: float,
    node_weights: Optional[np.ndarray] = None,
    seed: int = 555,
) -> Partition:
    """Symmetrize a dense [n, deg] kNN graph and partition it — the role of
    PartitionAdjListGraph (partitioning.cpp:246-249)."""
    indptr, indices, ew = symmetrize_to_csr(graph)
    return partition_graph(
        indptr, indices, ew, num_clusters, eps=eps, node_weights=node_weights,
        seed=seed,
    )


def graph_partitioning(
    points: np.ndarray,
    num_clusters: int,
    eps: float = 0.05,
    strong: bool = False,
    metric: Metric = "l2",
    seed: int = 555,
    degree: int = 10,
    graph_output_path: Optional[str] = None,
) -> Partition:
    """GP: approximate kNN graph -> balanced graph partition
    (partitioning.cpp:251-264). ``graph_output_path`` dumps the kNN graph in
    Metis format first (partitioning.cpp:258-261)."""
    builder = ApproximateKNNGraphBuilder(metric=metric, seed=seed, strong=strong)
    graph = builder.build(points, degree)
    if graph_output_path:
        from gpann_tpu.core.metis_io import write_metis_graph
        from gpann_tpu.graph.knn import symmetrize_to_csr
        from gpann_tpu.core.metis_io import adjacency_from_csr

        indptr, indices, _ = symmetrize_to_csr(graph)
        write_metis_graph(graph_output_path,
                          adjacency_from_csr(indptr, indices))
    return partition_dense_graph(graph, num_clusters, eps, seed=seed)


# ---------------------------------------------------------------------------
# Pyramid
# ---------------------------------------------------------------------------


def _capacity_assign(
    points: np.ndarray,
    aggregate_points: np.ndarray,
    aggregate_partition: np.ndarray,
    num_clusters: int,
    max_in_cluster: int,
    metric: Metric,
) -> Partition:
    """Assign each point to the partition of its nearest aggregate, under a
    per-part capacity; unadmitted points retry against aggregates of
    non-full parts (partitioning.cpp:305-356). Admission is by distance
    priority (deterministic; the reference admits in racy parallel order)."""
    n = points.shape[0]
    part = np.full(n, -1, dtype=np.int32)
    room = np.full(num_clusters, max_in_cluster, dtype=np.int64)
    unassigned = np.arange(n)
    alive = np.ones(len(aggregate_points), dtype=bool)
    while len(unassigned):
        live_idx = np.nonzero(alive)[0]
        if len(live_idx) == 0:
            # no aggregates left: dump into parts with room
            order = np.argsort(-room)
            w = 0
            for p in order:
                take = min(int(room[p]), len(unassigned) - w)
                part[unassigned[w : w + take]] = p
                w += take
                if w == len(unassigned):
                    break
            break
        d, idx = topk_neighbors(
            points[unassigned], aggregate_points[live_idx], 1, metric=metric
        )
        d = np.asarray(d)[:, 0]
        target = aggregate_partition[live_idx[np.asarray(idx)[:, 0]]]
        # admit by distance priority within each part's remaining room
        order = np.argsort(d, kind="stable")
        t_ord = target[order]
        tsort = np.argsort(t_ord, kind="stable")
        final = order[tsort]
        t_fin = target[final]
        within = np.arange(len(final)) - np.searchsorted(t_fin, t_fin)
        admit = within < room[t_fin]
        chosen = unassigned[final[admit]]
        part[chosen] = t_fin[admit]
        np.add.at(room, t_fin[admit], -1)
        unassigned = unassigned[final[~admit]]
        alive &= room[aggregate_partition] > 0
    return part


def pyramid_partitioning(
    points: np.ndarray,
    num_clusters: int,
    eps: float = 0.05,
    metric: Metric = "l2",
    seed: int = 555,
    num_subsample: int = 10_000_000,
    num_aggregate: int = 10_000,
    routing_index_path: Optional[str] = None,
) -> Partition:
    """Pyramid (partitioning.cpp:266-356): subsample -> k-means aggregates ->
    kNN graph over aggregates -> partition -> capacity-bounded assignment."""
    n = points.shape[0]
    sub = random_sample(points, min(num_subsample, n), seed)
    aggregates = random_sample(sub, min(num_aggregate, len(sub)), seed)
    aggregates, _ = kmeans(sub, centroids=aggregates, metric=metric)

    if len(aggregates) > 5000:
        builder = ApproximateKNNGraphBuilder(metric=metric, seed=seed)
        agg_graph = builder.build(aggregates, 10)
    else:
        from gpann_tpu.graph.knn import build_exact_knn_graph

        agg_graph = build_exact_knn_graph(aggregates, min(10, len(aggregates) - 1),
                                          metric=metric)
    agg_part = partition_dense_graph(agg_graph, num_clusters, eps, seed=seed)
    if routing_index_path:
        from gpann_tpu.route.flat import FlatRouter

        FlatRouter(aggregates, agg_part, num_shards=num_clusters,
                   metric=metric).save(routing_index_path)
    max_in_cluster = int(n * (1.0 + eps) / num_clusters)
    return _capacity_assign(
        points, aggregates, agg_part, num_clusters, max_in_cluster, metric
    )


# ---------------------------------------------------------------------------
# OurPyramid (hierarchical k-means coarsening)
# ---------------------------------------------------------------------------

MAX_LEVEL_CENTROIDS = 64  # partitioning.cpp:366


def hierarchical_kmeans(
    points: np.ndarray,
    coarsening_ratio: float,
    metric: Metric = "l2",
    seed: int = 555,
) -> Tuple[Partition, np.ndarray]:
    """Recursive k-means coarsening (partitioning.cpp:436-507). Returns
    (assignment of each point to a leaf cell, leaf centroids [cells, d])."""
    n = points.shape[0]
    num_level = max(int(n * coarsening_ratio), 1)
    finished = num_level <= MAX_LEVEL_CENTROIDS
    num_level = min(num_level, MAX_LEVEL_CENTROIDS)
    cents, part = kmeans(points, k=num_level, metric=metric, seed=seed)
    part = remap_partition_ids(part)
    live = np.unique(part)
    cents = cents[live] if len(live) < len(cents) else cents
    if finished or len(cents) == 1:
        return part, cents
    out_cents = []
    offset = 0
    out_part = np.zeros(n, np.int32)
    for c in range(int(part.max()) + 1):
        members = np.nonzero(part == c)[0]
        sub_part, sub_cents = hierarchical_kmeans(
            points[members], coarsening_ratio, metric, seed + c + 1
        )
        out_part[members] = sub_part + offset
        out_cents.append(sub_cents)
        offset += len(sub_cents)
    return out_part, np.concatenate(out_cents, axis=0)


def our_pyramid_partitioning(
    points: np.ndarray,
    num_clusters: int,
    eps: float = 0.05,
    coarsening_rate: float = 0.002,
    metric: Metric = "l2",
    seed: int = 555,
    routing_index_path: Optional[str] = None,
    degree: int = 20,
) -> Partition:
    """OurPyramid (partitioning.cpp:509-552): HierKMeans coarsening ->
    weighted kNN-graph partition of leaf centroids -> projection.

    Deviation from the reference: the coarsening rate is floored so at least
    ~16 cells exist per target part — below that, balancing the weighted
    coarse graph is infeasible (the reference assumes n >= 1e6 where
    0.002*n >> 64 and never hits this)."""
    n = points.shape[0]
    coarsening_rate = max(coarsening_rate, min(1.0, 16.0 * num_clusters / max(n, 1)))
    cells, routing_points = hierarchical_kmeans(points, coarsening_rate, metric, seed)
    weights = np.bincount(cells, minlength=len(routing_points)).astype(np.float32)
    if len(routing_points) > 5000:
        builder = ApproximateKNNGraphBuilder(metric=metric, seed=seed)
        rp_graph = builder.build(routing_points, degree)
    else:
        from gpann_tpu.graph.knn import build_exact_knn_graph

        rp_graph = build_exact_knn_graph(
            routing_points, min(degree, len(routing_points) - 1), metric=metric
        )
    coarse_part = partition_dense_graph(
        rp_graph, num_clusters, eps, node_weights=weights, seed=seed
    )
    if routing_index_path:
        from gpann_tpu.route.flat import FlatRouter

        FlatRouter(routing_points, coarse_part, num_shards=num_clusters,
                   metric=metric).save(routing_index_path)
    return coarse_part[cells].astype(np.int32)
