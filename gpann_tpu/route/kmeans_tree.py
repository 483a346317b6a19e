"""K-means-tree router: budgeted hierarchical k-means per shard.

Reference parity: ``src/kmeans_tree_router.{h,cpp}``.

- ``Train`` (``kmeans_tree_router.cpp:9-33``): per shard, a hierarchical
  k-means tree under a global *size budget* split across shards proportional
  to cluster sizes; recursion at ``:35-78`` with at most ``num_centroids``
  children per node, children below ``min_cluster_size`` or with no remaining
  budget become leaves.
- ``ExtractPoints`` (``:174-201``): flatten all centroids + shard labels into
  a routing point set (this is what the reference trains its HNSW router on).
- ``Query``/``FrequencyQuery`` (``:93-172``): the reference walks the trees
  best-first under a distance-computation budget. TPU redesign: the walk is
  replaced by an exact batched scan of the *extracted* centroid set (the
  reference's own HNSW router demonstrates extracted-points routing matches
  tree routing); ranking rules are shared with :class:`FlatRouter`.

Host orchestrates the recursion (irregular control flow); every node's
k-means runs on device. Node point sets are padded to power-of-two buckets
with zero-weight padding so XLA compiles O(log n) shapes, not one per node.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from gpann_tpu.cluster.kmeans import kmeans
from gpann_tpu.core.distances import Metric
from gpann_tpu.core.partition import Clusters
from gpann_tpu.route.flat import FlatRouter


@dataclass
class KMeansTreeRouterOptions:
    """Defaults match reference ``kmeans_tree_router.h:6-11`` exactly
    (num_centroids=64, min_cluster_size=250, budget=50000,
    search_budget=50000). ``search_budget`` is unused by the flat
    extracted-centroid scan (which examines every routing point exactly
    once) but kept for config parity."""

    num_centroids: int = 64
    min_cluster_size: int = 250
    budget: int = 50_000
    search_budget: int = 50_000


def _bucket_pad(points: np.ndarray, min_size: int = 256) -> np.ndarray:
    """Pad rows up to the next power-of-two bucket (zero rows, masked by
    weights) so repeated node k-means reuses compiled shapes."""
    n = points.shape[0]
    target = max(min_size, 1 << (n - 1).bit_length())
    if target == n:
        return points
    return np.concatenate(
        [points, np.zeros((target - n, points.shape[1]), points.dtype)]
    )


class KMeansTreeRouter:
    """Budgeted hierarchical k-means router over a clustering."""

    def __init__(self, metric: Metric = "l2") -> None:
        self.metric: Metric = metric
        self.points: Optional[np.ndarray] = None  # extracted centroids [R, d]
        self.labels: Optional[np.ndarray] = None  # shard ids [R]
        self._flat: Optional[FlatRouter] = None
        self.num_shards = 0

    # -- training -------------------------------------------------------------
    def train(
        self,
        points: np.ndarray,
        clusters: Clusters,
        options: KMeansTreeRouterOptions = KMeansTreeRouterOptions(),
        seed: int = 555,
    ) -> "KMeansTreeRouter":
        points = np.ascontiguousarray(points, dtype=np.float32)
        self.num_shards = len(clusters)
        n_total = sum(len(c) for c in clusters)
        all_centroids: List[np.ndarray] = []
        all_labels: List[np.ndarray] = []
        for shard, members in enumerate(clusters):
            members = np.asarray(members, dtype=np.int64)
            if len(members) == 0:
                continue
            # budget split proportional to cluster size (kmeans_tree_router.cpp:20-27)
            budget_i = max(
                1, int(round(options.budget * len(members) / max(n_total, 1)))
            )
            cents = self._train_shard(
                points[members], budget_i, options, seed + shard
            )
            all_centroids.append(cents)
            all_labels.append(np.full(len(cents), shard, dtype=np.int32))
        self.points = np.concatenate(all_centroids, axis=0)
        self.labels = np.concatenate(all_labels, axis=0)
        self._flat = FlatRouter(
            self.points, self.labels, num_shards=self.num_shards, metric=self.metric
        )
        return self

    def _train_shard(
        self,
        pts: np.ndarray,
        budget: int,
        options: KMeansTreeRouterOptions,
        seed: int,
    ) -> np.ndarray:
        """Host-orchestrated recursion (kmeans_tree_router.cpp:35-78) via an
        explicit worklist; returns the extracted centroids of this shard."""
        out: List[np.ndarray] = []
        # (points of node, remaining budget, seed)
        work: List[Tuple[np.ndarray, int, int]] = [(pts, budget, seed)]
        while work:
            node_pts, node_budget, node_seed = work.pop()
            if node_budget <= 0 or len(node_pts) <= 1:
                continue
            k = int(min(options.num_centroids, node_budget, len(node_pts)))
            padded = _bucket_pad(node_pts)
            weights = np.zeros(len(padded), np.float32)
            weights[: len(node_pts)] = 1.0
            # k varies per node (budget splits); pad the centroid count to
            # one bucket so the whole tree compiles O(log n) programs, not
            # one per distinct (bucket, k) pair
            cents, assign = kmeans(
                padded, k=k, metric=self.metric, seed=node_seed,
                weights=weights, k_pad_to=options.num_centroids,
            )
            assign = assign[: len(node_pts)]
            sizes = np.bincount(assign, minlength=k)
            live = sizes > 0
            cents = cents[live]
            out.append(cents.astype(np.float32))
            remaining = node_budget - len(cents)
            if remaining <= 0:
                continue
            # children get budget proportional to size; below min_cluster_size
            # they stay leaves (kmeans_tree_router.cpp:58-74)
            total = int(sizes.sum())
            child_ids = np.nonzero(live)[0]
            for ci, c in enumerate(child_ids):
                if sizes[c] < options.min_cluster_size:
                    continue
                child_budget = int(round(remaining * sizes[c] / max(total, 1)))
                if child_budget <= 0:
                    continue
                work.append(
                    (node_pts[assign == c], child_budget, node_seed * 31 + ci + 1)
                )
        if not out:
            # degenerate: single representative (mean)
            return pts.mean(axis=0, keepdims=True).astype(np.float32)
        return np.concatenate(out, axis=0)

    # -- extraction + queries --------------------------------------------------
    def extract_points(self) -> Tuple[np.ndarray, np.ndarray]:
        """(routing points, shard labels) — reference ExtractPoints
        (kmeans_tree_router.cpp:174-201)."""
        if self.points is None:
            raise RuntimeError("router not trained")
        return self.points, self.labels

    @property
    def flat(self) -> FlatRouter:
        if self._flat is None:
            raise RuntimeError("router not trained")
        return self._flat

    def query(self, queries: np.ndarray, search_budget: int = 5_000) -> np.ndarray:
        """Probe order [m, s]: shards by min extracted-centroid distance
        (the budget->exact limit of reference Query, kmeans_tree_router.cpp:93-130).
        ``search_budget`` caps the number of centroids scanned per query via
        top-T truncation for parity with the reference's budget semantics."""
        t = int(min(search_budget, len(self.flat)))
        min_d, _ = self.flat.query_votes(queries, t)
        from gpann_tpu.route.flat import rank_min_dist

        return rank_min_dist(min_d)

    def frequency_query(
        self, queries: np.ndarray, num_voting_neighbors: int = 120
    ) -> np.ndarray:
        """Probe order by centroid vote frequency (FrequencyQuery,
        kmeans_tree_router.cpp:132-172)."""
        min_d, freq = self.flat.query_votes(queries, num_voting_neighbors)
        from gpann_tpu.route.flat import rank_frequency

        return rank_frequency(freq, min_d)
