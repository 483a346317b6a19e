"""QPS simulator, routing sweep, shard sweep, serialization tests."""

import numpy as np
import pytest

from gpann_tpu.cluster import balanced_kmeans
from gpann_tpu.core.partition import partition_to_clusters
from gpann_tpu.eval import compute_ground_truth, kth_neighbor_distance
from gpann_tpu.eval.combination import (
    CSV_HEADER,
    RoutingConfig,
    ShardSearch,
    attribute_recall_and_query_time,
    combine_routes_and_searches,
    deserialize_routes,
    deserialize_searches,
    pareto_filter,
    replica_cost_model,
    serialize_routes,
    serialize_searches,
)
from gpann_tpu.route.sweep import iterate_routing_configs
from gpann_tpu.search.shard_sweep import run_in_shard_searches
from gpann_tpu.search.two_level import TwoLevelIVF


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(555)
    kb, d, n, nq = 4, 12, 2000, 16
    centers = rng.standard_normal((kb, d)).astype(np.float32) * 4
    lbl = rng.integers(0, kb, size=n)
    pts = (centers[lbl] + 0.4 * rng.standard_normal((n, d))).astype(np.float32)
    q = (centers[rng.integers(0, kb, size=nq)]
         + 0.4 * rng.standard_normal((nq, d))).astype(np.float32)
    gt_ids, gt_dists = compute_ground_truth(pts, q, 10)
    _, assign = balanced_kmeans(pts, k=4, eps=0.3, seed=1)
    clusters = partition_to_clusters(assign, 4)
    return pts, q, gt_ids, gt_dists, clusters


class TestCostModel:
    def test_replica_model_adds_to_slowest(self):
        work = np.array([10.0, 1.0, 1.0])
        recs = replica_cost_model(work, routing_time=0.0, num_queries=100,
                                  requested_shards=3, max_extra_hosts=5)
        assert recs[0]["hosts"] == 3
        assert recs[1]["hosts"] == 4  # replica went to shard 0
        # with 1 replica on the bottleneck, its latency halves
        assert recs[1]["qps"] == pytest.approx(100 / 5.0)

    def test_qps_includes_routing(self):
        work = np.array([2.0])
        recs = replica_cost_model(work, routing_time=1.0, num_queries=100,
                                  requested_shards=1, max_extra_hosts=0)
        assert recs[0]["qps"] == pytest.approx(100 / (2.0 + 1.0))

    def test_pareto_filter(self):
        rows = []
        for recall, qps in [(0.9, 100), (0.8, 50), (0.8, 200), (0.95, 70)]:
            f = ["x"] * 19
            f[8], f[9] = str(recall), str(qps)
            rows.append(",".join(f))
        front = pareto_filter(rows)
        got = {(float(r.split(",")[8]), float(r.split(",")[9])) for r in front}
        assert got == {(0.8, 200.0), (0.9, 100.0), (0.95, 70.0)}


class TestAttribution:
    def test_unique_hit_dedup(self):
        # 1 query, 2 shards, overlapping: same point hit in both shards
        route = RoutingConfig(buckets_to_probe=np.array([[0, 1]], np.int32))
        search = ShardSearch(
            ef_search=1,
            time_query_in_shard=np.array([[0.5], [0.25]]),
            hits=[[np.array([7])], [np.array([7, 8])]],
        )
        recall, work = attribute_recall_and_query_time(
            route, search, num_queries=1, num_shards=2, nprobes=2, k=2
        )
        assert recall == 1.0  # {7, 8} unique
        np.testing.assert_allclose(work, [0.5, 0.25])


class TestSweeps:
    def test_two_level_exact_at_full_subnprobe(self, setup):
        pts, q, gt_ids, gt_dists, clusters = setup
        tl = TwoLevelIVF(pts, clusters, target_sub_size=256, seed=2)
        assert tl.num_subs > tl.num_shards  # really two-level
        kth = kth_neighbor_distance(gt_dists, 10)
        probes = np.tile(np.arange(4), (len(q), 1))
        d, i = tl.search(q, probes, 10, sub_nprobe=tl.max_subs_per_shard)
        from gpann_tpu.eval import recall_from_ids

        assert recall_from_ids(pts, q, i, kth, 10) == 1.0

    def test_two_level_recall_increases_with_subnprobe(self, setup):
        pts, q, gt_ids, gt_dists, clusters = setup
        tl = TwoLevelIVF(pts, clusters, target_sub_size=256, seed=2)
        kth = kth_neighbor_distance(gt_dists, 10)
        probes = np.tile(np.arange(4), (len(q), 1))
        from gpann_tpu.eval import recall_from_ids

        recalls = []
        for snp in (1, 2, tl.max_subs_per_shard):
            _, i = tl.search(q, probes, 10, sub_nprobe=snp)
            recalls.append(recall_from_ids(pts, q, i, kth, 10))
        assert recalls[0] <= recalls[1] <= recalls[2]
        assert recalls[2] == 1.0

    def test_shard_sweep_and_combination_csv(self, setup, tmp_path):
        pts, q, gt_ids, gt_dists, clusters = setup
        kth = kth_neighbor_distance(gt_dists, 10)
        routes = iterate_routing_configs(
            pts, q, clusters, budgets=[500], voting_neighbors=(20,),
            timing_reps=1,
        )
        assert any(r.index_trainer == "KMeansTree" for r in routes)
        assert any(r.routing_algorithm == "Random" for r in routes)
        searches = run_in_shard_searches(
            pts, q, clusters, kth, 10, sub_nprobe_sweep=(1, 8), timing_reps=1,
            target_sub_size=256,
        )
        assert len(searches) >= 1
        rows = combine_routes_and_searches(
            routes, searches, len(q), 4, 4, 10
        )
        assert len(rows) > 0
        assert len(rows[0].split(",")) == len(CSV_HEADER.split(","))
        # full-probe exact config reaches recall 1.0
        best = max(float(r.split(",")[8]) for r in rows)
        assert best == 1.0

        # serialization round-trips
        serialize_routes(routes, str(tmp_path / "r.routes"))
        back = deserialize_routes(str(tmp_path / "r.routes"))
        assert len(back) == len(routes)
        r0, b0 = routes[0], back[0]
        assert r0.index_trainer == b0.index_trainer
        assert r0.routing_algorithm == b0.routing_algorithm
        w = min(r0.buckets_to_probe.shape[1], b0.buckets_to_probe.shape[1])
        np.testing.assert_array_equal(
            r0.buckets_to_probe[:, :w], b0.buckets_to_probe[:, :w]
        )
        serialize_searches(searches, str(tmp_path / "s.searches"))
        sback = deserialize_searches(str(tmp_path / "s.searches"))
        assert len(sback) == len(searches)
        np.testing.assert_allclose(
            sback[0].time_query_in_shard, searches[0].time_query_in_shard,
            rtol=1e-6,
        )
        np.testing.assert_array_equal(sback[0].hits[0][0], searches[0].hits[0][0])


def test_pyramid_side_index_sweep(setup, tmp_path):
    """routes.cpp:287-311: the routing indices saved by the Pyramid /
    OurPyramid partitioners are swept through the same 4-rule x voting grid
    with index_trainer "Pyramid"/"OurPyramid+KNN" rows (C11 closure)."""
    pts, q, gt_ids, gt_dists, clusters = setup
    from gpann_tpu.route.flat import FlatRouter, centroid_router

    side = centroid_router(pts, clusters)
    p = tmp_path / "side.npz"
    side.save(str(p))
    side2 = FlatRouter.load(str(p))  # the CLI path loads from disk

    routes = iterate_routing_configs(
        pts, q, clusters, budgets=[500], voting_neighbors=(4,),
        timing_reps=1, include_random=False,
        pyramid_index=side2, our_pyramid_index=side2,
    )
    trainers = {r.index_trainer for r in routes}
    assert {"Pyramid", "OurPyramid+KNN"} <= trainers
    pyr = [r for r in routes if r.index_trainer == "Pyramid"]
    assert {r.routing_algorithm for r in pyr} == {
        "min_dist", "pyramid", "spann", "frequency"}
    for r in pyr:
        assert r.buckets_to_probe.shape[0] == len(q)
        assert r.routing_distance_calcs == len(side2)
    # the rows flow through the combiner with the new trainer names
    searches = run_in_shard_searches(
        pts, q, clusters, kth_neighbor_distance(gt_dists, 10), 10,
        sub_nprobe_sweep=(8,), timing_reps=1, target_sub_size=256,
    )
    rows = combine_routes_and_searches(routes, searches, len(q), 4, 4, 10)
    assert any(",Pyramid," in r or r.startswith("Pyramid") or
               "Pyramid" in r.split(",")[3] for r in rows)
