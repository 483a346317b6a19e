"""Routing + search layer tests: golden-metric end-to-end on synthetic blobs."""

import numpy as np
import pytest

from gpann_tpu.cluster import balanced_kmeans
from gpann_tpu.core.partition import partition_to_clusters
from gpann_tpu.eval import (
    compute_ground_truth,
    kth_neighbor_distance,
    oracle_recall,
    recall_from_candidate_distances,
)
from gpann_tpu.route import (
    FlatRouter,
    KMeansTreeRouter,
    KMeansTreeRouterOptions,
    centroid_router,
    rank_frequency,
    rank_min_dist,
    rank_pyramid,
    rank_spann,
)
from gpann_tpu.search import IVFIndex, hits_per_shard, merge_shard_topk


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(555)
    k_blobs, d, n, nq = 8, 16, 4000, 64
    centers = rng.standard_normal((k_blobs, d)).astype(np.float32) * 4
    lbl = rng.integers(0, k_blobs, size=n)
    pts = (centers[lbl] + 0.4 * rng.standard_normal((n, d))).astype(np.float32)
    q = (centers[rng.integers(0, k_blobs, size=nq)]
         + 0.4 * rng.standard_normal((nq, d))).astype(np.float32)
    gt_ids, gt_dists = compute_ground_truth(pts, q, 10)
    _, assign = balanced_kmeans(pts, k=8, eps=0.3, seed=1)
    clusters = partition_to_clusters(assign, 8)
    return pts, q, gt_ids, gt_dists, assign, clusters


class TestIVF:
    def test_all_shards_equals_bruteforce(self, setup):
        pts, q, gt_ids, gt_dists, assign, clusters = setup
        ivf = IVFIndex(pts, clusters)
        sd, si = ivf.search_all_shards(q, 10)
        # merging ALL shards must reproduce the exact global top-10
        probe_order = np.tile(np.arange(8), (len(q), 1))
        md, mi = merge_shard_topk(sd, si, probe_order, 8, 10)
        np.testing.assert_allclose(md, gt_dists, rtol=1e-3, atol=1e-3)

    def test_probed_dense_matches_grouped(self, setup):
        pts, q, gt_ids, gt_dists, assign, clusters = setup
        ivf = IVFIndex(pts, clusters)
        router = centroid_router(pts, clusters)
        probes = router.query(q, rule="min_dist")[:, :3]
        dd, di = ivf.search_probed(q, probes, 10)
        gd, gi = ivf.search_probed_grouped(q, probes, 10, query_block=16)
        np.testing.assert_allclose(dd, gd, rtol=1e-3, atol=1e-3)

    def test_full_probe_recall_is_one(self, setup):
        pts, q, gt_ids, gt_dists, assign, clusters = setup
        import jax
        ivf = IVFIndex(pts, clusters, precision=jax.lax.Precision.HIGHEST)
        probes = np.tile(np.arange(8), (len(q), 1))
        dd, _ = ivf.search_probed(q, probes, 10)
        kth = kth_neighbor_distance(gt_dists, 10)
        assert recall_from_candidate_distances(dd, kth, 10) == 1.0

    def test_recall_from_ids_robust_to_search_precision(self, setup):
        # default (fast) precision search, exact recall from ids
        pts, q, gt_ids, gt_dists, assign, clusters = setup
        from gpann_tpu.eval import recall_from_ids
        ivf = IVFIndex(pts, clusters)
        probes = np.tile(np.arange(8), (len(q), 1))
        _, ii = ivf.search_probed(q, probes, 10)
        kth = kth_neighbor_distance(gt_dists, 10)
        assert recall_from_ids(pts, q, ii, kth, 10) == 1.0

    def test_hits_per_shard(self, setup):
        pts, q, gt_ids, gt_dists, assign, clusters = setup
        ivf = IVFIndex(pts, clusters)
        sd, si = ivf.search_all_shards(q, 10)
        kth = kth_neighbor_distance(gt_dists, 10)
        hits = hits_per_shard(sd, kth)
        # total hits across shards covers all k (non-overlapping partition)
        assert hits.shape == (8, len(q))
        np.testing.assert_array_equal(hits.sum(axis=0), np.full(len(q), 10))


class TestRouters:
    def test_centroid_router_beats_random(self, setup):
        pts, q, gt_ids, gt_dists, assign, clusters = setup
        router = centroid_router(pts, clusters)
        probes = router.query(q, rule="min_dist")
        kth = kth_neighbor_distance(gt_dists, 10)
        ivf = IVFIndex(pts, clusters)
        dd, _ = ivf.search_probed(q, probes[:, :2], 10)
        routed = recall_from_candidate_distances(dd, kth, 10, eps=1e-2)
        rng = np.random.default_rng(0)
        rand_probes = np.stack([rng.permutation(8)[:2] for _ in range(len(q))])
        rd, _ = ivf.search_probed(q, rand_probes, 10)
        random_recall = recall_from_candidate_distances(rd, kth, 10, eps=1e-2)
        assert routed > random_recall + 0.2, (routed, random_recall)

    def test_probe_rules_shapes_and_padding(self, setup):
        pts, q, gt_ids, gt_dists, assign, clusters = setup
        router = centroid_router(pts, clusters)
        min_d, freq = router.query_votes(q, 8)
        for ranker, arg in [
            (rank_min_dist, min_d),
            (rank_pyramid, min_d),
            (rank_spann, min_d),
        ]:
            order = ranker(arg)
            assert order.shape == (len(q), 8)
            first = order[:, 0]
            assert (first >= 0).all()
        order = rank_frequency(freq, min_d)
        assert order.shape == (len(q), 8)
        # frequency rule: first shard has max votes
        got = freq[np.arange(len(q)), order[:, 0]]
        assert (got == freq.max(axis=1)).all()

    def test_spann_cuts_far_shards(self):
        min_d = np.array([[1.0, 10.0, 1.2, np.inf]])
        order = rank_spann(min_d, eps=0.5)
        assert order[0, 0] == 0 and order[0, 1] == 2
        assert (order[0, 2:] == -1).all()

    def test_kmeans_tree_router_routing_recall(self, setup):
        pts, q, gt_ids, gt_dists, assign, clusters = setup
        opts = KMeansTreeRouterOptions(num_centroids=8, min_cluster_size=50,
                                       budget=400)
        router = KMeansTreeRouter().train(pts, clusters, opts)
        rp, labels = router.extract_points()
        assert rp.shape[0] == labels.shape[0] > 8  # more than 1 centroid/shard
        probes = router.query(q)
        # first-probe oracle comparison: routed first shard captures most GT
        from gpann_tpu.eval import max_first_shard_routing_recall

        r = max_first_shard_routing_recall(gt_ids, list(probes), assign)
        oracle = oracle_recall(gt_ids, partition=assign)[0]
        assert r > 0.6 * oracle, (r, oracle)

    def test_budgeted_query_limits(self, setup):
        """Capped-descent walk (kmeans_tree_router.cpp:93-130 analog):
        budget >= index size == full scan; tiny budgets stay valid, account
        their distance comps, and route no better than the full scan."""
        pts, q, gt_ids, gt_dists, assign, clusters = setup
        opts = KMeansTreeRouterOptions(num_centroids=8, min_cluster_size=50,
                                       budget=400)
        router = KMeansTreeRouter().train(pts, clusters, opts)
        r = len(router.points)
        g = len(router.top_index)
        assert router.group_of.shape == (r,)
        # groups partition the centroids; each top centroid leads its group
        assert (router.group_of[router.top_index] == np.arange(g)).all()

        full = router.query(q, search_budget=r)
        unbounded = router.query_budgeted(q, search_budget=10 * r)
        np.testing.assert_array_equal(full, unbounded)

        from gpann_tpu.eval import max_first_shard_routing_recall

        _, _, calcs_small = router.budgeted_votes(q, g + 8)
        assert g <= calcs_small <= g + 8 + router.group_of.size / g * 4
        probes_small = router.query_budgeted(q, search_budget=g + 8)
        assert probes_small.shape == (len(q), 8)
        rec_small = max_first_shard_routing_recall(
            gt_ids, list(probes_small), assign)
        rec_full = max_first_shard_routing_recall(gt_ids, list(full), assign)
        assert rec_small <= rec_full + 0.05, (rec_small, rec_full)
        # frequency variant runs and shapes check out
        pf = router.frequency_query_budgeted(q, 40, search_budget=g + 32)
        assert pf.shape == (len(q), 8)

    def test_frequency_query_works(self, setup):
        pts, q, gt_ids, gt_dists, assign, clusters = setup
        opts = KMeansTreeRouterOptions(num_centroids=8, min_cluster_size=50,
                                       budget=400)
        router = KMeansTreeRouter().train(pts, clusters, opts)
        probes = router.frequency_query(q, num_voting_neighbors=40)
        assert probes.shape == (len(q), 8)

    def test_flat_router_save_load(self, setup, tmp_path):
        pts, q, gt_ids, gt_dists, assign, clusters = setup
        router = centroid_router(pts, clusters)
        path = str(tmp_path / "router")
        router.save(path)
        loaded = FlatRouter.load(path)
        np.testing.assert_array_equal(
            loaded.query(q, rule="min_dist"), router.query(q, rule="min_dist")
        )


class TestMIPS:
    def test_mips_end_to_end(self):
        rng = np.random.default_rng(7)
        pts = rng.standard_normal((2000, 12)).astype(np.float32)
        q = rng.standard_normal((32, 12)).astype(np.float32)
        from gpann_tpu.eval import compute_ground_truth, recall_from_ids
        gt_ids, gt_dists = compute_ground_truth(pts, q, 10, metric="mips")
        kth = kth_neighbor_distance(gt_dists, 10)
        from gpann_tpu.cluster import balanced_kmeans
        _, assign = balanced_kmeans(pts, k=4, eps=0.3, metric="mips", seed=2)
        clusters = partition_to_clusters(assign, 4)
        ivf = IVFIndex(pts, clusters, metric="mips")
        probes = np.tile(np.arange(4), (len(q), 1))
        _, ii = ivf.search_probed(q, probes, 10)
        assert recall_from_ids(pts, q, ii, kth, 10, metric="mips") == 1.0
        router = centroid_router(pts, clusters, metric="mips")
        order = router.query(q, rule="min_dist")
        assert order.shape == (32, 4)

    def test_mips_serving_engine(self):
        rng = np.random.default_rng(8)
        pts = rng.standard_normal((1500, 10)).astype(np.float32)
        q = rng.standard_normal((16, 10)).astype(np.float32)
        from gpann_tpu.eval import compute_ground_truth, recall_from_ids
        from gpann_tpu.search.serve import ServingEngine
        gt_ids, gt_dists = compute_ground_truth(pts, q, 10, metric="mips")
        kth = kth_neighbor_distance(gt_dists, 10)
        from gpann_tpu.cluster import balanced_kmeans
        _, assign = balanced_kmeans(pts, k=4, eps=0.3, metric="mips", seed=3)
        clusters = partition_to_clusters(assign, 4)
        router = centroid_router(pts, clusters, metric="mips")
        engine = ServingEngine(pts, clusters, np.asarray(router.points),
                               router.labels_np, metric="mips",
                               pad_multiple=128)
        _, fi = engine.serve(q, k=10, nprobes=4, voting_t=4, query_block=16)
        assert recall_from_ids(pts, q, fi, kth, 10, metric="mips") == 1.0
