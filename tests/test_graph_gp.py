"""Graph-builder + partitioner tests: graph recall vs exact oracle, balance
property tests for every method, overlap budget checks."""

import numpy as np
import pytest

from gpann_tpu.core.partition import (
    clusters_to_cover,
    cluster_sizes,
    max_part_size,
)
from gpann_tpu.eval import compute_ground_truth, oracle_recall
from gpann_tpu.gp import api
from gpann_tpu.graph import (
    ApproximateKNNGraphBuilder,
    build_exact_knn_graph,
    graph_recall,
    symmetrize_to_csr,
)
from gpann_tpu.gp.lp import partition_graph


def make_blobs(rng, n=3000, kb=6, d=12, spread=0.3, scale=4.0):
    centers = rng.standard_normal((kb, d)).astype(np.float32) * scale
    lbl = rng.integers(0, kb, size=n)
    pts = (centers[lbl] + spread * rng.standard_normal((n, d))).astype(np.float32)
    return pts, lbl


class TestKNNGraph:
    def test_exact_graph_no_self_edges(self, rng):
        pts = rng.standard_normal((200, 8)).astype(np.float32)
        g = build_exact_knn_graph(pts, 5)
        assert g.shape == (200, 5)
        assert not (g == np.arange(200)[:, None]).any()

    def test_exact_graph_matches_numpy(self, rng):
        pts = rng.standard_normal((100, 6)).astype(np.float32)
        g = build_exact_knn_graph(pts, 4)
        dm = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        np.fill_diagonal(dm, np.inf)
        want = np.argsort(dm, axis=1)[:, :4]
        # compare neighbor distance values (ties allowed)
        got_d = np.take_along_axis(dm, g.astype(np.int64), axis=1)
        want_d = np.take_along_axis(dm, want, axis=1)
        np.testing.assert_allclose(np.sort(got_d, 1), np.sort(want_d, 1),
                                   rtol=1e-3, atol=1e-3)

    def test_approx_graph_recall(self, rng):
        # 12k points forces at least one sketching recursion (>MAX_CLUSTER_SIZE)
        pts, _ = make_blobs(rng, n=12000, kb=10, d=10)
        builder = ApproximateKNNGraphBuilder(seed=555)
        approx = builder.build(pts, 6)
        exact = build_exact_knn_graph(pts, 6)
        rec = graph_recall(approx[:1000], exact[:1000])
        assert rec > 0.8, rec  # reference achieves ~0.9 at defaults

    def test_symmetrize_csr(self):
        g = np.array([[1], [0], [0]], dtype=np.int32)  # 2->0 one-directional
        indptr, indices, w = symmetrize_to_csr(g)
        assert indptr[-1] == len(indices)
        # edge 0-1 confirmed both ways -> weight 2; 0-2 weight 1
        e01 = w[(indices[indptr[0]:indptr[1]] == 1).argmax()]
        assert set(indices[indptr[0]:indptr[1]]) == {1, 2}


class TestLPPartitioner:
    def test_balance_and_quality_on_blobs(self, rng):
        pts, lbl = make_blobs(rng, n=4000, kb=8)
        g = build_exact_knn_graph(pts, 8)
        indptr, indices, w = symmetrize_to_csr(g)
        part = partition_graph(indptr, indices, w, k=8, eps=0.05)
        sizes = np.bincount(part, minlength=8)
        assert sizes.max() <= max_part_size(4000, 8, 0.05)
        u = np.repeat(np.arange(4000), 8)
        cut = (part[u] != part[g.reshape(-1)]).mean()
        assert cut < 0.15, cut

    def test_node_weights_respected(self, rng):
        pts, _ = make_blobs(rng, n=1000, kb=4)
        g = build_exact_knn_graph(pts, 6)
        indptr, indices, w = symmetrize_to_csr(g)
        nw = rng.integers(1, 5, size=1000).astype(np.float32)
        part = partition_graph(indptr, indices, w, k=4, eps=0.1, node_weights=nw)
        weights = np.zeros(4)
        np.add.at(weights, part, nw)
        cap = (1.1) * np.ceil(nw.sum() / 4)
        assert weights.max() <= cap


@pytest.mark.parametrize(
    "method", ["Random", "FlatKMeans", "KMeans", "BalancedKMeans", "RKM", "GP",
               "Pyramid", "OurPyramid"]
)
def test_flat_methods_balance(rng, method):
    pts, _ = make_blobs(rng, n=2000, kb=8, d=10)
    clusters = api.partition(pts, 8, method, eps=0.05)
    sizes = cluster_sizes(clusters)
    assert sizes.sum() == 2000  # every point assigned exactly once
    if method != "FlatKMeans":  # FlatKMeans has no balance guarantee
        assert sizes.max() <= max_part_size(2000, 8, 0.05), (method, sizes)


@pytest.mark.parametrize("method", ["OGP", "OKM", "OBKM", "ORKM", "OGPS"])
def test_overlapping_methods_budget(rng, method):
    pts, _ = make_blobs(rng, n=2000, kb=8, d=10)
    overlap = 0.2
    clusters = api.partition(pts, 8, method, eps=0.05, overlap=overlap)
    sizes = cluster_sizes(clusters)
    total = sizes.sum()
    assert total >= 2000  # every point at least once
    assert total <= 2000 * (1 + overlap) + len(clusters)  # budget respected
    # no duplicate membership within one cluster
    for c in clusters:
        assert len(np.unique(c)) == len(c)
    # cover consistency: every point covered
    cover = clusters_to_cover(clusters, n=2000)
    assert all(len(c) >= 1 for c in cover)


def test_gp_oracle_recall_beats_random(rng):
    pts, _ = make_blobs(rng, n=3000, kb=8, d=10)
    q = pts[:100] + 0.05 * rng.standard_normal((100, 10)).astype(np.float32)
    gt_ids, _ = compute_ground_truth(pts, q, 10)
    gp_clusters = api.partition(pts, 8, "GP", eps=0.05)
    rand_clusters = api.partition(pts, 8, "Random")
    from gpann_tpu.core.partition import clusters_to_partition

    gp_curve = oracle_recall(gt_ids, partition=clusters_to_partition(gp_clusters, 3000))
    rand_curve = oracle_recall(gt_ids, partition=clusters_to_partition(rand_clusters, 3000))
    assert gp_curve[0] > rand_curve[0] + 0.3, (gp_curve[0], rand_curve[0])
    assert gp_curve[0] > 0.8


class TestDeterminism:
    def test_partition_graph_deterministic(self, rng):
        pts, _ = make_blobs(rng, n=1500, kb=6, d=8)
        g = build_exact_knn_graph(pts, 6)
        indptr, indices, w = symmetrize_to_csr(g)
        a = partition_graph(indptr, indices, w, k=6, eps=0.05, seed=42)
        b = partition_graph(indptr, indices, w, k=6, eps=0.05, seed=42)
        np.testing.assert_array_equal(a, b)

    def test_approx_graph_deterministic(self, rng):
        pts, _ = make_blobs(rng, n=6000, kb=6, d=8)
        a = ApproximateKNNGraphBuilder(seed=9).build(pts, 5)
        b = ApproximateKNNGraphBuilder(seed=9).build(pts, 5)
        np.testing.assert_array_equal(a, b)

    def test_api_partition_deterministic(self, rng):
        pts, _ = make_blobs(rng, n=1200, kb=4, d=8)
        a = api.partition(pts, 4, "BalancedKMeans", seed=11)
        b = api.partition(pts, 4, "BalancedKMeans", seed=11)
        for ca, cb in zip(a, b):
            np.testing.assert_array_equal(ca, cb)


def test_centroid_overlap_streamed_matches_exact_greedy():
    """Single-chunk streamed overlap == exact global cheapest-first greedy
    (overlapping_partitioning.cpp:190-216 semantics) under identical reps."""
    from gpann_tpu.gp.overlap import (apply_extra_assignments,
                                      centroid_overlap_streamed,
                                      foreign_cluster_candidates)

    rng = np.random.default_rng(7)
    n, d, k = 2000, 8, 5
    pts = rng.standard_normal((n, d)).astype(np.float32)
    assign = rng.integers(0, k, size=n).astype(np.int32)
    reps = rng.standard_normal((k * 4, d)).astype(np.float32)
    rep_lbl = np.repeat(np.arange(k), 4).astype(np.int32)
    cap = int(1.3 * n / k)
    num_extra = 300

    ep, ec = centroid_overlap_streamed(
        pts, assign, reps, rep_lbl, k, cap, num_extra, keep=3)
    assert len(ep) == num_extra
    # every extra is foreign and capacity holds
    assert (assign[ep] != ec).all()
    sizes = np.bincount(assign, minlength=k) + np.bincount(ec, minlength=k)
    assert (sizes <= cap).all()

    # exact oracle: same candidates, strict global cheapest-first admission
    od, oc = foreign_cluster_candidates(pts, assign, reps, rep_lbl, k, keep=3)
    flat = sorted(
        (od[p, j], p, oc[p, j]) for p in range(n) for j in range(od.shape[1])
    )
    sizes0 = np.bincount(assign, minlength=k).astype(int)
    want = set()
    left = num_extra
    for dist, p, c in flat:
        if left == 0:
            break
        if sizes0[c] < cap:
            want.add((p, int(c)))
            sizes0[c] += 1
            left -= 1
    got = set(zip(ep.tolist(), ec.tolist()))
    assert got == want

    cover = apply_extra_assignments(
        [np.nonzero(assign == b)[0].astype(np.int32) for b in range(k)],
        ep, ec)
    assert sum(len(c) for c in cover) == n + num_extra
