"""StreamedShardEngine: beyond-HBM shard-at-a-time serving parity tests."""

import numpy as np
import pytest

from gpann_tpu.cluster.kmeans import balanced_kmeans
from gpann_tpu.cluster.streaming import streaming_capacity_partition
from gpann_tpu.core.partition import partition_to_clusters
from gpann_tpu.eval import compute_ground_truth, kth_neighbor_distance
from gpann_tpu.eval.synth import generate, generate_queries
from gpann_tpu.search.serve import ServingEngine
from gpann_tpu.search.streamed import StreamedShardEngine

N, D, NQ, S, K = 20_000, 24, 64, 8, 10


@pytest.fixture(scope="module")
def setup():
    pts = generate("hard", N, D, seed=7)
    q = generate_queries("hard", NQ, D, seed=7)
    _, assign = balanced_kmeans(pts, k=S, eps=0.05, seed=7)
    clusters = partition_to_clusters(assign, S)
    rng = np.random.default_rng(3)
    rsub = np.sort(rng.choice(N, 2000, replace=False))
    rp, rl = pts[rsub], assign[rsub]
    return pts, q, clusters, rp, rl


@pytest.mark.parametrize("rule", ["min_dist", "frequency", "pyramid", "spann"])
def test_probe_parity_vs_serving_engine(setup, rule):
    pts, q, clusters, rp, rl = setup
    resident = ServingEngine(pts, clusters, rp, rl, scan_mode="exact")
    streamed = StreamedShardEngine(pts, clusters, rp, rl, scan_mode="exact")
    p1 = resident.probe_order(q, 4, voting_t=30, rule=rule)
    p2 = streamed.probe_order(q, 4, voting_t=30, rule=rule)
    np.testing.assert_array_equal(p1, p2)


def test_search_matches_resident_engine(setup):
    pts, q, clusters, rp, rl = setup
    resident = ServingEngine(pts, clusters, rp, rl, scan_mode="exact")
    streamed = StreamedShardEngine(pts, clusters, rp, rl, scan_mode="exact")
    d1, i1 = resident.serve(q, K, nprobes=3, voting_t=30)
    d2, i2, stats = streamed.search(q, K, nprobes=3, voting_t=30)
    # same probes -> same candidate pools; the two engines compute f32
    # distances with different (equally exact) formulas, so near-ties at the
    # k boundary may swap — demand near-total id agreement, not bit equality
    overlap = np.mean([
        len(np.intersect1d(i1[r], i2[r])) for r in range(len(q))
    ]) / K
    assert overlap >= 0.99, overlap
    np.testing.assert_allclose(np.sort(d1, axis=1)[:, : K - 1],
                               np.sort(d2, axis=1)[:, : K - 1],
                               rtol=1e-4, atol=1e-4)
    assert stats["shards_scanned"] <= S
    assert stats["bytes_uploaded"] > 0


def test_full_probe_recall_is_exact(setup):
    pts, q, clusters, rp, rl = setup
    streamed = StreamedShardEngine(pts, clusters, rp, rl, scan_mode="exact")
    gt_i, gt_d = compute_ground_truth(pts, q, K)
    kth = kth_neighbor_distance(gt_d, K)
    curve, _ = streamed.recall_curve(q, K, kth)
    assert curve[-1] >= 0.999  # all shards probed == exact
    assert np.all(np.diff(curve) >= -1e-9)  # monotone in nprobes


def test_memmap_input(tmp_path, setup):
    pts, q, clusters, rp, rl = setup
    path = str(tmp_path / "base.npy")
    np.save(path, pts)
    mm = np.load(path, mmap_mode="r")
    streamed = StreamedShardEngine(mm, clusters, rp, rl, scan_mode="exact")
    d, i, _ = streamed.search(q, K, nprobes=2, voting_t=30)
    assert np.isfinite(d[:, 0]).all()


def test_streaming_capacity_partition_train_sample():
    pts = generate("hard", 30_000, 16, seed=11)
    part = streaming_capacity_partition(pts, k=6, eps=0.05, seed=11,
                                        chunk_rows=8192, train_sample=5_000)
    sizes = np.bincount(part, minlength=6)
    assert part.min() >= 0
    assert sizes.max() <= (1.05) * np.ceil(30_000 / 6)


def test_synth_generate_chunked_deterministic(tmp_path):
    a = generate("hard", 5000, 16, seed=5, chunk_rows=1024)
    path = str(tmp_path / "x.npy")
    b = generate("hard", 5000, 16, seed=5, chunk_rows=1024, out_path=path)
    np.testing.assert_array_equal(a, np.asarray(b))
    c = generate("blobs", 1000, 16, seed=5)
    assert c.shape == (1000, 16) and c.dtype == np.float32
