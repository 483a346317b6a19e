"""Streaming (out-of-HBM) paths: memmap-backed k-means, capacity partition,
streaming top-k — results must match the in-memory implementations."""

import numpy as np

from gpann_tpu.cluster.streaming import (
    streaming_capacity_partition,
    streaming_kmeans,
)
from gpann_tpu.core.distances import streaming_topk_neighbors, chunked_topk_neighbors
from gpann_tpu.core.partition import max_part_size


def make_memmap(tmp_path, rng, n=5000, d=8):
    path = str(tmp_path / "pts.dat")
    pts = (rng.standard_normal((n, d)) * 2).astype(np.float32)
    mm = np.memmap(path, dtype=np.float32, mode="w+", shape=(n, d))
    mm[:] = pts
    mm.flush()
    return np.memmap(path, dtype=np.float32, mode="r", shape=(n, d)), pts


def test_streaming_kmeans_matches_inmemory(tmp_path, rng):
    mm, pts = make_memmap(tmp_path, rng)
    c_stream, a_stream = streaming_kmeans(mm, 8, rounds=5, chunk_rows=1024,
                                          seed=3)
    c_mem, a_mem = streaming_kmeans(pts, 8, rounds=5, chunk_rows=10_000,
                                    seed=3)
    # same seed, same math -> same centroids regardless of chunking
    np.testing.assert_allclose(c_stream, c_mem, rtol=1e-4, atol=1e-4)
    assert (a_stream == a_mem).mean() > 0.999


def test_streaming_capacity_partition_balance(tmp_path, rng):
    mm, pts = make_memmap(tmp_path, rng, n=4000)
    part = streaming_capacity_partition(mm, 8, eps=0.05, rounds=4,
                                        chunk_rows=512, seed=4)
    assert (part >= 0).all()
    sizes = np.bincount(part, minlength=8)
    assert sizes.sum() == 4000
    assert sizes.max() <= max_part_size(4000, 8, 0.05)


def test_subsample_gp_partition_balance_and_quality(tmp_path, rng):
    """Subsample-GP on 'hard' data: balance cap holds and the partition
    beats random on downstream oracle recall (the paper's quality metric)."""
    from gpann_tpu.eval import compute_ground_truth, oracle_recall
    from gpann_tpu.eval.synth import generate, generate_queries
    from gpann_tpu.gp.scale import subsample_gp_partition

    n, d, k = 30_000, 16, 6
    pts = generate("hard", n, d, seed=21)
    part, (aggs, lbl, sidx, sub_part) = subsample_gp_partition(
        pts, k=k, eps=0.05, seed=21, num_subsample=8_000, num_aggregate=256,
        chunk_rows=8192, return_artifacts=True,
    )
    assert (part >= 0).all()
    sizes = np.bincount(part, minlength=k)
    assert sizes.sum() == n
    assert sizes.max() <= max_part_size(n, k, 0.05)
    assert len(aggs) == len(lbl) and lbl.max() < k
    # subsample members should mostly land in their GP part (capacity can
    # move boundary points)
    agree = (part[sidx] == sub_part).mean()
    assert agree > 0.8, agree

    q = generate_queries("hard", 64, d, seed=21)
    gt_i, _ = compute_ground_truth(pts, q, 10)
    curve = oracle_recall(gt_i, partition=part)
    from gpann_tpu.gp.partitioning import random_partition

    rand_curve = oracle_recall(gt_i, partition=random_partition(n, k))
    assert curve[0] > rand_curve[0] + 0.2, (curve[0], rand_curve[0])


def test_capacity_stream_assign_labeled_reps(rng):
    """Representatives labeled by part: every point lands in an open part,
    nearest-rep semantics hold when capacity is slack."""
    from gpann_tpu.cluster.streaming import capacity_stream_assign

    n, d, k = 2000, 8, 4
    centers = rng.standard_normal((k, d)).astype(np.float32) * 10
    lbl = np.repeat(np.arange(k), 3)
    reps = (centers[lbl] + 0.01 * rng.standard_normal((len(lbl), d))
            ).astype(np.float32)
    pts = (centers[rng.integers(0, k, n)]
           + 0.1 * rng.standard_normal((n, d))).astype(np.float32)
    part = capacity_stream_assign(pts, reps, lbl, k, eps=0.5, chunk_rows=512)
    assert (part >= 0).all()
    # slack capacity -> pure nearest-center assignment
    dm = ((pts[:, None] - centers[None]) ** 2).sum(-1)
    assert (part == dm.argmin(1)).mean() > 0.99


def test_u8_base_end_to_end(tmp_path):
    """Byte-quantized base (points_io.cpp:114-124 widening semantics):
    memmap stays u8 on disk; every streaming stage widens chunks on the fly
    and the full pipeline (partition -> router-free probe -> streamed
    search) matches GT computed on the widened values."""
    from gpann_tpu.cluster.streaming import streaming_capacity_partition
    from gpann_tpu.core.distances import streaming_topk_neighbors
    from gpann_tpu.core.partition import partition_to_clusters
    from gpann_tpu.eval import kth_neighbor_distance
    from gpann_tpu.eval.synth import generate, generate_queries
    from gpann_tpu.search.streamed import StreamedShardEngine

    n, d, k, s = 20_000, 16, 10, 4
    path = str(tmp_path / "base_u8.npy")
    base = generate("hard", n, d, seed=13, dtype="u8", out_path=path,
                    chunk_rows=4096)
    assert base.dtype == np.uint8
    q = generate_queries("hard", 32, d, seed=13, dtype="u8")
    assert q.dtype == np.float32 and q.max() <= 255.0

    part = streaming_capacity_partition(base, k=s, eps=0.05, rounds=4,
                                        chunk_rows=4096, seed=13)
    sizes = np.bincount(part, minlength=s)
    assert sizes.max() <= max_part_size(n, s, 0.05)

    gt_d, gt_i = streaming_topk_neighbors(q, base, k, base_chunk=8192)
    kth = kth_neighbor_distance(gt_d.astype(np.float32), k)

    clusters = partition_to_clusters(part, s)
    rng2 = np.random.default_rng(13)
    rsub = np.sort(rng2.choice(n, 1000, replace=False))
    rp = np.asarray(base[rsub], np.float32)
    engine = StreamedShardEngine(base, clusters, rp, part[rsub],
                                 scan_mode="exact")
    curve, _ = engine.recall_curve(q, k, kth)
    assert curve[-1] >= 0.999  # all shards probed == exact on widened base


def test_streaming_topk_matches_chunked(tmp_path, rng):
    mm, pts = make_memmap(tmp_path, rng, n=3000, d=12)
    q = rng.standard_normal((40, 12)).astype(np.float32)
    sd, si = streaming_topk_neighbors(q, mm, 10, base_chunk=700)
    cd, ci = chunked_topk_neighbors(q, pts, 10)
    np.testing.assert_allclose(sd, cd, rtol=1e-4, atol=1e-4)
    # ids may differ on exact ties only
    dm = ((q[:, None] - pts[None]) ** 2).sum(-1)
    np.testing.assert_allclose(
        np.take_along_axis(dm, si, axis=1),
        np.take_along_axis(dm, ci.astype(np.int64), axis=1),
        rtol=1e-3, atol=1e-3,
    )
