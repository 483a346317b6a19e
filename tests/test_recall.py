"""Eval-layer tests: GT vs NumPy oracle, recall definitions, oracle recall."""

import numpy as np

from gpann_tpu.eval import (
    compute_ground_truth,
    gt_shard_counts,
    kth_neighbor_distance,
    oracle_recall,
    recall_from_candidate_distances,
    verify_ground_truth,
)


def test_ground_truth_matches_numpy(rng):
    base = rng.standard_normal((500, 12)).astype(np.float32)
    queries = rng.standard_normal((30, 12)).astype(np.float32)
    ids, dists = compute_ground_truth(base, queries, 5)
    dm = ((queries[:, None, :] - base[None, :, :]) ** 2).sum(-1)
    want_d = np.sort(dm, axis=1)[:, :5]
    np.testing.assert_allclose(dists, want_d, rtol=1e-4, atol=1e-4)


def test_verify_ground_truth_resorts(rng):
    base = rng.standard_normal((200, 8)).astype(np.float32)
    queries = rng.standard_normal((10, 8)).astype(np.float32)
    ids, dists = compute_ground_truth(base, queries, 6)
    # shuffle columns to simulate an unsorted GT file
    perm = rng.permutation(6)
    sids, sdists = verify_ground_truth(base, queries, ids[:, perm], dists[:, perm])
    np.testing.assert_array_equal(sids, ids)
    np.testing.assert_allclose(sdists, dists, rtol=1e-4, atol=1e-4)


def test_recall_threshold_definition():
    kth = np.array([1.0, 2.0], dtype=np.float32)
    cand = np.array([[0.5, 0.9, 1.5], [2.5, np.inf, np.inf]], dtype=np.float32)
    # q0: 2 hits of k=2; q1: 0 hits
    assert recall_from_candidate_distances(cand, kth, k=2) == 0.5


def test_recall_counts_ties():
    kth = np.array([1.0], dtype=np.float32)
    cand = np.array([[1.0, 1.0, 1.0]], dtype=np.float32)  # ties at threshold
    # capped at k
    assert recall_from_candidate_distances(cand, kth, k=2) == 1.0


def test_oracle_recall_partition():
    # 2 queries, k=2; shards: neighbor 0,1 -> shard 0; 2,3 -> shard 1
    gt_ids = np.array([[0, 1], [0, 2]])
    partition = np.array([0, 0, 1, 1], dtype=np.int32)
    curve = oracle_recall(gt_ids, partition=partition)
    # q0: probe shard0 => 2/2. q1: best single shard has 1 of 2.
    np.testing.assert_allclose(curve, [0.75, 1.0])


def test_oracle_recall_cover_dedup():
    # overlapping: neighbor 0 lives in both shards; must count once
    gt_ids = np.array([[0, 1]])
    cover = [np.array([0, 1]), np.array([1])]
    curve = oracle_recall(gt_ids, cover=cover, num_shards=2)
    np.testing.assert_allclose(curve, [1.0, 1.0])


def test_gt_shard_counts(rng):
    gt_ids = np.array([[0, 1, 2]])
    partition = np.array([1, 1, 0], dtype=np.int32)
    counts = gt_shard_counts(gt_ids, partition=partition)
    np.testing.assert_array_equal(counts, [[1, 2]])


def test_kth_neighbor_distance():
    d = np.array([[0.1, 0.2, 0.3]], dtype=np.float32)
    assert kth_neighbor_distance(d, 2)[0] == np.float32(0.2)
