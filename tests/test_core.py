"""Core-layer unit tests vs NumPy oracles (test pyramid per SURVEY.md §4)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gpann_tpu.core import (
    assign_closest,
    clusters_to_cover,
    clusters_to_partition,
    cover_to_clusters,
    l2_normalize,
    pairwise_distances,
    partition_to_clusters,
    read_clusters,
    read_ground_truth,
    read_metis_graph,
    read_metis_partition,
    read_points,
    remap_partition_ids,
    sq_norms,
    topk_neighbors,
    write_clusters,
    write_ground_truth,
    write_metis_graph,
    write_metis_partition,
    write_points,
)
from gpann_tpu.core.partition import check_cover_consistency, pad_clusters


def np_l2(q, x):
    return ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)


def np_mips(q, x):
    return 1.0 - q @ x.T


class TestDistances:
    def test_pairwise_l2_matches_numpy(self, rng):
        q = rng.standard_normal((13, 24)).astype(np.float32)
        x = rng.standard_normal((37, 24)).astype(np.float32)
        got = np.asarray(pairwise_distances(jnp.asarray(q), jnp.asarray(x), "l2"))
        np.testing.assert_allclose(got, np_l2(q, x), rtol=1e-4, atol=1e-4)

    def test_pairwise_mips_matches_numpy(self, rng):
        q = rng.standard_normal((5, 8)).astype(np.float32)
        x = rng.standard_normal((9, 8)).astype(np.float32)
        got = np.asarray(pairwise_distances(jnp.asarray(q), jnp.asarray(x), "mips"))
        np.testing.assert_allclose(got, np_mips(q, x), rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("metric", ["l2", "mips"])
    @pytest.mark.parametrize("block_rows", [1000, 64])  # single-shot and streamed
    def test_topk_matches_numpy(self, rng, metric, block_rows):
        q = rng.standard_normal((11, 16)).astype(np.float32)
        x = rng.standard_normal((300, 16)).astype(np.float32)
        k = 7
        dists, ids = topk_neighbors(
            jnp.asarray(q), jnp.asarray(x), k, metric=metric, block_rows=block_rows
        )
        dm = np_l2(q, x) if metric == "l2" else np_mips(q, x)
        want_ids = np.argsort(dm, axis=1, kind="stable")[:, :k]
        want_d = np.take_along_axis(dm, want_ids, axis=1)
        np.testing.assert_allclose(np.asarray(dists), want_d, rtol=1e-3, atol=1e-3)
        # ids may differ on ties; distances must match
        got_d = np.take_along_axis(dm, np.asarray(ids), axis=1)
        np.testing.assert_allclose(got_d, want_d, rtol=1e-3, atol=1e-3)

    def test_assign_closest(self, rng):
        x = rng.standard_normal((50, 4)).astype(np.float32)
        c = rng.standard_normal((6, 4)).astype(np.float32)
        d, idx = assign_closest(jnp.asarray(x), jnp.asarray(c))
        want = np_l2(x, c).argmin(1)
        np.testing.assert_array_equal(np.asarray(idx), want)
        np.testing.assert_allclose(
            np.asarray(d), np_l2(x, c).min(1), rtol=1e-4, atol=1e-4
        )

    def test_l2_normalize(self, rng):
        x = rng.standard_normal((10, 5)).astype(np.float32)
        n = np.asarray(l2_normalize(jnp.asarray(x)))
        np.testing.assert_allclose(np.asarray(sq_norms(n)), 1.0, rtol=1e-5)


class TestPartitionTypes:
    def test_roundtrip_partition_clusters(self, rng):
        part = rng.integers(0, 7, size=100).astype(np.int32)
        clusters = partition_to_clusters(part)
        back = clusters_to_partition(clusters, n=100)
        np.testing.assert_array_equal(back, part)

    def test_cover_roundtrip(self, rng):
        clusters = [np.array([0, 1, 2]), np.array([2, 3]), np.array([0, 4])]
        cover = clusters_to_cover(clusters, n=5)
        assert check_cover_consistency(cover, clusters)
        back = cover_to_clusters(cover, k=3)
        for a, b in zip(clusters, back):
            np.testing.assert_array_equal(np.sort(a), np.sort(b))

    def test_remap_ids(self):
        part = np.array([5, 5, 2, 9, 2], dtype=np.int32)
        remapped = remap_partition_ids(part)
        np.testing.assert_array_equal(remapped, [1, 1, 0, 2, 0])

    def test_pad_clusters(self):
        clusters = [np.array([3, 1]), np.array([2]), np.array([], dtype=np.int32)]
        padded, sizes = pad_clusters(clusters)
        np.testing.assert_array_equal(sizes, [2, 1, 0])
        np.testing.assert_array_equal(padded, [[3, 1], [2, -1], [-1, -1]])


class TestIO:
    @pytest.mark.parametrize("suffix,dtype", [(".fbin", np.float32), (".u8bin", np.uint8), (".i8bin", np.int8)])
    def test_points_roundtrip(self, tmp_path, rng, suffix, dtype):
        path = str(tmp_path / f"pts{suffix}")
        if dtype == np.float32:
            pts = rng.standard_normal((20, 6)).astype(np.float32)
        else:
            info = np.iinfo(dtype)
            pts = rng.integers(info.min, info.max, size=(20, 6)).astype(dtype)
        write_points(path, pts)
        got = read_points(path)
        assert got.dtype == np.float32
        np.testing.assert_array_equal(got, pts.astype(np.float32))
        prefix = read_points(path, size=7)
        np.testing.assert_array_equal(prefix, pts[:7].astype(np.float32))

    def test_ground_truth_roundtrip(self, tmp_path, rng):
        path = str(tmp_path / "gt.bin")
        ids = rng.integers(0, 1000, size=(15, 10)).astype(np.uint32)
        dists = rng.random((15, 10)).astype(np.float32)
        write_ground_truth(path, ids, dists)
        gids, gdists = read_ground_truth(path)
        np.testing.assert_array_equal(gids, ids.astype(np.int32))
        np.testing.assert_allclose(gdists, dists)

    def test_metis_partition_roundtrip(self, tmp_path):
        path = str(tmp_path / "p.txt")
        part = np.array([0, 1, 2, 1, 0], dtype=np.int32)
        write_metis_partition(path, part)
        np.testing.assert_array_equal(read_metis_partition(path), part)

    def test_clusters_roundtrip(self, tmp_path):
        path = str(tmp_path / "c.txt")
        clusters = [np.array([0, 2, 4]), np.array([], dtype=np.int32), np.array([1, 3])]
        write_clusters(path, clusters)
        got = read_clusters(path)
        assert len(got) == 3
        for a, b in zip(clusters, got):
            np.testing.assert_array_equal(a, b)

    def test_metis_graph_roundtrip(self, tmp_path):
        path = str(tmp_path / "g.graph")
        adj = [np.array([1, 2]), np.array([0]), np.array([0])]
        write_metis_graph(path, adj)
        got = read_metis_graph(path)
        for a, b in zip(adj, got):
            np.testing.assert_array_equal(a, b)
