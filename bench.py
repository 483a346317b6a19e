"""Headline benchmark: per-chip QPS at recall@10 >= 0.95 on a synthetic
clustered 8M x 96 dataset (DEEP-like shape), 32 shards of ~250k points.

Shard size (~250k) is held constant as N grows — the reference's own scaling
model (1B points / 40-60 shards over hosts, README bullet 6): routed serving
cost stays ~constant in N while brute force grows linearly, which is the
entire point of the partitioned design. At 1M points the whole base fits one
full-speed scan and routing cannot pay for itself.

Pipeline measured (the reference's SmallScaleQueries configuration, C19):
balanced k-means partition -> k-means-tree router (extracted points, flat
MXU scan) -> fused serving engine with the Pallas bin-top-2 scan kernel
(route + group + scan + merge in one XLA program; exact f32 candidate
rescore).
The probe count is the smallest reaching recall@10 >= 0.95; QPS is measured
end-to-end (routing + search) on the device with median-of-reps timing.

``vs_baseline`` = measured QPS / brute-force full-scan QPS on the same chip —
the throughput multiple the partitioned GP-ANN design buys over exact
scanning at (near-)equal recall, which is the reference system's raison
d'être. The reference publishes no absolute numbers (BASELINE.md): its C++
stack does not run on TPU hardware, so the full-scan oracle is the honest
same-hardware baseline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import sys
import time

import numpy as np

N, D, NQ, SHARDS, K = 8_000_000, 96, 4096, 32, 10
TARGET_RECALL = 0.95
SEED = 555


def main() -> int:
    import jax
    import jax.numpy as jnp

    from gpann_tpu.cluster import balanced_kmeans
    from gpann_tpu.core.partition import partition_to_clusters
    from gpann_tpu.core.timer import time_fn
    from gpann_tpu.core.distances import topk_neighbors
    from gpann_tpu.eval import (
        compute_ground_truth,
        kth_neighbor_distance,
        recall_from_ids,
    )
    from gpann_tpu.route import KMeansTreeRouter, KMeansTreeRouterOptions

    rng = np.random.default_rng(SEED)
    num_blobs = 64
    centers = rng.standard_normal((num_blobs, D)).astype(np.float32) * 2.0
    lbl = rng.integers(0, num_blobs, size=N)
    pts = (centers[lbl] + 0.6 * rng.standard_normal((N, D))).astype(np.float32)
    q = (
        centers[rng.integers(0, num_blobs, size=NQ)]
        + 0.6 * rng.standard_normal((NQ, D))
    ).astype(np.float32)
    print(f"# data ready: {pts.shape}", file=sys.stderr)

    # GT + partition are deterministic functions of (SEED, N, D, NQ, SHARDS):
    # cache them like the reference caches ground truth
    # (run_query_attribution.cpp:46-55) so bench reruns measure serving only
    import os

    cache_dir = os.path.expanduser("~/.cache/gpann_tpu")
    os.makedirs(cache_dir, exist_ok=True)
    cache = os.path.join(cache_dir, f"bench_{SEED}_{N}_{D}_{NQ}_{SHARDS}.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        gt_ids, gt_dists, assign = z["gt_ids"], z["gt_dists"], z["assign"]
        build_time = float(z["build_time"])
        print("# gt+partition loaded from cache", file=sys.stderr)
    else:
        # GT via the pallas kernel + exact re-sort: recall@10 of the scan is
        # 0.9999 (top-2-per-bin), i.e. <=0.01% of kth distances are
        # negligibly off — far tighter than the tolerances the reference
        # accepts when verifying published GT (recall.h:74-137)
        from gpann_tpu.eval.recall import verify_ground_truth
        from gpann_tpu.search.pallas_scan import fused_topk, pad_base_for_scan

        padded0, nv0 = pad_base_for_scan(pts, "l2")
        pj0 = jnp.asarray(padded0)
        gt_raw = np.asarray(fused_topk(jnp.asarray(q), pj0, nv0, 2 * K)[1])
        gt_ids, gt_dists = verify_ground_truth(
            pts, q, gt_raw.astype(np.int64), np.full(gt_raw.shape, np.nan)
        )
        gt_ids, gt_dists = gt_ids[:, :K], gt_dists[:, :K]
        del pj0, padded0
        print("# ground truth done", file=sys.stderr)
        t0 = time.time()
        _, assign = balanced_kmeans(pts, k=SHARDS, eps=0.05, seed=SEED)
        build_time = time.time() - t0
        print(f"# partition done in {build_time:.1f}s", file=sys.stderr)
        np.savez(cache, gt_ids=gt_ids, gt_dists=gt_dists, assign=assign,
                 build_time=build_time)
    kth = kth_neighbor_distance(gt_dists, K)
    clusters = partition_to_clusters(assign, SHARDS)

    opts = KMeansTreeRouterOptions(num_centroids=32, budget=40_000)
    kmtr = KMeansTreeRouter().train(pts, clusters, opts, seed=SEED)
    rp, labels = kmtr.extract_points()
    print(f"# router ready ({len(rp)} routing points)", file=sys.stderr)

    from gpann_tpu.search.serve import ServingEngine

    engine = ServingEngine(pts, clusters, rp, labels, scan_mode="binned")
    q_dev = jnp.asarray(q)  # queries resident on device (one upload)

    def serve(queries, nprobes):
        return engine.serve(queries, K, nprobes, voting_t=60, rule="min_dist")

    chosen = None
    for nprobes in range(1, SHARDS + 1):
        _, ii = serve(q_dev, nprobes)
        rec = recall_from_ids(pts, q, ii, kth, K)
        print(f"# nprobes={nprobes} recall={rec:.4f}", file=sys.stderr)
        if rec >= TARGET_RECALL:
            chosen = (nprobes, rec)
            break
    if chosen is None:
        chosen = (SHARDS, rec)
    nprobes, recall = chosen

    lat, _ = time_fn(serve, q_dev, nprobes, reps=5, warmup=2)

    # pipelined throughput: batches dispatched back-to-back, results chained
    # on device, ONE final readback — the steady-state serving number (the
    # per-batch D2H readback above costs ~50 ms of tunnel round-trip that a
    # real pipeline overlaps with compute)
    def serve_dev(nprobes):
        return engine.serve_device(q_dev, K, nprobes, voting_t=60,
                                   rule="min_dist")

    d0, _ = serve_dev(nprobes)
    float(jnp.sum(jnp.where(jnp.isfinite(d0), d0, 0.0)))  # warm + sync
    reps = 10
    t0 = time.time()
    acc = None
    for _ in range(reps):
        d0, _ = serve_dev(nprobes)
        acc = d0 if acc is None else acc + d0
    float(jnp.sum(jnp.where(jnp.isfinite(acc), acc, 0.0)))  # sync
    pipelined_lat = (time.time() - t0) / reps
    qps = NQ / pipelined_lat

    # brute-force full-scan baseline on the same chip, using the SAME scan
    # technology (Pallas bin-top-2 kernel over the whole base) so vs_baseline
    # isolates the partitioning/routing advantage, not kernel quality
    try:
        from gpann_tpu.search.pallas_scan import fused_topk, pad_base_for_scan

        padded, n_valid = pad_base_for_scan(pts, "l2")
        pj = jnp.asarray(padded)
        bd, bi = fused_topk(q_dev, pj, n_valid, K)
        brute_recall = recall_from_ids(pts, q, np.asarray(bi), kth, K)
        t0 = time.time()
        acc = None
        for _ in range(reps):
            bd, _ = fused_topk(q_dev, pj, n_valid, K)
            acc = bd if acc is None else acc + bd
        float(jnp.sum(jnp.where(jnp.isfinite(acc), acc, 0.0)))
        brute_lat = (time.time() - t0) / reps
    except Exception as e:  # pallas unavailable: XLA top_k fallback
        print(f"# pallas brute failed ({e}); XLA fallback", file=sys.stderr)
        pj = jnp.asarray(pts)
        brute_lat, _ = time_fn(
            lambda: topk_neighbors(q_dev, pj, K), reps=3, warmup=1
        )
        brute_recall = 1.0
    brute_qps = NQ / brute_lat
    print(f"# brute: {brute_qps:.0f} qps recall={brute_recall:.4f}",
          file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": f"qps_per_chip@recall{TARGET_RECALL}_synthetic-deep{N//1_000_000}M-{SHARDS}shards",
                "value": round(qps, 1),
                "unit": "qps",
                "vs_baseline": round(qps / brute_qps, 3),
                "recall_at_10": round(recall, 4),
                "nprobes": nprobes,
                "num_shards": SHARDS,
                "brute_force_qps": round(brute_qps, 1),
                "batch": NQ,
                "batch_latency_with_readback_ms": round(lat * 1e3, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
