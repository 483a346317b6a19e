"""Headline benchmark: per-chip QPS at recall@10 >= 0.95 on a synthetic
clustered 8M x 96 dataset (DEEP-like shape), 32 shards of ~250k points.

Shard size (~250k) is held constant as N grows — the reference's own scaling
model (1B points / 40-60 shards over hosts, README bullet 6): routed serving
cost stays ~constant in N while brute force grows linearly, which is the
entire point of the partitioned design. At 1M points the whole base fits one
full-speed scan and routing cannot pay for itself.

Pipeline measured (the reference's SmallScaleQueries configuration, C19):
**GP partition** — the reference's flagship method (subsample kNN graph +
balanced LP partition + capacity stream-assignment, partitioning.cpp:
251-264 + 305-356) -> k-means-tree router (extracted points, flat MXU
scan) -> fused serving engine with the Pallas bin-top-2 scan kernel
(route + group + scan + merge in one XLA program; exact f32 candidate
rescore). Measured on this data (round 3): GP oracle@1 = 1.000 vs
balanced-k-means 0.701 — the partition quality IS the QPS story, exactly
the paper's claim.

Runtime discipline (this script must finish unattended inside the driver
budget; compiles on this backend cost 20-75 s EACH):
- nprobes selection never recompiles per value: ServingEngine.recall_curve
  returns recall@10 for every probe prefix 1..SHARDS from ONE compiled
  program, and the chosen nprobes is cached alongside the ground truth.
- Every deterministic artifact (GT, partition, routing points, curve) is
  cached in ~/.cache/gpann_tpu/bench_*.npz, like the reference caches ground
  truth (run_query_attribution.cpp:46-55). Warm rerun compiles at most two
  programs (curve + serve at the chosen config, usually cached on disk too).
- Cold partition trains centroids on a 1M subsample (the reference's own
  big-input strategy, partitioning.cpp:271-276 for Pyramid).

``vs_baseline`` = measured QPS / brute-force full-scan QPS on the same chip —
the throughput multiple the partitioned GP-ANN design buys over exact
scanning at (near-)equal recall, which is the reference system's raison
d'être. The reference publishes no absolute numbers (BASELINE.md): its C++
stack does not run on TPU hardware, so the full-scan oracle is the honest
same-hardware baseline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import os
import sys
import time

import numpy as np

N, D, NQ, SHARDS, K = 8_000_000, 96, 4096, 32, 10
TARGET_RECALL = 0.95
SEED = 555
VOTING_T = 32  # GP routes are unambiguous; fewer votes, same recall (measured)
RULE = "min_dist"
QUERY_BLOCK = 128   # measured best on v5e with the single-call block kernel
# A/B knobs for the serve pipeline (default = the measured-best committed
# config); override per-run without editing the file:
#   GPANN_BENCH_VOTING = exact | approx | rescore | binned
#   GPANN_BENCH_PHASE2 = exact | approx   (candidate-bin top-k in the scan)
VOTING_IMPL = os.environ.get("GPANN_BENCH_VOTING", "approx")
# phase2="approx" (lax.approx_max_k candidate-bin pick) measured +14-24% QPS
# over "exact" at recall 0.9837 vs 0.9987 — both far above the 0.95 target;
# mechanism + A/B grid in docs/PERF.md (round 5)
SCAN_PHASE2 = os.environ.get("GPANN_BENCH_PHASE2", "approx")
# candidate-bin count for the binned scan (0 = kernel default max(k, 16));
# raising it recovers recall approx_max_k drops, at a larger rescore gather
SCAN_NC = int(os.environ.get("GPANN_BENCH_NC", "0"))

_T0 = time.time()


def log(msg: str) -> None:
    print(f"# [{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def _seed_compile_cache() -> None:
    """Seed the persistent XLA compile cache from a repo-shipped tarball.

    Round 4's driver bench timed out (BENCH_r04 rc=124) after a host recycle
    wiped ~/.cache; round 5's cold rerun measured ~900 s of XLA compiles
    (brute scan / engine / serve programs at 20-75 s each through the remote
    compile helper). The deterministic bench programs' cache entries are
    harvested from a real chip run into exp_artifacts/bench_jax_cache.tar.gz
    (same shipping discipline as the artifact cache above); a cold run then
    compiles nothing. Existing entries are never overwritten.
    """
    import tarfile

    tgz = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "exp_artifacts", "bench_jax_cache.tar.gz")
    if not os.path.exists(tgz):
        return
    dst = os.path.expanduser("~/.cache/gpann_tpu/jax_cache")
    os.makedirs(dst, exist_ok=True)
    try:
        n = 0
        with tarfile.open(tgz) as tf:
            for mem in tf.getmembers():
                if not mem.isfile():
                    continue
                out = os.path.join(dst, os.path.basename(mem.name))
                if not os.path.exists(out):
                    src = tf.extractfile(mem)
                    with open(out, "wb") as f:
                        f.write(src.read())
                    n += 1
        if n:
            log(f"compile cache seeded from repo ({n} programs)")
    except Exception as e:  # seeding is an optimization; never fail bench
        log(f"compile cache seed skipped ({e})")


def main() -> int:
    _seed_compile_cache()
    import jax.numpy as jnp

    from gpann_tpu.core.partition import partition_to_clusters
    from gpann_tpu.eval import kth_neighbor_distance, recall_from_ids
    from gpann_tpu.route import KMeansTreeRouter, KMeansTreeRouterOptions
    from gpann_tpu.search.serve import ServingEngine

    cache_dir = os.path.expanduser("~/.cache/gpann_tpu")
    os.makedirs(cache_dir, exist_ok=True)
    pts_cache = os.path.join(cache_dir, f"bench_pts_{SEED}_{N}_{D}_{NQ}.npy")
    q_cache = os.path.join(cache_dir, f"bench_q_{SEED}_{N}_{D}_{NQ}.npy")
    if os.path.exists(pts_cache) and os.path.exists(q_cache):
        # memmap: the engine's per-shard gathers and the brute baseline's
        # padding read straight from page cache, no 3 GB materialization
        pts = np.load(pts_cache, mmap_mode="r")
        q = np.load(q_cache)
        log(f"data loaded from cache: {pts.shape}")
    else:
        rng = np.random.default_rng(SEED)
        num_blobs = 64
        centers = rng.standard_normal((num_blobs, D)).astype(np.float32) * 2.0
        lbl = rng.integers(0, num_blobs, size=N)
        # chunked draws are bit-identical to one monolithic draw (Generator
        # streams are strictly sequential) but avoid the 3x 6 GB float64
        # temporaries whose page faults made the monolithic version ~10 min
        # of 86%-system-time on this host — cold-start driver budget matters
        # (round 4's driver bench timed out)
        pts = np.lib.format.open_memmap(pts_cache, mode="w+",
                                        dtype=np.float32, shape=(N, D))
        for s in range(0, N, 1 << 20):
            e = min(s + (1 << 20), N)
            pts[s:e] = (centers[lbl[s:e]]
                        + 0.6 * rng.standard_normal((e - s, D)))
        pts.flush()
        q = (
            centers[rng.integers(0, num_blobs, size=NQ)]
            + 0.6 * rng.standard_normal((NQ, D))
        ).astype(np.float32)
        np.save(q_cache, q)
        pts = np.load(pts_cache, mmap_mode="r")
        log(f"data generated + cached: {pts.shape}")

    # deterministic artifacts cached per config (SEED, N, D, NQ, SHARDS);
    # the _gp suffix marks the round-3 switch to the GP partition
    cache = os.path.join(cache_dir,
                         f"bench_{SEED}_{N}_{D}_{NQ}_{SHARDS}_gp.npz")
    art = dict(np.load(cache)) if os.path.exists(cache) else {}
    if not art:
        # GT is partition-independent: migrate it from the round-2 cache
        old = os.path.join(cache_dir, f"bench_{SEED}_{N}_{D}_{NQ}_{SHARDS}.npz")
        if os.path.exists(old):
            o = dict(np.load(old))
            art = {k: o[k] for k in ("gt_ids", "gt_dists") if k in o}
    if "assign" not in art:
        # cold-start bootstrap: round 4's driver bench timed out (rc=124)
        # because a host recycle wiped ~/.cache and the cold path recomputes
        # GT (272 s) + GP partition (1,354 s) + router — ~45 min before any
        # serving. The deterministic artifacts are small (9 MB compressed),
        # so they ship IN the repo; a cold run rebuilds only the seeded data
        # (~1 min) and the compile set. Same discipline as the reference's
        # on-disk GT cache (run_query_attribution.cpp:46-55).
        repo_art = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "exp_artifacts", "bench_8m_gp_cache.npz")
        if os.path.exists(repo_art):
            r = dict(np.load(repo_art))
            r["assign"] = r["assign"].astype(np.int32)
            r["gt_ids"] = r["gt_ids"].astype(np.int64)
            art = r
            log("artifact cache bootstrapped from repo (exp_artifacts/)")
            dirty = True  # persist to ~/.cache for the next (warm) run
        else:
            dirty = False
    else:
        dirty = False

    if "gt_ids" not in art:
        # GT via the pallas kernel + exact re-sort: recall@10 of the scan is
        # 0.9999 (top-2-per-bin) — far tighter than the tolerances the
        # reference accepts when verifying published GT (recall.h:74-137)
        from gpann_tpu.eval.recall import verify_ground_truth
        from gpann_tpu.search.pallas_scan import fused_topk, pad_base_for_scan

        padded0, nv0 = pad_base_for_scan(pts, "l2")
        pj0 = jnp.asarray(padded0)
        gt_raw = np.asarray(fused_topk(jnp.asarray(q), pj0, nv0, 2 * K)[1])
        gt_ids, gt_dists = verify_ground_truth(
            pts, q, gt_raw.astype(np.int64), np.full(gt_raw.shape, np.nan)
        )
        art["gt_ids"], art["gt_dists"] = gt_ids[:, :K], gt_dists[:, :K]
        del pj0, padded0
        dirty = True
        log("ground truth computed")
    if "assign" not in art:
        # the flagship GP partition at beyond-sample scale: kNN graph + LP
        # on a 1M subsample, per-part aggregates, capacity stream-assignment
        # (partitioning.cpp:251-264 + 305-356). Measured vs balanced
        # k-means on this data: oracle@1 1.000 vs 0.701.
        from gpann_tpu.gp.scale import subsample_gp_partition

        t0 = time.time()
        assign = subsample_gp_partition(
            pts, k=SHARDS, eps=0.05, seed=SEED,
            num_subsample=1_000_000, num_aggregate=4096,
        )
        art["assign"] = assign
        art["build_time"] = np.float64(time.time() - t0)
        dirty = True
        log(f"GP partition computed in {float(art['build_time']):.1f}s")
    kth = kth_neighbor_distance(art["gt_dists"], K)
    clusters = partition_to_clusters(art["assign"], SHARDS)

    if "routing_points" not in art:
        # train on a 2M subsample (the reference's big-input strategy,
        # partitioning.cpp:271-276): full-8M training took 17 min of the
        # cold path; 4M-subsample training measured 5.7 min at 64M scale
        rng = np.random.default_rng(SEED + 1)
        sub = np.sort(rng.choice(N, size=2_000_000, replace=False))
        sub_pts = np.asarray(pts[sub], np.float32)
        sub_clusters = partition_to_clusters(art["assign"][sub], SHARDS)
        # budget 10k: measured identical recall (0.9987 @ nprobes=1) to a
        # 40k-point router on the GP partition, and the routing matmul
        # leaves the critical path (39.3 ms/batch vs 45.0 at 33k points)
        opts = KMeansTreeRouterOptions(num_centroids=32, budget=10_000)
        kmtr = KMeansTreeRouter().train(sub_pts, sub_clusters, opts,
                                        seed=SEED)
        art["routing_points"], art["routing_labels"] = kmtr.extract_points()
        dirty = True
        log(f"router trained ({len(art['routing_points'])} routing points)")
    if dirty:
        np.savez(cache, **art)
        log("artifact cache saved")

    q_dev = jnp.asarray(q)  # queries resident on device (one upload)
    q_dev.block_until_ready()
    log("queries uploaded")
    reps = 10

    # brute-force full-scan baseline FIRST, on an otherwise-empty chip: the
    # same Pallas kernel over the whole base, so vs_baseline isolates the
    # partitioning/routing advantage, not kernel quality. (Measured after
    # the 3.2 GB engine was resident, the brute scan ran up to 3x slower —
    # HBM pressure made the baseline noisy and vs_baseline meaningless.)
    try:
        from gpann_tpu.search.pallas_scan import fused_topk, pad_base_for_scan

        padded, n_valid = pad_base_for_scan(pts, "l2")
        log("base padded on host")
        pj = jnp.asarray(padded)
        pj.block_until_ready()
        log("base uploaded")
        bd, bi = fused_topk(q_dev, pj, n_valid, K)
        bi = np.asarray(bi)
        log("brute scan done")
        brute_recall = recall_from_ids(pts, q, bi, kth, K)
        log("brute recall computed")
        # on-chip kernel parity: Mosaic bin-top-2 vs XLA exact top-k on a
        # small base slice + query slice. Pytest covers the kernel only in
        # interpret mode; this pins real-chip Mosaic regressions (VERDICT r2
        # weak #8). Slice kept small so both compiles stay cheap — a full-
        # base XLA scan compile (123-block lax.scan) wedged the remote
        # compile helper for >10 min.
        from gpann_tpu.core.distances import topk_neighbors

        sub = 262144
        pj_sub = pj[:sub]
        bd_s, bi_s = fused_topk(q_dev[:128], pj_sub, sub, K)
        qx = jnp.pad(q_dev[:128],
                     ((0, 0), (0, pj.shape[1] - q_dev.shape[1])))
        _, xi = topk_neighbors(qx, pj_sub, K)
        xi, bi_s = np.asarray(xi), np.asarray(bi_s)
        parity = np.mean(
            [len(np.intersect1d(bi_s[r], xi[r])) for r in range(128)]
        ) / K
        assert parity >= 0.95, f"pallas-vs-XLA kernel parity {parity:.4f}"
        log(f"kernel parity (pallas vs XLA top-k, 128q x 262k base): "
            f"{parity:.4f}")
        del pj_sub, bd_s
        t0 = time.time()
        acc = None
        for _ in range(reps):
            bd, _ = fused_topk(q_dev, pj, n_valid, K)
            acc = bd if acc is None else acc + bd
        float(jnp.sum(jnp.where(jnp.isfinite(acc), acc, 0.0)))
        brute_lat = (time.time() - t0) / reps
        del pj, padded, bd, acc
    except Exception as e:  # pallas unavailable: XLA top_k fallback
        from gpann_tpu.core.distances import topk_neighbors
        from gpann_tpu.core.timer import time_fn

        log(f"pallas brute failed ({e}); XLA fallback")
        pj = jnp.asarray(pts)
        brute_lat, _ = time_fn(
            lambda: topk_neighbors(q_dev, pj, K), reps=3, warmup=1
        )
        brute_recall = 1.0
        del pj
    brute_qps = NQ / brute_lat
    log(f"brute: {brute_qps:.0f} qps recall={brute_recall:.4f}")

    # approx vote set (lax.approx_max_k on the HIGH fold): measured fastest
    # routing at this router size — 36 ms/batch vs 54 ms two-phase
    # "rescore" vs 68 ms exact top_k (R=39k, m=4096); the reference's vote
    # set is itself an approximate HNSW result (hnsw_router.h:106)
    engine = ServingEngine(
        pts, clusters, art["routing_points"], art["routing_labels"],
        scan_mode="binned", voting_impl=VOTING_IMPL, scan_phase2=SCAN_PHASE2,
        scan_nc=SCAN_NC,
    )
    log(f"engine resident (voting={VOTING_IMPL} phase2={SCAN_PHASE2}"
        f" nc={SCAN_NC})")

    if "nprobes" not in art:
        curve = engine.recall_curve(q_dev, K, kth, voting_t=VOTING_T,
                                    rule=RULE, query_block=QUERY_BLOCK)
        ok = np.nonzero(curve >= TARGET_RECALL)[0]
        art["nprobes"] = np.int64(ok[0] + 1 if len(ok) else SHARDS)
        art["curve"] = curve
        np.savez(cache, **art)
        log("recall curve: "
            + " ".join(f"{p + 1}:{r:.4f}" for p, r in enumerate(curve)))
    nprobes = int(art["nprobes"])

    # the measured program (serve/serve_device share one compiled fn)
    d0, i0 = engine.serve(q_dev, K, nprobes, voting_t=VOTING_T, rule=RULE,
                          query_block=QUERY_BLOCK)
    recall = recall_from_ids(pts, q, i0, kth, K)
    log(f"nprobes={nprobes} recall={recall:.4f} (serve program compiled)")

    # pipelined throughput: batches dispatched back-to-back, results chained
    # on device, ONE final readback — the steady-state serving number (a
    # per-batch D2H readback costs ~50 ms of tunnel round-trip that a real
    # pipeline overlaps with compute)
    def serve_dev():
        return engine.serve_device(q_dev, K, nprobes, voting_t=VOTING_T,
                                   rule=RULE, query_block=QUERY_BLOCK)

    d0, _ = serve_dev()
    float(jnp.sum(jnp.where(jnp.isfinite(d0), d0, 0.0)))  # warm + sync
    t0 = time.time()
    acc = None
    for _ in range(reps):
        d0, _ = serve_dev()
        acc = d0 if acc is None else acc + d0
    float(jnp.sum(jnp.where(jnp.isfinite(acc), acc, 0.0)))  # sync
    dispatch_lat = (time.time() - t0) / reps
    log(f"serve (per-dispatch): {NQ / dispatch_lat:.0f} qps "
        f"({dispatch_lat * 1e3:.1f} ms/batch)")

    # steady-state: a window of DISTINCT batches served by one program
    # (lax.scan over the batch axis) — amortizes the per-dispatch tunnel
    # submission cost (container-dependent, measured 8+ ms; docs/PERF.md),
    # which a production pipeline overlaps with compute. Every batch is a
    # fresh query draw from the mixture (round-3 used rolled copies of one
    # batch — identical content every batch, slightly favorable)
    WINDOW = 32
    rng_w = np.random.default_rng(SEED + 2)
    num_blobs = 64
    centers_w = (np.random.default_rng(SEED)
                 .standard_normal((num_blobs, D)).astype(np.float32) * 2.0)
    pool = (
        centers_w[rng_w.integers(0, num_blobs, size=WINDOW * NQ)]
        + 0.6 * rng_w.standard_normal((WINDOW * NQ, D))
    ).astype(np.float32)
    batches = jnp.asarray(pool.reshape(WINDOW, NQ, D))
    batches.block_until_ready()

    def serve_window():
        return engine.serve_scan(batches, K, nprobes, voting_t=VOTING_T,
                                 rule=RULE, query_block=QUERY_BLOCK)

    ds, _ = serve_window()
    float(jnp.sum(jnp.where(jnp.isfinite(ds), ds, 0.0)))  # warm + sync
    t0 = time.time()
    ds1, _ = serve_window()
    ds2, _ = serve_window()
    float(jnp.sum(jnp.where(jnp.isfinite(ds1), ds1, 0.0))
          + jnp.sum(jnp.where(jnp.isfinite(ds2), ds2, 0.0)))  # sync
    pipelined_lat = (time.time() - t0) / (2 * WINDOW)
    qps = NQ / pipelined_lat
    log(f"serve: {qps:.0f} qps ({pipelined_lat * 1e3:.1f} ms/batch, "
        f"{WINDOW}-batch windows)")

    print(
        json.dumps(
            {
                "metric": f"qps_per_chip@recall{TARGET_RECALL}_synthetic-deep{N // 1_000_000}M-{SHARDS}shards",
                "value": round(qps, 1),
                "unit": "qps",
                "vs_baseline": round(qps / brute_qps, 3),
                "recall_at_10": round(float(recall), 4),
                "nprobes": nprobes,
                "num_shards": SHARDS,
                "brute_force_qps": round(brute_qps, 1),
                "per_dispatch_qps": round(NQ / dispatch_lat, 1),
                "batch": NQ,
                "total_seconds": round(time.time() - _T0, 1),
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
