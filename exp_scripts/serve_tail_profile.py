"""Decompose the serve batch's fixed tail on the chip and A/B phase-2.

PERF.md round-3 decomposition left ~15 ms/batch attributed to
"grouping/merge/dispatch". Hypothesis (from op-size accounting): the real
cost is NOT the grouping argsort/scatter (tiny ops inside one jit) but
phase 2 of the binned scan — `lax.top_k` over the kernel's bin summaries,
shape [total_rows, 2*cap/BIN] = [8320, 4096] at bench config, a sorting
network over 34M floats per batch. This script measures each stage in
isolation (windowed `lax.scan` + tiny-readback sync, per CLAUDE.md timing
rules) and A/Bs `phase2="exact"` vs `"approx"` (`lax.approx_max_k`,
the TPU partial-reduction top-k) end-to-end, including recall.

Requires the bench.py artifact cache (run bench.py first).
Usage: python exp_scripts/serve_tail_profile.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N, D, NQ, SHARDS, K = 8_000_000, 96, 4096, 32, 10
SMOKE = bool(os.environ.get("GPANN_SMOKE"))
if SMOKE:  # tiny CPU check of the NumPy grouping replication + timings glue
    N, D, NQ, SHARDS = 40_000, 16, 128, 2
SEED = 555
VOTING_T = 32
RULE = "min_dist"
QB = 128
WINDOW = 4 if SMOKE else 32

_T0 = time.time()


def log(msg):
    print(f"# [{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def window_time(fn, sync, reps=2):
    """Mean seconds per window element over `reps` windows; `fn` returns a
    device array, `sync` reduces it to one host float (forces completion)."""
    sync(fn())  # warm + compile
    t0 = time.time()
    acc = 0.0
    for _ in range(reps):
        acc += sync(fn())
    dt = (time.time() - t0) / (reps * WINDOW)
    return dt, acc


def main() -> int:
    import jax
    import jax.numpy as jnp

    from gpann_tpu.core.partition import partition_to_clusters
    from gpann_tpu.eval import kth_neighbor_distance, recall_from_ids
    from gpann_tpu.search.serve import ServingEngine

    cache_dir = os.path.expanduser("~/.cache/gpann_tpu")
    pts_cache = os.path.join(cache_dir, f"bench_pts_{SEED}_{N}_{D}_{NQ}.npy")
    q_cache = os.path.join(cache_dir, f"bench_q_{SEED}_{N}_{D}_{NQ}.npy")
    cache = os.path.join(cache_dir, f"bench_{SEED}_{N}_{D}_{NQ}_{SHARDS}_gp.npz")
    if SMOKE:
        from gpann_tpu.eval.recall import compute_ground_truth
        from gpann_tpu.gp.partitioning import flat_kmeans_partitioning

        rng = np.random.default_rng(SEED)
        centers = rng.standard_normal((8, D)).astype(np.float32) * 2.0
        pts = (centers[rng.integers(0, 8, size=N)]
               + 0.6 * rng.standard_normal((N, D))).astype(np.float32)
        q = (centers[rng.integers(0, 8, size=NQ)]
             + 0.6 * rng.standard_normal((NQ, D))).astype(np.float32)
        assign = flat_kmeans_partitioning(pts, SHARDS, seed=SEED)
        gt_ids, gt_dists = compute_ground_truth(pts, q, K)
        sub = np.sort(rng.choice(N, 4000, replace=False))
        art = {"assign": assign, "gt_ids": gt_ids, "gt_dists": gt_dists,
               "routing_points": pts[sub],
               "routing_labels": assign[sub], "nprobes": np.int64(2)}
    elif not (os.path.exists(cache) and os.path.exists(pts_cache)):
        print("bench cache missing — run bench.py first", file=sys.stderr)
        return 1
    else:
        pts = np.load(pts_cache, mmap_mode="r")
        q = np.load(q_cache)
        art = dict(np.load(cache))
    nprobes = int(art["nprobes"])
    kth = kth_neighbor_distance(art["gt_dists"], K)
    clusters = partition_to_clusters(art["assign"], SHARDS)
    log(f"arts loaded (nprobes={nprobes})")

    # window of distinct batches, same draw as bench.py
    rng_w = np.random.default_rng(SEED + 2)
    centers_w = (np.random.default_rng(SEED)
                 .standard_normal((64, D)).astype(np.float32) * 2.0)
    pool = (centers_w[rng_w.integers(0, 64, size=WINDOW * NQ)]
            + 0.6 * rng_w.standard_normal((WINDOW * NQ, D))).astype(np.float32)
    batches = jnp.asarray(pool.reshape(WINDOW, NQ, D))
    batches.block_until_ready()
    q_dev = jnp.asarray(q)

    results = {}

    engines = {}
    for p2 in ("exact", "approx"):
        eng = ServingEngine(
            pts, clusters, art["routing_points"], art["routing_labels"],
            scan_mode="binned", voting_impl="approx", scan_phase2=p2,
            interpret=SMOKE)
        engines[p2] = eng
        # recall parity at the measured config
        _, i0 = eng.serve(q_dev, K, nprobes, voting_t=VOTING_T, rule=RULE,
                          query_block=QB)
        rec = recall_from_ids(pts, q, i0, kth, K)

        def serve_window(eng=eng):
            ds, _ = eng.serve_scan(batches, K, nprobes, voting_t=VOTING_T,
                                   rule=RULE, query_block=QB)
            return ds

        def sync(ds):
            return float(jnp.sum(jnp.where(jnp.isfinite(ds), ds, 0.0)))

        lat, _ = window_time(serve_window, sync)
        results[f"serve_{p2}"] = {"ms_batch": round(lat * 1e3, 2),
                                  "qps": round(NQ / lat, 1),
                                  "recall": round(float(rec), 4)}
        log(f"serve[{p2}]: {NQ/lat:.0f} qps ({lat*1e3:.2f} ms/batch) "
            f"recall={rec:.4f}")

    eng = engines["exact"]

    # ---- routing-only window ----
    fn_route = eng._build_probe(nprobes, VOTING_T, RULE, 0.6)

    def routed(qs, rp, rl, rsq):
        def body(c, qb_):
            return c, fn_route(qb_, rp, rl, rsq)
        _, out = jax.lax.scan(body, 0, qs)
        return out

    routed_j = jax.jit(routed)

    def route_window():
        return routed_j(batches, eng.router_points, eng.router_labels,
                        eng.router_sq)

    lat_r, _ = window_time(route_window,
                           lambda o: float(jnp.sum(o.astype(jnp.int32))))
    results["route_only_ms"] = round(lat_r * 1e3, 2)
    log(f"route-only: {lat_r*1e3:.2f} ms/batch")

    # ---- kernel+phase2 standalone with a real batch's grouping ----
    from gpann_tpu.search.pallas_scan import fused_topk_blocks

    probes = eng.probe_order(q_dev[:NQ], nprobes, voting_t=VOTING_T, rule=RULE)
    s, cap = SHARDS, eng.capacity
    mn = NQ * nprobes
    flat_b = probes.reshape(-1)
    sort = np.argsort(flat_b, kind="stable")
    b_sorted = flat_b[sort]
    counts = np.bincount(b_sorted, minlength=s + 1)
    padded = -(-counts // QB) * QB
    starts = np.concatenate([[0], np.cumsum(padded)])[:-1]
    first = np.searchsorted(b_sorted, np.arange(s + 1), side="left")
    rank = np.arange(mn) - first[b_sorted]
    pos = starts[b_sorted] + rank
    total = -(-mn // QB) * QB + (s + 1) * QB
    nb = total // QB
    pair_q = np.full(total, NQ, np.int32)
    pair_q[pos] = (sort // nprobes).astype(np.int32)
    block_start = np.arange(nb) * QB
    cum_padded = np.cumsum(padded)
    block_shard = np.minimum(
        np.searchsorted(cum_padded, block_start, side="right"), s
    ).astype(np.int32)
    sizes_np = np.asarray([len(c) for c in clusters] + [0], np.int32)
    qe = np.concatenate([np.asarray(q, np.float32),
                         np.zeros((1, D), np.float32)])
    qrows = jnp.asarray(
        np.pad(qe[pair_q], ((0, 0), (0, eng.dim_pad - D))))
    row_off = jnp.asarray(np.minimum(block_shard, s - 1) * cap, jnp.int32)
    has_real = (pair_q.reshape(nb, QB) < NQ).any(axis=1)
    sizes_blk = jnp.asarray(
        np.where(has_real, sizes_np[block_shard], 0), jnp.int32)
    qrows.block_until_ready()
    n_pad_blocks = int((~has_real).sum())
    log(f"grouping: {nb} blocks ({n_pad_blocks} padding)")
    results["num_blocks"] = nb
    results["num_padding_blocks"] = n_pad_blocks

    def make_scan_window(p2):
        @jax.jit
        def win(qr, sp, ro, sz):
            def body(c, _):
                bd, _ = fused_topk_blocks(
                    qr, sp, ro, sz, K, "l2",
                    qb=QB, cap=cap, tq=min(QB, 256), phase2=p2,
                    interpret=SMOKE)
                return c, bd

            return jax.lax.scan(body, 0, jnp.arange(WINDOW))[1]

        return win

    for p2 in ("exact", "approx"):
        win = make_scan_window(p2)
        lat_k, _ = window_time(
            lambda: win(qrows, eng.shard_points, row_off, sizes_blk),
            lambda o: float(jnp.sum(jnp.where(jnp.isfinite(o), o, 0.0))))
        results[f"scan_phase2_{p2}_ms"] = round(lat_k * 1e3, 2)
        log(f"kernel+phase2[{p2}]: {lat_k*1e3:.2f} ms/batch")

    results["tail_ms_exact"] = round(
        results["serve_exact"]["ms_batch"] - results["route_only_ms"]
        - results["scan_phase2_exact_ms"], 2)
    os.makedirs("exp_outputs", exist_ok=True)
    suffix = "_smoke" if SMOKE else ""
    with open(f"exp_outputs/serve_tail_profile{suffix}.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
