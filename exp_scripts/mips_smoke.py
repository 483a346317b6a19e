"""MIPS end-to-end smoke experiment (the reference's Text-to-Image regime).

The reference's T2I-1B dataset is MIPS (``experiments.py:23-27``: queries are
text embeddings, base is image embeddings, score = inner product). This
script runs the full small pipeline — balanced k-means partition, k-means-
tree router, fused serving engine — under ``metric="mips"`` on synthetic
query/base sets with *different* distributions (the T2I property that makes
MIPS routing hard), and writes a recall-vs-nprobes CSV.

Usage: python exp_scripts/mips_smoke.py [n] [shards]
Writes exp_outputs/mips_smoke.csv.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    shards = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    k, nq, d = 10, 1024, 96
    rng = np.random.default_rng(777)
    # base: clustered image-like embeddings with varying norms (MIPS rankings
    # depend on norm structure; unit-norm bases degenerate to cosine)
    centers = rng.standard_normal((128, d)).astype(np.float32)
    lbl = rng.integers(0, 128, size=n)
    pts = centers[lbl] + 0.5 * rng.standard_normal((n, d)).astype(np.float32)
    pts *= (0.5 + rng.gamma(2.0, 0.5, size=(n, 1))).astype(np.float32)
    pts = pts.astype(np.float32)
    # queries from a DIFFERENT distribution (text side): mean-shifted mixture
    qc = centers[rng.integers(0, 128, size=nq)]
    q = (0.7 * qc + 0.8 * rng.standard_normal((nq, d))).astype(np.float32)

    import jax.numpy as jnp

    from gpann_tpu.cluster import balanced_kmeans
    from gpann_tpu.core.partition import partition_to_clusters
    from gpann_tpu.eval import (
        compute_ground_truth,
        kth_neighbor_distance,
        recall_from_ids,
    )
    from gpann_tpu.route import KMeansTreeRouter, KMeansTreeRouterOptions
    from gpann_tpu.search.serve import ServingEngine

    gt_ids, gt_d = compute_ground_truth(pts, q, k, metric="mips")
    kth = kth_neighbor_distance(gt_d, k)
    _, assign = balanced_kmeans(pts, k=shards, eps=0.05, metric="mips",
                                seed=777)
    clusters = partition_to_clusters(assign, shards)
    sizes = np.bincount(assign, minlength=shards)
    assert sizes.max() <= 1.05 * np.ceil(n / shards)

    opts = KMeansTreeRouterOptions(num_centroids=32, budget=20_000)
    kmtr = KMeansTreeRouter(metric="mips").train(pts, clusters, opts,
                                                 seed=777)
    rp, rl = kmtr.extract_points()
    engine = ServingEngine(pts, clusters, rp, rl, metric="mips",
                           scan_mode="binned")
    qd = jnp.asarray(q)
    curve = engine.recall_curve(qd, k, kth, voting_t=60, rule="min_dist",
                                query_block=128)
    rows = ["metric,n,shards,nprobes,recall"]
    for p, r in enumerate(curve):
        rows.append(f"mips,{n},{shards},{p + 1},{r:.4f}")
    # spot-check the serve path end-to-end at the 0.95 operating point
    ok = np.nonzero(curve >= 0.95)[0]
    nprobes = int(ok[0] + 1) if len(ok) else shards
    d0, i0 = engine.serve(qd, k, nprobes, voting_t=60, query_block=128)
    rec = recall_from_ids(pts, q, i0, kth, k, metric="mips")
    print(f"mips n={n} shards={shards}: nprobes@0.95={nprobes} "
          f"serve recall={rec:.4f}")
    print("curve:", " ".join(f"{p+1}:{r:.3f}" for p, r in enumerate(curve)))

    os.makedirs("exp_outputs", exist_ok=True)
    with open("exp_outputs/mips_smoke.csv", "w") as f:
        f.write("\n".join(rows) + "\n")
    print("wrote exp_outputs/mips_smoke.csv")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
