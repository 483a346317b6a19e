"""Partition-quality validation: oracle + routed recall curves per method.

The quality gate from SURVEY.md §7 (M3): GP must beat the k-means family on
first-probe oracle recall, and everything must beat Random by a wide margin —
the paper's own headline comparison, reproduced on synthetic DEEP-like data.

Writes ``exp_outputs/partition_quality.csv`` with schema
``method,num probes,recall,type`` (type in {oracle, routed}).

Usage: python exp_scripts/validate_partition_quality.py [n] [k] [kind]

``kind`` (default ``blobs``) selects the generator from
``gpann_tpu.eval.synth``: ``blobs`` is the separable mixture (GP trivially
wins, oracle ~1.0); ``hard`` is the non-separable hierarchical mixture where
neighborhoods straddle shard boundaries — the regime where the GP-vs-KMeans
ordering is actually informative (stand-in for big-ann data: zero egress).
Output column ``dataset`` records the kind.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    shards = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    kind = sys.argv[3] if len(sys.argv) > 3 else "blobs"
    k = 10
    d = 96
    from gpann_tpu.eval.synth import generate, generate_queries

    pts = generate(kind, n, d, seed=555)
    q = generate_queries(kind, 1024, d, seed=555)

    from gpann_tpu.eval import compute_ground_truth, oracle_recall
    from gpann_tpu.gp import api
    from gpann_tpu.core.partition import clusters_to_partition, cluster_sizes
    from gpann_tpu.route import (
        KMeansTreeRouter,
        KMeansTreeRouterOptions,
        centroid_router,
    )
    from gpann_tpu.cli.oracle_recall import recall_for_increasing_probes
    from gpann_tpu.core.partition import clusters_to_cover

    gt_ids, _ = compute_ground_truth(pts, q, k)
    rows = ["method,num probes,recall,type,dataset"]
    for method in ("GP", "BalancedKMeans", "Random"):
        t0 = time.time()
        clusters = api.partition(pts, shards, method)
        dt = time.time() - t0
        sizes = cluster_sizes(clusters)
        part = clusters_to_partition(clusters, n)
        curve = oracle_recall(gt_ids, partition=part)
        print(f"{method}: build {dt:.0f}s sizes {sizes.min()}-{sizes.max()} "
              f"oracle@1 {curve[0]:.4f}", flush=True)
        for j, r in enumerate(curve):
            rows.append(f"{method},{j + 1},{r:.4f},oracle,{kind}")
        # routed recall under BOTH routers: the single-centroid baseline
        # (cheap, favors centroid-shaped partitions) and the reference's
        # k-means-tree routing-points router (kmeans_tree_router.h; the one
        # the paper pairs with GP - GP shards are geometric fragments a
        # single centroid cannot represent)
        routers = {"routed-centroid": centroid_router(pts, clusters).query}
        opts = KMeansTreeRouterOptions(num_centroids=32, budget=20_000)
        kmtr = KMeansTreeRouter().train(pts, clusters, opts, seed=555)
        routers["routed"] = lambda qq, rule: kmtr.flat.query(
            qq, num_voting_neighbors=60, rule=rule
        )
        probes = None
        cover = clusters_to_cover(clusters, n=n)
        for rtype, route in routers.items():
            probes = route(q, rule="min_dist")
            routed = recall_for_increasing_probes(
                list(np.asarray(probes)), cover, gt_ids, k, shards
            )
            for j, r in enumerate(routed):
                rows.append(f"{method},{j + 1},{r:.4f},{rtype},{kind}")
            print(f"{method} {rtype}: @1 {routed[0]:.4f} @4 {routed[3]:.4f}",
                  flush=True)

    os.makedirs("exp_outputs", exist_ok=True)
    out = (f"exp_outputs/partition_quality_{kind}.csv" if kind != "blobs"
           else "exp_outputs/partition_quality.csv")
    with open(out, "w") as f:
        f.write("\n".join(rows) + "\n")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
