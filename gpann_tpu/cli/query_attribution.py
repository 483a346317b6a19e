"""QueryAttribution CLI — the main benchmark driver.

Reference parity: ``run_query_attribution.cpp`` (C18): read points/queries,
compute-or-load+verify ground truth, read clusters, run the routing-config
sweep, serialize ``*.routes``, run the in-shard search sweep, serialize
``*.searches``, combine into the QPS/recall CSV and Pareto-filter.

Usage:
    python -m gpann_tpu.cli.query_attribution \
        <points.fbin> <queries.fbin> <ground_truth.bin> <k> \
        <clusters_file> <num_shards> <out_prefix> [part_method] [metric] \
        [budgets]

``budgets``: comma-separated router size budgets; default = the reference's
{20k..10M} grid (routes.cpp:130) clipped to the dataset size, so the CSV
contains the full recall-vs-index-size tradeoff curve.
"""

from __future__ import annotations

import sys

import numpy as np

from gpann_tpu.core import read_clusters, read_points
from gpann_tpu.eval import kth_neighbor_distance
from gpann_tpu.eval.combination import (
    CSV_HEADER,
    combine_routes_and_searches,
    pareto_filter,
    serialize_routes,
    serialize_searches,
)
from gpann_tpu.route.sweep import iterate_routing_configs
from gpann_tpu.search.shard_sweep import run_in_shard_searches


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) < 7:
        print(__doc__)
        return 2
    point_file, query_file, gt_file = argv[:3]
    k = int(argv[3])
    part_file = argv[4]
    requested_shards = int(argv[5])
    out_prefix = argv[6]
    part_method = argv[7] if len(argv) > 7 else "GP"
    metric = argv[8] if len(argv) > 8 else "l2"
    budgets_arg = argv[9] if len(argv) > 9 else None

    points = read_points(point_file)
    queries = read_points(query_file)
    print(f"loaded base {points.shape} queries {queries.shape}", flush=True)

    from gpann_tpu.cli.small_scale_queries import load_or_compute_gt

    gt_ids, gt_dists = load_or_compute_gt(gt_file, points, queries, k, metric)
    kth = kth_neighbor_distance(gt_dists, k)

    clusters = read_clusters(part_file)
    num_shards = len(clusters)
    min_cluster_size = min(len(c) for c in clusters)

    # budget grid sweep — the recall-vs-index-size tradeoff curve
    # (routes.cpp:130: {20k..10M}; the blueprint budget n/requested_shards of
    # run_query_attribution.cpp:68-69 is superseded by the grid there too)
    if budgets_arg:
        budgets = [int(b) for b in budgets_arg.split(",")]
    else:
        from gpann_tpu.route.sweep import default_budgets

        budgets = default_budgets(points.shape[0])
    print(f"router budget grid: {budgets}", flush=True)

    # Pyramid/OurPyramid saved routing indices next to the partition file
    # (run_query_attribution.cpp:70-79 derives the paths from the partition
    # file name when the method matches; routes.cpp:287-311 sweeps them)
    import os

    from gpann_tpu.route.flat import FlatRouter

    def _side_index(suffix):
        p = part_file + suffix + ".npz"
        if os.path.exists(p):
            print(f"loading side routing index {p}", flush=True)
            return FlatRouter.load(p)
        return None

    pyramid_index = (_side_index(".pyramid_routing_index")
                     if part_method == "Pyramid" else None)
    our_pyramid_index = (_side_index(".our_pyramid_routing_index")
                         if part_method == "OurPyramid" else None)

    routes = iterate_routing_configs(
        points, queries, clusters, budgets=budgets, metric=metric,
        pyramid_index=pyramid_index, our_pyramid_index=our_pyramid_index,
    )
    serialize_routes(routes, out_prefix + ".routes")
    print(f"{len(routes)} routing configs -> {out_prefix}.routes", flush=True)

    searches = run_in_shard_searches(
        points, queries, clusters, kth, k, metric=metric
    )
    serialize_searches(searches, out_prefix + ".searches")
    print(f"{len(searches)} search configs -> {out_prefix}.searches", flush=True)

    rows = combine_routes_and_searches(
        routes, searches, len(queries), num_shards, requested_shards, k,
        partition_method=part_method, min_cluster_size=min_cluster_size,
    )
    with open(out_prefix + ".csv", "w") as f:
        f.write(CSV_HEADER + "\n")
        f.write("\n".join(rows) + "\n")
    front = pareto_filter(rows)
    with open(out_prefix + ".pareto", "w") as f:
        f.write(CSV_HEADER + "\n")
        f.write("\n".join(front) + "\n")
    print(f"wrote {len(rows)} rows, {len(front)} pareto rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
