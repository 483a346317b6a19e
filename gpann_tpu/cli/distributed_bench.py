"""DistributedBench CLI — measured multi-device query benchmark.

The TPU-native realization of the reference's MPI prototype
(``distributed_bench.cpp`` + ``src/distributed_query_benchmark.h``, C16 —
disabled and non-compiling in the reference's build, SURVEY.md §5.8). Here it
is real: shards live across the device mesh (``gpann_tpu.dist``), queries are
routed on every device, candidate lists merge over ICI collectives, and the
QPS is *measured*, not simulated.

Single-host it uses all local devices; multi-host, launch one process per
host with the usual coordinator env and pass --distributed to call
``jax.distributed.initialize()`` first (reference striping of queries across
ranks, ``distributed_bench.cpp:39-42``, is replaced by the dp mesh axis).

Usage:
    python -m gpann_tpu.cli.distributed_bench \
        <points.fbin> <queries.fbin> <k> <clusters_file> <nprobes> \
        [metric] [--distributed]
"""

from __future__ import annotations

import sys
import time

import numpy as np

from gpann_tpu.core import read_clusters, read_points
from gpann_tpu.core.timer import time_fn


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--distributed" in argv:
        argv.remove("--distributed")
        import jax

        jax.distributed.initialize()
    if len(argv) < 5:
        print(__doc__)
        return 2
    point_file, query_file, k_str, part_file, nprobes_str = argv[:5]
    metric = argv[5] if len(argv) > 5 else "l2"
    k, nprobes = int(k_str), int(nprobes_str)

    import jax

    from gpann_tpu.dist import DistributedIVF, shard_mesh
    from gpann_tpu.route import centroid_router

    points = read_points(point_file)
    queries = read_points(query_file)
    clusters = read_clusters(part_file)
    ndev = len(jax.devices())
    mesh = shard_mesh(dp=1)
    print(f"{ndev} devices; {len(clusters)} shards; mesh {dict(mesh.shape)}")

    t0 = time.time()
    index = DistributedIVF(points, clusters, mesh=mesh, metric=metric)
    router = centroid_router(points, clusters, metric=metric)
    print(f"index built in {time.time() - t0:.1f}s")

    # pad query count to the dp axis
    m = len(queries)
    probes = router.query(queries, rule="min_dist")[:, :nprobes]
    lat, (d, i) = time_fn(index.search_probed, queries, probes, k, reps=5)
    qps = m / lat
    print(f"nprobes={nprobes}: {m} queries in {lat*1e3:.1f} ms -> "
          f"{qps:.0f} QPS ({qps/ndev:.0f} QPS/device)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
