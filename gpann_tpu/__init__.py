"""gpann_tpu — a TPU-native (JAX/XLA/Pallas) framework with the capabilities of
gp-ann (larsgottesbueren/gp-ann): billion-scale partitioned approximate
nearest-neighbor search.

Layer map (mirrors reference SURVEY.md §1, re-designed TPU-first):

- ``core``    — vector I/O, distance matmul kernels, top-k, segment ops, timers.
- ``cluster`` — Lloyd / balanced / hierarchical k-means.
- ``graph``   — exact + approximate kNN-graph construction.
- ``gp``      — balanced & overlapping graph partitioning (KaMinPar replacement).
- ``route``   — k-means-tree router + flat routing-point router (4 probe rules).
- ``search``  — shard-major IVF layout + fused distance-scan/top-k shard search.
- ``eval``    — ground truth, recall, oracle recall, QPS simulator + Pareto.
- ``dist``    — shard mesh, multi-device query scatter / top-k merge collectives.
- ``cli``     — command-line drivers mirroring the reference binaries.
"""

__version__ = "0.1.0"
