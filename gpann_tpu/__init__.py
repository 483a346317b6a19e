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


def _enable_compilation_cache() -> None:
    """Persist XLA compilations across processes.

    The TPU backend in this environment takes 20-75s per kernel compile; the
    pipeline CLIs are multi-process (reference L7 orchestration pattern), so
    a persistent cache is a large end-to-end win. Opt out with
    GPANN_TPU_NO_COMPILE_CACHE=1.
    """
    import os

    if os.environ.get("GPANN_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            path = os.environ.get(
                "GPANN_TPU_COMPILE_CACHE_DIR",
                os.path.expanduser("~/.cache/gpann_tpu/jax_cache"),
            )
            os.makedirs(path, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", path)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization; never fail import
        pass


_enable_compilation_cache()
