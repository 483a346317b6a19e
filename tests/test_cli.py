"""End-to-end CLI integration tests on tiny synthetic data (CPU)."""

import os

import numpy as np
import pytest

from gpann_tpu.core import read_clusters, write_points


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(555)
    centers = rng.standard_normal((6, 12)).astype(np.float32) * 4
    lbl = rng.integers(0, 6, size=1500)
    pts = (centers[lbl] + 0.4 * rng.standard_normal((1500, 12))).astype(np.float32)
    q = (centers[rng.integers(0, 6, size=20)]
         + 0.4 * rng.standard_normal((20, 12))).astype(np.float32)
    write_points(str(tmp / "base.fbin"), pts)
    write_points(str(tmp / "queries.fbin"), q)
    return tmp


def test_partition_cli(data):
    from gpann_tpu.cli.partition import main

    rc = main([str(data / "base.fbin"), str(data / "part"), "4", "BalancedKMeans"])
    assert rc == 0
    clusters = read_clusters(str(data / "part.k=4.BalancedKMeans"))
    assert len(clusters) == 4
    assert sum(len(c) for c in clusters) == 1500


def test_small_scale_queries_cli(data):
    from gpann_tpu.cli.small_scale_queries import main

    part = str(data / "part.k=4.BalancedKMeans")
    if not os.path.exists(part):
        test_partition_cli(data)
    rc = main([
        str(data / "base.fbin"), str(data / "queries.fbin"),
        str(data / "gt.bin"), "10", part, str(data / "out.csv"),
        "BalancedKMeans",
    ])
    assert rc == 0
    lines = open(data / "out.csv").read().strip().split("\n")
    assert lines[0].startswith("partitioning,routing")
    # max-probes rows must reach recall 1.0
    final = [l for l in lines[1:] if l.split(",")[3] == "4"]
    assert all(float(l.split(",")[-1]) == 1.0 for l in final), final


def test_query_attribution_and_convert_cli(data):
    from gpann_tpu.cli.convert import main as convert_main
    from gpann_tpu.cli.query_attribution import main as qa_main

    part = str(data / "part.k=4.BalancedKMeans")
    if not os.path.exists(part):
        test_partition_cli(data)
    rc = qa_main([
        str(data / "base.fbin"), str(data / "queries.fbin"),
        str(data / "gt.bin"), "10", part, "4", str(data / "qa"),
        "BalancedKMeans",
    ])
    assert rc == 0
    assert os.path.exists(data / "qa.routes")
    assert os.path.exists(data / "qa.searches")
    pareto = open(data / "qa.pareto").read().strip().split("\n")
    assert len(pareto) >= 2
    best_recall = max(float(l.split(",")[8]) for l in pareto[1:])
    assert best_recall == 1.0

    rc = convert_main([
        str(data / "qa.routes"), str(data / "qa.searches"), "4", "4", "10",
        str(data / "qa2"), "BalancedKMeans",
    ])
    assert rc == 0
    # re-analysis reproduces the same recall column values
    a = sorted(open(data / "qa.csv").read().strip().split("\n")[1:])
    b = sorted(open(data / "qa2.csv").read().strip().split("\n")[1:])
    assert [r.split(",")[8] for r in a] == [r.split(",")[8] for r in b]


def test_oracle_recall_cli(data):
    from gpann_tpu.cli.oracle_recall import main

    part = str(data / "part.k=4.BalancedKMeans")
    if not (os.path.exists(part) and os.path.exists(data / "qa.routes")):
        test_query_attribution_and_convert_cli(data)
    rc = main([
        str(data / "gt.bin"), str(data / "qa.routes"), "10", part,
        "BalancedKMeans", str(data / "oracle.csv"),
    ])
    assert rc == 0
    lines = open(data / "oracle.csv").read().strip().split("\n")
    oracle_rows = [l for l in lines[1:] if l.endswith(",oracle")]
    assert len(oracle_rows) == 4
    # oracle curve reaches 1.0 at full probes
    assert float(oracle_rows[-1].split(",")[2]) == 1.0


def test_analyze_approximation_losses_cli(data):
    from gpann_tpu.cli.analyze_approximation_losses import main

    part = str(data / "part.k=4.BalancedKMeans")
    if not os.path.exists(part):
        test_partition_cli(data)
    rc = main([
        str(data / "base.fbin"), str(data / "queries.fbin"),
        str(data / "gt.bin"), "10", part, "BalancedKMeans",
        str(data / "losses.csv"),
    ])
    assert rc == 0
    lines = open(data / "losses.csv").read().strip().split("\n")
    types = {l.split(",")[-1] for l in lines[1:]}
    assert types == {"brute-force-routing", "kmeans-tree-sample",
                     "uniform-sample", "single-center"}


def test_distributed_bench_cli(data):
    from gpann_tpu.cli.distributed_bench import main

    part = str(data / "part.k=4.BalancedKMeans")
    if not os.path.exists(part):
        test_partition_cli(data)
    rc = main([
        str(data / "base.fbin"), str(data / "queries.fbin"), "10", part, "2",
    ])
    assert rc == 0


def test_scale_bench_isolate_stages_cli(tmp_path):
    """scale_bench end-to-end as a user runs it at scale: every build stage
    in its own child process (--isolate-stages; the axon client pins upload
    host copies until process death, docs/PERF.md) plus the chunked curve
    pass and in-shard pruning. Children are real subprocesses, so the CPU
    platform is forced via env (PALLAS_AXON_POOL_IPS unset disables the
    sitecustomize axon registration; JAX_PLATFORMS then applies)."""
    import subprocess
    import sys

    env = {**os.environ, "HOME": str(tmp_path),
           "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"}
    out = tmp_path / "scale.csv"
    proc = subprocess.run(
        [sys.executable, "-m", "gpann_tpu.cli.scale_bench",
         "--n", "6000", "--d", "16", "--shards", "8", "--nq", "32",
         "--dtype", "u8", "--method", "gp", "--gp-subsample", "2000",
         "--gp-aggregates", "64", "--train-sample", "2000",
         "--scan-mode", "exact", "--sub-nprobe", "2", "--sub-size", "256",
         "--isolate-stages", "--shard-chunk", "4", "--out", str(out)],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # all four stage children ran
    for st in ("partition", "gt", "router", "subclusters"):
        assert f"stage child: {st}" in proc.stderr, proc.stderr[-2000:]
    lines = open(out).read().strip().split("\n")
    assert lines[0].startswith("n,d,shards")
    rows = [l.split(",") for l in lines[1:]]
    assert len(rows) == 8
    # recall at full probes ~1.0 (pruning keeps it a top-k subset, allow slack)
    assert float(rows[-1][8]) > 0.9
    # balance cap respected
    assert float(rows[0][9]) <= 1.05 + 1e-9


def test_scale_bench_mips_cli(tmp_path, monkeypatch):
    """Runtime-metric parity on the scale path: the reference needs a second
    compile tree for MIPS (CMakeLists.txt:54-59, T2I-1B); here it is a flag.
    In-process (no children), exact scan, GP partitioner."""
    monkeypatch.setenv("HOME", str(tmp_path))
    from gpann_tpu.cli import scale_bench

    out = tmp_path / "scale_mips.csv"
    rc = scale_bench.main([
        "--n", "6000", "--d", "16", "--shards", "8", "--nq", "32",
        "--metric", "mips", "--method", "gp", "--gp-subsample", "2000",
        "--gp-aggregates", "64", "--train-sample", "2000",
        "--scan-mode", "exact", "--out", str(out)])
    assert rc == 0
    rows = [l.split(",") for l in open(out).read().strip().split("\n")[1:]]
    assert len(rows) == 8
    assert float(rows[-1][8]) > 0.95       # full probes ~exact under MIPS
    assert float(rows[0][9]) <= 1.05 + 1e-9


def test_bench_compile_cache_seeding(tmp_path, monkeypatch):
    """bench.py::_seed_compile_cache extracts the repo tarball into the
    persistent cache dir without overwriting newer entries (the BENCH_r04
    rc=124 fix: a driver cold start must not pay ~900 s of XLA compiles)."""
    import tarfile
    import importlib.util

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(repo, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    art_dir = tmp_path / "repo" / "exp_artifacts"
    art_dir.mkdir(parents=True)
    (tmp_path / "src").mkdir()
    (tmp_path / "src" / "jit_a-123-cache").write_bytes(b"AAA")
    (tmp_path / "src" / "jit_b-456-cache").write_bytes(b"BBB")
    with tarfile.open(art_dir / "bench_jax_cache.tar.gz", "w:gz") as tf:
        tf.add(tmp_path / "src" / "jit_a-123-cache", arcname="jit_a-123-cache")
        tf.add(tmp_path / "src" / "jit_b-456-cache", arcname="jit_b-456-cache")

    home = tmp_path / "home"
    monkeypatch.setenv("HOME", str(home))
    dst = home / ".cache" / "gpann_tpu" / "jax_cache"
    dst.mkdir(parents=True)
    (dst / "jit_a-123-cache").write_bytes(b"NEWER")  # must survive

    monkeypatch.setattr(
        bench.os.path, "dirname",
        lambda p, _real=os.path.dirname: str(tmp_path / "repo")
        if p.endswith("bench.py") else _real(p))
    bench._seed_compile_cache()
    assert (dst / "jit_a-123-cache").read_bytes() == b"NEWER"
    assert (dst / "jit_b-456-cache").read_bytes() == b"BBB"
