"""Synthetic dataset generators for benchmarks and scale experiments.

The reference evaluates exclusively on big-ann datasets (``experiments.py:
6-28``: DEEP, Turing, Text-to-Image, SIFT). This environment has **zero
network egress** (DNS resolution fails for every download URL in
``exp_scripts/download_datasets.sh``), so real datasets cannot be fetched;
these generators are the stand-in, with two difficulty regimes:

- ``blobs`` — the easy 64-Gaussian mixture bench.py always used. Clusters
  are well separated, so graph partitioning is near-trivially optimal
  (oracle recall ~1.0); good for smoke/perf, useless for method comparison.
- ``hard`` — a deliberately non-separable distribution: fine clusters whose
  centers are themselves drawn from super-clusters (hierarchical overlap),
  anisotropic per-cluster/per-dim scales, heavy-tailed (t-like) noise, and a
  uniform background component. kNN neighborhoods straddle any balanced
  partition's boundaries, so routed recall < 1 at small nprobes and the
  GP-vs-KMeans-vs-Random ordering is actually informative — the regime the
  reference's paper claims live in.

Both are chunk-generated with per-chunk seeds: a 64M x 96 base writes
straight into a ``np.lib.format`` memmap without ever materializing in RAM.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def _hard_params(d: int, num_clusters: int, num_super: int, seed: int):
    rng = np.random.default_rng([seed, 0xC0FFEE])
    super_centers = rng.standard_normal((num_super, d)) * 3.0
    which_super = rng.integers(0, num_super, size=num_clusters)
    # cluster centers only 1.2 sigma from their super center: heavy overlap
    centers = (super_centers[which_super]
               + 1.2 * rng.standard_normal((num_clusters, d)))
    # anisotropic scales: lognormal per cluster per dim, median ~0.8
    scales = 0.8 * np.exp(0.5 * rng.standard_normal((num_clusters, d)))
    # cluster weights: Zipf-ish skew (real corpora are never uniform)
    w = 1.0 / np.arange(1, num_clusters + 1) ** 0.6
    w /= w.sum()
    return (centers.astype(np.float32), scales.astype(np.float32), w)


def _gen_chunk(kind: str, m: int, d: int, seed: int, chunk_id: int,
               params) -> np.ndarray:
    rng = np.random.default_rng([seed, chunk_id])
    if kind == "blobs":
        centers = params
        lbl = rng.integers(0, len(centers), size=m)
        return (centers[lbl]
                + 0.6 * rng.standard_normal((m, d))).astype(np.float32)
    centers, scales, w = params
    lbl = rng.choice(len(centers), size=m, p=w)
    # t-like heavy tails: normal / sqrt(chi2/df), df=6
    g = rng.standard_normal((m, d))
    chi = rng.chisquare(6.0, size=(m, 1)) / 6.0
    noise = g / np.sqrt(np.maximum(chi, 1e-6))
    pts = centers[lbl] + scales[lbl] * noise
    # 5% uniform background spread over the support
    nbg = int(0.05 * m)
    if nbg:
        bg = rng.uniform(-8.0, 8.0, size=(nbg, d))
        pts[rng.choice(m, size=nbg, replace=False)] = bg
    return pts.astype(np.float32)


def make_params(kind: str, d: int, seed: int,
                num_clusters: int = 1024, num_super: int = 32):
    if kind == "blobs":
        rng = np.random.default_rng(seed)
        return (rng.standard_normal((64, d)).astype(np.float32) * 2.0)
    if kind == "hard":
        return _hard_params(d, num_clusters, num_super, seed)
    raise ValueError(f"unknown dataset kind {kind!r}")


def generate(
    kind: str, n: int, d: int, seed: int = 555,
    chunk_rows: int = 1 << 20,
    out_path: Optional[str] = None,
) -> np.ndarray:
    """Generate ``[n, d]`` float32 points; memmap-backed when ``out_path``
    is given (written chunk-by-chunk, O(chunk) RAM)."""
    params = make_params(kind, d, seed)
    if out_path is None:
        out = np.empty((n, d), np.float32)
    else:
        out = np.lib.format.open_memmap(
            out_path, mode="w+", dtype=np.float32, shape=(n, d)
        )
    for ci, s in enumerate(range(0, n, chunk_rows)):
        m = min(chunk_rows, n - s)
        out[s : s + m] = _gen_chunk(kind, m, d, seed, ci, params)
    if out_path is not None:
        out.flush()
        return np.load(out_path, mmap_mode="r")
    return out


def generate_queries(kind: str, nq: int, d: int, seed: int = 555) -> np.ndarray:
    """Queries from the same distribution (chunk id -1 keeps them disjoint
    from every base chunk's stream)."""
    params = make_params(kind, d, seed)
    return _gen_chunk(kind, nq, d, seed, 0x7E57, params)


def dataset_cached(
    kind: str, n: int, d: int, seed: int = 555,
    cache_dir: Optional[str] = None,
) -> Tuple[np.ndarray, str]:
    """Memmap-backed dataset cached on disk; returns (memmap, path)."""
    cache_dir = cache_dir or os.path.expanduser("~/.cache/gpann_tpu")
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"synth_{kind}_{seed}_{n}x{d}.npy")
    if not os.path.exists(path):
        generate(kind, n, d, seed=seed, out_path=path)
    return np.load(path, mmap_mode="r"), path
