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
    # t-like heavy tails: normal / sqrt(chi2/df), df=6. All-f32 with in-place
    # ops: the f64 version allocated five [m, d] float64 temporaries and was
    # memory-bound (~40 s per 1M-row chunk on the single host core; ~8x
    # faster this way), which priced 250M-point base generation out of reach.
    pts = rng.standard_normal((m, d), dtype=np.float32)
    chi = (rng.chisquare(6.0, size=(m, 1)).astype(np.float32)) / 6.0
    np.maximum(chi, 1e-6, out=chi)
    np.sqrt(chi, out=chi)
    pts /= chi
    pts *= scales[lbl]
    pts += centers[lbl]
    # 5% uniform background spread over the support
    nbg = int(0.05 * m)
    if nbg:
        bg = rng.uniform(-8.0, 8.0, size=(nbg, d)).astype(np.float32)
        pts[rng.choice(m, size=nbg, replace=False)] = bg
    return pts


def make_params(kind: str, d: int, seed: int,
                num_clusters: int = 1024, num_super: int = 32):
    if kind == "blobs":
        rng = np.random.default_rng(seed)
        return (rng.standard_normal((64, d)).astype(np.float32) * 2.0)
    if kind == "hard":
        return _hard_params(d, num_clusters, num_super, seed)
    raise ValueError(f"unknown dataset kind {kind!r}")


# Byte quantization for SIFT/SPACEV-style bases (the reference stores those
# as .u8bin/.i8bin and widens bytes to f32 at read time, points_io.cpp:
# 114-124). One fixed affine map for the whole dataset: the 'hard' mixture's
# support is ~[-10, 10], so scale 12 uses most of the byte range.
U8_SCALE = 12.0


def _quantize_chunk(pts: np.ndarray, dtype: str) -> np.ndarray:
    """Quantize a float chunk to bytes (DESTROYS ``pts`` in place)."""
    if dtype == "u8":
        np.multiply(pts, U8_SCALE, out=pts)
        pts += 128.0
        np.rint(pts, out=pts)
        np.clip(pts, 0, 255, out=pts)
        return pts.astype(np.uint8)
    if dtype == "i8":
        np.multiply(pts, U8_SCALE, out=pts)
        np.rint(pts, out=pts)
        np.clip(pts, -128, 127, out=pts)
        return pts.astype(np.int8)
    return pts


def generate(
    kind: str, n: int, d: int, seed: int = 555,
    chunk_rows: int = 1 << 20,
    out_path: Optional[str] = None,
    dtype: str = "f32",
) -> np.ndarray:
    """Generate ``[n, d]`` points; memmap-backed when ``out_path`` is given
    (written chunk-by-chunk, O(chunk) RAM). ``dtype``: "f32" | "u8" | "i8" —
    byte dtypes store the quantized values and rely on consumers widening
    chunks to f32 on the fly (all streaming paths do, via
    ``np.asarray(chunk, np.float32)`` — same semantics as the reference's
    byte-widening loader, points_io.cpp:114-124)."""
    params = make_params(kind, d, seed)
    np_dtype = {"f32": np.float32, "u8": np.uint8, "i8": np.int8}[dtype]
    if out_path is None:
        out = np.empty((n, d), np_dtype)
    else:
        out = np.lib.format.open_memmap(
            out_path, mode="w+", dtype=np_dtype, shape=(n, d)
        )
    for ci, s in enumerate(range(0, n, chunk_rows)):
        m = min(chunk_rows, n - s)
        out[s : s + m] = _quantize_chunk(
            _gen_chunk(kind, m, d, seed, ci, params), dtype
        )
    if out_path is not None:
        out.flush()
        return np.load(out_path, mmap_mode="r")
    return out


def generate_queries(kind: str, nq: int, d: int, seed: int = 555,
                     dtype: str = "f32") -> np.ndarray:
    """Queries from the same distribution (chunk id -1 keeps them disjoint
    from every base chunk's stream). For byte dtypes the queries are
    quantized then widened to f32 — the domain the widened base lives in
    (big-ann byte datasets ship byte queries too)."""
    params = make_params(kind, d, seed)
    q = _gen_chunk(kind, nq, d, seed, 0x7E57, params)
    if dtype != "f32":
        q = _quantize_chunk(q, dtype).astype(np.float32)
    return q


class VirtualPoints:
    """Zero-disk array-like over the per-chunk-seeded generator.

    A 1B x 96 u8 base is 96 GB on disk; since every chunk is regenerated
    bit-identically from ``(seed, chunk_id)``, the base need not exist at
    all — ``points[s:e]`` regenerates exactly the chunks the slice covers.
    This is the 1B-scale stand-in for the reference's prefix-read of on-disk
    big-ann files (``points_io.cpp:25-27``): every pipeline stage consumes
    points via row slices (CLAUDE.md working rule), so a regenerating view
    slots in wherever a memmap does.

    ``iid_rows = True`` advertises that rows are exchangeable: a contiguous
    prefix is distributionally identical to a uniform random subsample, so
    samplers may take ``points[:ns]`` instead of fancy-indexing (which would
    regenerate every chunk). Fancy indexing IS supported (retry rounds of
    ``capacity_stream_assign`` use it) at a cost proportional to the number
    of distinct chunks touched.
    """

    iid_rows = True

    def __init__(self, kind: str, n: int, d: int, seed: int = 555,
                 dtype: str = "f32", chunk_rows: int = 1 << 20) -> None:
        self.kind, self.n, self.d, self.seed = kind, n, d, seed
        self.dtype_name = dtype
        self.chunk_rows = chunk_rows
        self.params = make_params(kind, d, seed)
        self.shape = (n, d)
        self.dtype = np.dtype(
            {"f32": np.float32, "u8": np.uint8, "i8": np.int8}[dtype])
        self._cache_id: int = -1
        self._cache: Optional[np.ndarray] = None

    def __len__(self) -> int:
        return self.n

    def _chunk(self, ci: int) -> np.ndarray:
        if ci != self._cache_id:
            m = min(self.chunk_rows, self.n - ci * self.chunk_rows)
            self._cache = _quantize_chunk(
                _gen_chunk(self.kind, m, self.d, self.seed, ci, self.params),
                self.dtype_name,
            )
            self._cache_id = ci
        return self._cache

    def __getitem__(self, idx):
        if isinstance(idx, tuple):
            rows = self[idx[0]]
            return rows[(slice(None),) + tuple(idx[1:])]
        if isinstance(idx, slice):
            s, e, step = idx.indices(self.n)
            if step != 1:
                return self[np.arange(s, e, step)]
            if s >= e:
                return np.empty((0, self.d), self.dtype)
            c0, c1 = s // self.chunk_rows, (e - 1) // self.chunk_rows
            if c0 == c1:
                base = c0 * self.chunk_rows
                return self._chunk(c0)[s - base : e - base].copy()
            parts = []
            for ci in range(c0, c1 + 1):
                base = ci * self.chunk_rows
                lo = max(s, base) - base
                hi = min(e, base + self.chunk_rows) - base
                parts.append(self._chunk(ci)[lo:hi])
            return np.concatenate(parts, axis=0)
        idx = np.asarray(idx)
        if idx.ndim == 0:
            return self[int(idx) : int(idx) + 1][0]
        # fancy index: regenerate each touched chunk once, in chunk order
        out = np.empty((len(idx), self.d), self.dtype)
        ci_of = idx // self.chunk_rows
        order = np.argsort(ci_of, kind="stable")
        sorted_ci = ci_of[order]
        bounds = np.nonzero(np.diff(sorted_ci))[0] + 1
        for grp in np.split(np.arange(len(idx)), bounds):
            ci = int(sorted_ci[grp[0]])
            chunk = self._chunk(ci)
            sel = order[grp]
            out[sel] = chunk[idx[sel] - ci * self.chunk_rows]
        return out


def dataset_cached(
    kind: str, n: int, d: int, seed: int = 555,
    cache_dir: Optional[str] = None,
    dtype: str = "f32",
) -> Tuple[np.ndarray, str]:
    """Memmap-backed dataset cached on disk; returns (memmap, path)."""
    cache_dir = cache_dir or os.path.expanduser("~/.cache/gpann_tpu")
    os.makedirs(cache_dir, exist_ok=True)
    suffix = "" if dtype == "f32" else f"_{dtype}"
    path = os.path.join(cache_dir, f"synth_{kind}_{seed}_{n}x{d}{suffix}.npy")
    if not os.path.exists(path):
        generate(kind, n, d, seed=seed, out_path=path, dtype=dtype)
    return np.load(path, mmap_mode="r"), path
