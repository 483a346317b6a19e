"""Pallas fused distance-scan kernel: matmul -> per-bin top-2 epilogue.

The XLA scan path materializes the [m, cap] distance matrix in HBM and runs
``lax.top_k`` over it — measured ~0.5 ms of matmul + ~3.9 ms of top_k/HBM
traffic per [1024 x 62592 x 96] block on v5e. This kernel keeps each distance
tile in VMEM and reduces it to per-bin (BIN=128 columns, the lane width)
min1/min2 + argmins in the epilogue, so HBM sees only [m, cap/128] summaries
(64x smaller than dm).

Top-k then runs at bin granularity (cheap) and the winning candidates get an
exact f32 rescore. A true neighbor is lost only when >= 3 of the true top-k
collide in one 128-wide bin (birthday statistics over cap/128 bins; the
candidate oversample absorbs stragglers) — the same design point as
TPU-KNN / ``lax.approx_max_k``.

Mosaic constraints honored: 3D reshapes keep the last dim = 128; every
HBM-facing output block has a 128-multiple last dim (hence tc = 128*BIN);
the dot is chunked inside the kernel to bound VMEM.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpann_tpu.core.distances import Metric

BIN = 128          # columns per bin = TPU lane width
INNER = 1024       # dot-chunk columns inside the kernel (VMEM bound:
                   # base tile 6.3MB double-buffered + dot chunk must stay <16MB)


def _bintop2_kernel(q_ref, b_ref, bsq_ref, mn1_ref, am1_ref, mn2_ref,
                    am2_ref, *, metric: str, tc: int):
    """One (query-tile, base-tile) step: chunked dot + bin top-2 epilogue."""
    q = q_ref[:]                       # [tq, d]
    tq = q.shape[0]
    if metric != "mips":
        qsq = jnp.sum(q * q, axis=1, keepdims=True)
    j = pl.program_id(1)
    for c in range(tc // INNER):
        b = b_ref[c * INNER : (c + 1) * INNER, :]      # [INNER, d]
        bsq = bsq_ref[c * INNER : (c + 1) * INNER]
        dots = jnp.dot(q, b.T, preferred_element_type=jnp.float32)
        if metric == "mips":
            dm = 1.0 - dots
        else:
            dm = qsq + bsq[None, :] - 2.0 * dots
        # padding rows carry bsq=+inf and may never win (both metrics)
        dm = jnp.where(jnp.isfinite(bsq)[None, :], dm, jnp.inf)
        nb = INNER // BIN
        dm3 = dm.reshape(tq, nb, BIN)
        cols = jax.lax.broadcasted_iota(jnp.int32, (tq, nb, BIN), 2)
        local1 = jnp.argmin(dm3, axis=2).astype(jnp.int32)
        mn1 = jnp.min(dm3, axis=2)
        dm3b = jnp.where(cols == local1[:, :, None], jnp.inf, dm3)
        local2 = jnp.argmin(dm3b, axis=2).astype(jnp.int32)
        mn2 = jnp.min(dm3b, axis=2)
        off = j * tc + c * INNER
        bin_ids = jax.lax.broadcasted_iota(jnp.int32, (tq, nb), 1)
        sl = slice(c * nb, (c + 1) * nb)
        mn1_ref[:, sl] = mn1
        mn2_ref[:, sl] = mn2
        am1_ref[:, sl] = off + bin_ids * BIN + local1
        am2_ref[:, sl] = off + bin_ids * BIN + local2


@functools.partial(jax.jit, static_argnames=("metric", "tq", "tc", "interpret"))
def binmin_scan(
    qs: jnp.ndarray,          # [m, d] float32
    base: jnp.ndarray,        # [cap, d] float32 (rows padded arbitrarily)
    bsq: jnp.ndarray,         # [cap] float32 squared norms (+inf for padding)
    metric: Metric = "l2",
    tq: int = 128,
    tc: int = 16384,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-bin top-2 (distances, global column ids) over the whole base.

    m must be a multiple of tq; cap a multiple of tc (tc = 128*BIN so output
    tiles have 128 columns). Returns (mins [m, 2*cap/BIN],
    argmins [m, 2*cap/BIN]) with the two per-bin entries laid out as
    [all min1 | all min2] halves.
    """
    m, d = qs.shape
    cap = base.shape[0]
    grid = (m // tq, cap // tc)
    kernel = functools.partial(_bintop2_kernel, metric=metric, tc=tc)
    nbin_t = tc // BIN
    L = cap // BIN
    mn1, am1, mn2, am2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, d), lambda i, j: (i, 0)),
            pl.BlockSpec((tc, d), lambda i, j: (j, 0)),
            pl.BlockSpec((tc,), lambda i, j: (j,)),
        ],
        out_specs=[
            pl.BlockSpec((tq, nbin_t), lambda i, j: (i, j)),
            pl.BlockSpec((tq, nbin_t), lambda i, j: (i, j)),
            pl.BlockSpec((tq, nbin_t), lambda i, j: (i, j)),
            pl.BlockSpec((tq, nbin_t), lambda i, j: (i, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, L), jnp.float32),
            jax.ShapeDtypeStruct((m, L), jnp.int32),
            jax.ShapeDtypeStruct((m, L), jnp.float32),
            jax.ShapeDtypeStruct((m, L), jnp.int32),
        ],
        interpret=interpret,
    )(qs, base, bsq)
    return (
        jnp.concatenate([mn1, mn2], axis=1),
        jnp.concatenate([am1, am2], axis=1),
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "num_candidate_bins", "interpret", "tq", "tc"),
)
def fused_topk(
    qs: jnp.ndarray,
    base: jnp.ndarray,
    bsq: jnp.ndarray,
    k: int,
    metric: Metric = "l2",
    num_candidate_bins: int = 0,
    interpret: bool = False,
    tq: int = 128,
    tc: int = 16384,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k of each query in ``base`` via the bin-top-2 kernel.

    Phase 1: Pallas bin summaries. Phase 2: ``lax.top_k`` over bin entries.
    Phase 3: exact f32 rescore of the candidates. Returns
    (dists [m, k], column-ids [m, k]); padding rows never win.

    Candidate entries default to ``max(k, 16)``: lax.top_k on TPU has a fast
    path for k <= 16 (measured: nc=16 -> 0.17 ms vs nc=32 -> 1.4 ms per
    [1024 x 62592] block) and recall@10 is already 0.9999 at nc=16 thanks to
    the top-2-per-bin epilogue.
    """
    nc = num_candidate_bins or max(k, 16)
    mins, argmins = binmin_scan(qs, base, bsq, metric, tq=tq, tc=tc,
                                interpret=interpret)
    nc = min(nc, mins.shape[1])
    negb, bpos = jax.lax.top_k(-mins, nc)
    cand_cols = jnp.take_along_axis(argmins, bpos, axis=1)
    cand = base[cand_cols]
    if metric == "mips":
        exact = 1.0 - jnp.einsum(
            "md,mcd->mc", qs, cand, precision=jax.lax.Precision.HIGHEST
        )
    else:
        exact = jnp.sum((qs[:, None, :] - cand) ** 2, axis=-1)
    exact = jnp.where(jnp.isfinite(-negb), exact, jnp.inf)
    neg, pos = jax.lax.top_k(-exact, k)
    return -neg, jnp.take_along_axis(cand_cols, pos, axis=1)


def fused_topk_chunked(
    qs,
    base: jnp.ndarray,
    bsq: jnp.ndarray,
    k: int,
    metric: Metric = "l2",
    query_chunk: int = 1024,
    **kwargs,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-chunked :func:`fused_topk` for large query batches.

    XLA cross-program-prefetches the whole query operand into VMEM; above
    ~1-2k queries that (plus the double-buffered 6.3 MB base tiles) blows the
    16 MB budget. Chunking the queries keeps each call's footprint flat.
    Returns numpy arrays.
    """
    qs = jnp.asarray(qs, jnp.float32)
    outs_d, outs_i = [], []
    for s in range(0, qs.shape[0], query_chunk):
        d, i = fused_topk(qs[s : s + query_chunk], base, bsq, k, metric,
                          **kwargs)
        outs_d.append(np.asarray(d))
        outs_i.append(np.asarray(i))
    return np.concatenate(outs_d), np.concatenate(outs_i)


def pad_base_for_scan(
    points: np.ndarray, metric: Metric, tc: int = 16384
) -> Tuple[np.ndarray, np.ndarray]:
    """Pad base rows to a multiple of tc; padding gets +inf squared norm so
    it can never win (the kernel masks by isfinite(bsq) for both metrics)."""
    n, d = points.shape
    n_pad = -(-n // tc) * tc
    base = np.zeros((n_pad, d), np.float32)
    base[:n] = points
    bsq = np.full(n_pad, np.inf, np.float32)
    bsq[:n] = (points.astype(np.float64) ** 2).sum(1).astype(np.float32)
    return base, bsq
