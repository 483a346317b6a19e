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
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpann_tpu.core.distances import Metric

BIN = 128          # columns per bin = TPU lane width
INNER = 1024       # dot-chunk columns inside the kernel (VMEM bound:
                   # base tile 6.3MB double-buffered + dot chunk must stay <16MB)


def _bintop2_kernel(q_ref, nvalid_ref, b_hbm, mn1_ref, am1_ref, mn2_ref,
                    am2_ref, b_buf, sems, *, metric: str, tc: int):
    """One (query-tile, base-tile) step: manually double-buffered INNER-chunk
    DMAs from HBM + dot + bin top-2 epilogue.

    The base tile stays in HBM (6.3 MB at tc=16384); Pallas auto-blocking
    would double/triple-buffer it and blow the 16 MB VMEM budget at large
    grids. Manual DMA keeps VMEM at ~2 x INNER-chunk (0.8 MB) + dot tile.
    Squared norms are recomputed in-kernel (cheaper than a second DMA whose
    1D slot buffer violates VMEM tiling); padding rows (>= n_valid, an SMEM
    scalar so shard sizes can vary at runtime) are masked by global row
    index.
    """
    q = q_ref[:]                       # [tq, d]
    tq = q.shape[0]
    if metric != "mips":
        qsq = jnp.sum(q * q, axis=1, keepdims=True)
    j = pl.program_id(1)
    n_chunks = tc // INNER
    # per-chunk constants hoisted out of the chunk loop (VPU-bound kernel)
    nb = INNER // BIN
    cols_iota = jax.lax.broadcasted_iota(jnp.int32, (tq, nb, BIN), 2)
    bin_iota = jax.lax.broadcasted_iota(jnp.int32, (tq, nb), 1)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (1, INNER), 1)

    def dma(slot, c):
        # b_hbm is the FULL array in HBM (ANY memory space only supports
        # whole-array blocks); chunk offsets are global
        off = j * tc + c * INNER
        return pltpu.make_async_copy(
            b_hbm.at[pl.ds(off, INNER), :],
            b_buf.at[slot], sems.at[slot],
        )

    dma(0, 0).start()
    for c in range(n_chunks):  # static unroll: n_chunks = tc/INNER = 16
        slot = c % 2
        if c + 1 < n_chunks:
            dma((c + 1) % 2, c + 1).start()
        dma(slot, c).wait()
        b = b_buf[slot]
        off = j * tc + c * INNER
        dots = jnp.dot(q, b.T, preferred_element_type=jnp.float32)
        if metric == "mips":
            dm = 1.0 - dots
        else:
            bsq = jnp.sum(b * b, axis=1)
            dm = qsq + bsq[None, :] - 2.0 * dots
        # mask padding rows (their vectors are zeros) by global row index
        dm = jnp.where(off + row_iota < nvalid_ref[0], dm, jnp.inf)
        dm3 = dm.reshape(tq, nb, BIN)
        local1 = jnp.argmin(dm3, axis=2).astype(jnp.int32)
        mn1 = jnp.min(dm3, axis=2)
        dm3b = jnp.where(cols_iota == local1[:, :, None], jnp.inf, dm3)
        local2 = jnp.argmin(dm3b, axis=2).astype(jnp.int32)
        mn2 = jnp.min(dm3b, axis=2)
        sl = slice(c * nb, (c + 1) * nb)
        mn1_ref[:, sl] = mn1
        mn2_ref[:, sl] = mn2
        am1_ref[:, sl] = off + bin_iota * BIN + local1
        am2_ref[:, sl] = off + bin_iota * BIN + local2


@functools.partial(jax.jit, static_argnames=("metric", "tq", "tc", "interpret"))
def binmin_scan(
    qs: jnp.ndarray,          # [m, d] float32
    base: jnp.ndarray,        # [cap, d] float32 (rows padded arbitrarily)
    n_valid,                  # scalar: rows < n_valid are real (rest padding)
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
    m = qs.shape[0]
    if m % tq:
        raise ValueError(
            f"query count {m} must be a multiple of tq={tq} — trailing rows "
            "would never be written (fused_topk pads for you)"
        )
    # HBM DMA slices need the minor dim aligned to the 128-lane tiling; zero
    # column padding changes no distance (callers may pre-pad to avoid the
    # copy — pad_base_for_scan does). qs and base may arrive with different
    # widths (one already padded): bring both to the common 128-multiple.
    d = -(-max(qs.shape[1], base.shape[1]) // 128) * 128
    if qs.shape[1] != d:
        qs = jnp.pad(qs, ((0, 0), (0, d - qs.shape[1])))
    if base.shape[1] != d:
        base = jnp.pad(base, ((0, 0), (0, d - base.shape[1])))
    cap = base.shape[0]
    grid = (m // tq, cap // tc)
    nv = jnp.asarray(n_valid, jnp.int32).reshape(1)
    kernel = functools.partial(_bintop2_kernel, metric=metric, tc=tc)
    nbin_t = tc // BIN
    L = cap // BIN
    mn1, am1, mn2, am2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, d), lambda i, j: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
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
        scratch_shapes=[
            pltpu.VMEM((2, INNER, d), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(qs, nv, base)
    return (
        jnp.concatenate([mn1, mn2], axis=1),
        jnp.concatenate([am1, am2], axis=1),
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "num_candidate_bins", "interpret", "tq",
                     "tc", "phase2"),
)
def fused_topk(
    qs: jnp.ndarray,
    base: jnp.ndarray,
    n_valid,
    k: int,
    metric: Metric = "l2",
    num_candidate_bins: int = 0,
    interpret: bool = False,
    tq: int = 128,
    tc: int = 16384,
    phase2: str = "exact",
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
    if base.shape[1] % 128:
        d_pad = -(-base.shape[1] // 128) * 128
        base = jnp.pad(base, ((0, 0), (0, d_pad - base.shape[1])))
    if qs.shape[1] != base.shape[1]:
        qs = jnp.pad(qs, ((0, 0), (0, base.shape[1] - qs.shape[1])))
    m = qs.shape[0]
    if m % tq:  # pad query rows to the grid; sliced off below
        qs = jnp.pad(qs, ((0, -(-m // tq) * tq - m), (0, 0)))
    mins, argmins = binmin_scan(qs, base, n_valid, metric, tq=tq, tc=tc,
                                interpret=interpret)
    if mins.shape[0] != m:
        qs, mins, argmins = qs[:m], mins[:m], argmins[:m]
    nc = min(nc, mins.shape[1])
    if phase2 == "approx" and nc < mins.shape[1]:
        negb, bpos = jax.lax.approx_max_k(-mins, nc, recall_target=0.95)
    else:
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
    n_valid,
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
        d, i = fused_topk(qs[s : s + query_chunk], base, n_valid, k, metric,
                          **kwargs)
        outs_d.append(np.asarray(d))
        outs_i.append(np.asarray(i))
    return np.concatenate(outs_d), np.concatenate(outs_i)


def pad_base_for_scan(
    points: np.ndarray, metric: Metric, tc: int = 16384
) -> Tuple[np.ndarray, int]:
    """Pad base rows to a multiple of tc AND columns to a multiple of 128
    (HBM DMA tiling); zero column padding changes no distance. Returns
    (padded base, n_valid) — rows >= n_valid are padding, masked in-kernel."""
    n, d = points.shape
    n_pad = -(-n // tc) * tc
    d_pad = -(-d // 128) * 128
    base = np.zeros((n_pad, d_pad), np.float32)
    base[:n, :d] = points
    return base, n


def _bintop2_blocks_kernel(q_ref, row_off_ref, sizes_ref, b_hbm, mn1_ref,
                           am1_ref, mn2_ref, am2_ref, b_buf, sems,
                           *, metric: str, tc: int):
    """Multi-block variant of :func:`_bintop2_kernel`: grid axis 0 walks probe
    blocks, each scanning a different window of one flat base array.

    ``row_off_ref``/``sizes_ref`` (SMEM, [num_blocks]) give each block's
    first row in the flat base and its live row count. One ``pallas_call``
    covers every (block, query-tile, base-tile) step — the per-call dispatch
    overhead and the per-block HBM gather of the lax.scan-of-kernels
    structure (measured ~2 ms/block of the serving engine's scan stage) are
    amortized away. Padding blocks (size 0) skip the DMA + compute entirely
    via ``pl.when`` and emit +inf summaries.
    """
    b = pl.program_id(0)
    j = pl.program_id(2)
    size = sizes_ref[b]
    nb_bins = INNER // BIN
    tq = q_ref.shape[0]

    @pl.when(size == 0)
    def _pad():
        mn1_ref[...] = jnp.full_like(mn1_ref, jnp.inf)
        mn2_ref[...] = jnp.full_like(mn2_ref, jnp.inf)
        am1_ref[...] = jnp.zeros_like(am1_ref)
        am2_ref[...] = jnp.zeros_like(am2_ref)

    @pl.when(size > 0)
    def _real():
        q = q_ref[:]
        if metric != "mips":
            qsq = jnp.sum(q * q, axis=1, keepdims=True)
        n_chunks = tc // INNER
        cols_iota = jax.lax.broadcasted_iota(jnp.int32, (tq, nb_bins, BIN), 2)
        bin_iota = jax.lax.broadcasted_iota(jnp.int32, (tq, nb_bins), 1)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (1, INNER), 1)
        base_row = row_off_ref[b]

        def dma(slot, c):
            off = base_row + j * tc + c * INNER
            return pltpu.make_async_copy(
                b_hbm.at[pl.ds(off, INNER), :],
                b_buf.at[slot], sems.at[slot],
            )

        dma(0, 0).start()
        for c in range(n_chunks):
            slot = c % 2
            if c + 1 < n_chunks:
                dma((c + 1) % 2, c + 1).start()
            dma(slot, c).wait()
            bb = b_buf[slot]
            off_local = j * tc + c * INNER
            dots = jnp.dot(q, bb.T, preferred_element_type=jnp.float32)
            if metric == "mips":
                dm = 1.0 - dots
            else:
                bsq = jnp.sum(bb * bb, axis=1)
                dm = qsq + bsq[None, :] - 2.0 * dots
            dm = jnp.where(off_local + row_iota < size, dm, jnp.inf)
            dm3 = dm.reshape(tq, nb_bins, BIN)
            local1 = jnp.argmin(dm3, axis=2).astype(jnp.int32)
            mn1 = jnp.min(dm3, axis=2)
            dm3b = jnp.where(cols_iota == local1[:, :, None], jnp.inf, dm3)
            local2 = jnp.argmin(dm3b, axis=2).astype(jnp.int32)
            mn2 = jnp.min(dm3b, axis=2)
            sl = slice(c * nb_bins, (c + 1) * nb_bins)
            mn1_ref[:, sl] = mn1
            mn2_ref[:, sl] = mn2
            am1_ref[:, sl] = off_local + bin_iota * BIN + local1
            am2_ref[:, sl] = off_local + bin_iota * BIN + local2


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "qb", "cap", "num_candidate_bins",
                     "interpret", "tq", "tc", "phase2"),
)
def fused_topk_blocks(
    queries_blocks: jnp.ndarray,   # [nb*qb, d] block-major query rows
    base_flat: jnp.ndarray,        # [R, d] flat base (R multiple of nothing;
                                   # every window [row_off, row_off+cap) must
                                   # be in-bounds)
    row_off: jnp.ndarray,          # [nb] int32 first base row per block
    sizes: jnp.ndarray,            # [nb] int32 live rows per block (0=skip)
    k: int,
    metric: Metric = "l2",
    qb: int = 512,
    cap: int = 16384,
    num_candidate_bins: int = 0,
    interpret: bool = False,
    tq: int = 128,
    tc: int = 16384,
    phase2: str = "exact",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-block top-k: block ``b``'s ``qb`` query rows are scanned against
    base rows ``[row_off[b], row_off[b]+cap)`` (live prefix ``sizes[b]``).

    Returns (dists [nb*qb, k], LOCAL row ids [nb*qb, k]). One pallas_call +
    one batched phase-2/rescore for the entire block list — the serving
    engine's whole scan stage in a single compiled dispatch.

    ``phase2``: how the nc candidate bins are picked from the [total, 2L]
    bin summaries. "exact" = ``lax.top_k`` (sorting network; at serving
    shapes [8k x 4096] this was measured as a double-digit-ms share of the
    batch). "approx" = ``lax.approx_max_k`` (TPU partial-reduction top-k) —
    the same approximate-candidate design point as the bin top-2 epilogue
    itself; the exact f32 rescore then orders the survivors.
    """
    nb = row_off.shape[0]
    total = queries_blocks.shape[0]
    assert total == nb * qb, (total, nb, qb)
    if qb % tq:
        raise ValueError(f"qb={qb} must be a multiple of tq={tq}")
    if cap % tc:
        raise ValueError(f"cap={cap} must be a multiple of tc={tc}")
    d = base_flat.shape[1]
    if d % 128:
        dp = -(-d // 128) * 128
        base_flat = jnp.pad(base_flat, ((0, 0), (0, dp - d)))
        d = dp
    if queries_blocks.shape[1] != d:
        queries_blocks = jnp.pad(
            queries_blocks, ((0, 0), (0, d - queries_blocks.shape[1]))
        )
    nc = num_candidate_bins or max(k, 16)
    L = cap // BIN
    nbin_t = tc // BIN
    rows_per_block = qb // tq
    grid = (nb, rows_per_block, cap // tc)
    kernel = functools.partial(_bintop2_blocks_kernel, metric=metric, tc=tc)
    mn1, am1, mn2, am2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, d), lambda b, i, j: (b * rows_per_block + i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((tq, nbin_t), lambda b, i, j: (b * rows_per_block + i, j)),
            pl.BlockSpec((tq, nbin_t), lambda b, i, j: (b * rows_per_block + i, j)),
            pl.BlockSpec((tq, nbin_t), lambda b, i, j: (b * rows_per_block + i, j)),
            pl.BlockSpec((tq, nbin_t), lambda b, i, j: (b * rows_per_block + i, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((total, L), jnp.float32),
            jax.ShapeDtypeStruct((total, L), jnp.int32),
            jax.ShapeDtypeStruct((total, L), jnp.float32),
            jax.ShapeDtypeStruct((total, L), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, INNER, d), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(queries_blocks,
      jnp.asarray(row_off, jnp.int32),
      jnp.asarray(sizes, jnp.int32),
      base_flat)
    mins = jnp.concatenate([mn1, mn2], axis=1)
    argmins = jnp.concatenate([am1, am2], axis=1)
    nc = min(nc, mins.shape[1])
    if phase2 == "approx" and nc < mins.shape[1]:
        negb, bpos = jax.lax.approx_max_k(-mins, nc, recall_target=0.95)
    else:
        negb, bpos = jax.lax.top_k(-mins, nc)
    cand_local = jnp.take_along_axis(argmins, bpos, axis=1)
    row_off_rows = jnp.repeat(
        jnp.asarray(row_off, jnp.int32), qb, total_repeat_length=total
    )
    cand = base_flat[row_off_rows[:, None] + cand_local]
    if metric == "mips":
        exact = 1.0 - jnp.einsum(
            "md,mcd->mc", queries_blocks, cand,
            precision=jax.lax.Precision.HIGHEST,
        )
    else:
        exact = jnp.sum((queries_blocks[:, None, :] - cand) ** 2, axis=-1)
    exact = jnp.where(jnp.isfinite(-negb), exact, jnp.inf)
    neg, pos = jax.lax.top_k(-exact, k)
    return -neg, jnp.take_along_axis(cand_local, pos, axis=1)
