"""Fused single-device serving engine: route + group + scan + merge in one jit.

Production query path (the role of the reference's per-query serving loop,
``small_scale_queries.cpp:146-188``, redesigned for the chip):

measured on this environment: host->device ~1.3 GB/s, device->host ~20 MB/s.
Any intermediate readback murders throughput, so the WHOLE query pipeline is
one compiled program:

1. **Route**: distance matmul against the routing points, top-T vote fold
   (scatter-min / scatter-add), probe ranking — all on device. The four probe
   rules of ``hnsw_router.h:55-104`` are supported; rules that cut the probe
   list short (Pyramid/SPANN) route those slots to a dummy shard whose size
   is 0, so they also cut compute.
2. **Group**: the (query, shard) probe pairs are sorted by shard and packed
   into fixed ``[query_block]`` blocks with static shapes (worst-case
   padding: ceil(m*nprobes/qb) + num_shards blocks).
3. **Scan**: one ``lax.scan`` over query blocks; each step gathers its
   shard's resident block and runs the fused HIGH-precision distance matmul
   + top-k + exact rescore.
4. **Merge**: results scattered back to a per-query candidate table, final
   top-k on device. Only the [m, k] result crosses back to host.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gpann_tpu.core.distances import Metric, default_precision, sq_norms
from gpann_tpu.core.partition import Clusters
from gpann_tpu.search.ivf import _exact_rescore, _round_up, _scan_k


class ServingEngine:
    """Resident shard blocks + routing points; fused serve() per config."""

    def __init__(
        self,
        points: np.ndarray,
        clusters: Clusters,
        routing_points: np.ndarray,
        routing_labels: np.ndarray,
        metric: Metric = "l2",
        pad_multiple: int = 512,
        precision=None,
        rescore: bool = True,
        scan_mode: str = "exact",
        interpret: bool = False,
    ) -> None:
        """``scan_mode``: "exact" = XLA top_k over the full distance tile
        (exact in-shard top-k); "binned" = Pallas bin-top-2 kernel
        (pallas_scan.py) — ~5x faster shard scans at recall@10 > 0.999."""
        self.metric: Metric = metric
        self.precision = default_precision() if precision is None else precision
        self.rescore = rescore
        self.scan_mode = scan_mode
        self.interpret = interpret
        self.num_shards = len(clusters)
        sizes = np.asarray([len(c) for c in clusters], np.int32)
        all_ids = (
            np.concatenate([np.asarray(c) for c in clusters if len(c)])
            if any(len(c) for c in clusters) else np.empty(0, np.int32)
        )
        # overlapping clusterings can return one point from several probed
        # shards; the merge then dedups ids on device
        self.overlapping = len(np.unique(all_ids)) < len(all_ids)
        if scan_mode == "binned":
            from gpann_tpu.search.pallas_scan import BIN  # noqa: F401

            pad_multiple = max(pad_multiple, 16384)  # tc granularity
        cap = _round_up(max(int(sizes.max()), 1), pad_multiple)
        self.capacity = cap
        self.max_size = int(sizes.max())
        blocks = np.zeros((self.num_shards, cap, points.shape[1]), np.float32)
        ids = np.full((self.num_shards, cap), -1, np.int32)
        for b, members in enumerate(clusters):
            members = np.asarray(members, np.int64)
            blocks[b, : len(members)] = points[members]
            ids[b, : len(members)] = members
        self.shard_points = jnp.asarray(blocks)
        # sizes with a trailing 0 entry: dummy shard id == num_shards
        self.shard_sizes_ext = jnp.asarray(np.concatenate([sizes, [0]]))
        self.shard_ids = jnp.asarray(ids)
        self.router_points = jnp.asarray(routing_points, jnp.float32)
        self.router_labels = jnp.asarray(routing_labels, jnp.int32)
        # shard-major routing blocks for the min_dist rule: per-shard min is
        # a masked reduction per block — no top_k (its k>16 path is slow)
        routing_labels = np.asarray(routing_labels)
        r_counts = np.bincount(routing_labels, minlength=self.num_shards)
        r_pad = _round_up(max(int(r_counts.max()), 1), 128)
        r_blocks = np.zeros((self.num_shards, r_pad, routing_points.shape[1]),
                            np.float32)
        r_bsq = np.full((self.num_shards, r_pad), np.inf, np.float32)
        for b in range(self.num_shards):
            members = np.nonzero(routing_labels == b)[0]
            r_blocks[b, : len(members)] = routing_points[members]
            r_bsq[b, : len(members)] = (
                (routing_points[members].astype(np.float64) ** 2).sum(1)
            ).astype(np.float32)
        self.router_blocks = jnp.asarray(r_blocks)
        self.router_bsq = jnp.asarray(r_bsq)
        self._fns: dict = {}

    # -- compiled pipeline -----------------------------------------------------
    def _build(self, k: int, nprobes: int, voting_t: int, rule: str,
               qb: int, spann_eps: float):
        s = self.num_shards
        metric, precision, rescore = self.metric, self.precision, self.rescore
        cap = self.capacity

        scan_mode, interpret = self.scan_mode, self.interpret
        dedup = self.overlapping
        if scan_mode == "binned":
            from gpann_tpu.search.pallas_scan import BIN

            # top-2 per bin caps the candidate pool; tiny shards can't fill
            # k candidates from bins -> fall back to the exact scan
            if 2 * (self.max_size // BIN + 1) < 4 * k:
                scan_mode = "exact"

        def pipeline(queries, shard_points, shard_sizes_ext, shard_ids,
                     router_points, router_labels,
                     router_blocks, router_bsq):
            m = queries.shape[0]
            # ---- route ----
            if rule in ("min_dist", "pyramid", "spann"):
                # per-shard min distance via masked block reductions — no
                # top_k (slow for k>16) and no scatter
                q_sq = sq_norms(queries) if metric == "l2" else None

                def shard_min(carry, inp):
                    blk, bbsq = inp
                    dots = jnp.dot(queries, blk.T,
                                   preferred_element_type=jnp.float32,
                                   precision=precision)
                    if metric == "mips":
                        dmb = 1.0 - dots
                    else:
                        dmb = q_sq[:, None] + bbsq[None, :] - 2.0 * dots
                    dmb = jnp.where(jnp.isfinite(bbsq)[None, :], dmb, jnp.inf)
                    return carry, jnp.min(dmb, axis=1)

                _, mins = jax.lax.scan(
                    shard_min, None, (router_blocks, router_bsq)
                )
                min_d = mins.T  # [m, s]
            else:
                rdots = jnp.dot(queries, router_points.T,
                                preferred_element_type=jnp.float32,
                                precision=precision)
                if metric == "mips":
                    rdm = 1.0 - rdots
                else:
                    rdm = (sq_norms(queries)[:, None]
                           + sq_norms(router_points)[None, :] - 2.0 * rdots)
                t = min(voting_t, router_points.shape[0])
                neg, nidx = jax.lax.top_k(-rdm, t)
                ndist = -neg
                nshard = router_labels[nidx]
                row = jnp.arange(m)[:, None]
                min_d = jnp.full((m, s), jnp.inf).at[row, nshard].min(ndist)
            if rule == "frequency":
                freq = jnp.zeros((m, s), jnp.int32).at[row, nshard].add(1)
                by_d = jnp.argsort(
                    jnp.where(jnp.isfinite(min_d), min_d, 1e30), axis=1,
                    stable=True,
                )
                f_sorted = jnp.take_along_axis(freq, by_d, axis=1)
                by_f = jnp.argsort(-f_sorted, axis=1, stable=True)
                order = jnp.take_along_axis(by_d, by_f, axis=1)
                seen = jnp.take_along_axis(freq, order, axis=1) > 0
            else:
                order = jnp.argsort(min_d, axis=1, stable=True)
                sorted_d = jnp.take_along_axis(min_d, order, axis=1)
                if rule == "pyramid":
                    seen = jnp.isfinite(sorted_d)
                elif rule == "spann":
                    closest = sorted_d[:, :1]
                    seen = jnp.isfinite(sorted_d) & (
                        sorted_d <= (1.0 + spann_eps) * closest
                    )
                else:  # min_dist probes every requested shard
                    seen = jnp.ones_like(sorted_d, bool)
            probes = jnp.where(seen, order, s)[:, :nprobes].astype(jnp.int32)

            # ---- group (static shapes) ----
            mn = m * nprobes
            flat_b = probes.reshape(-1)
            sort = jnp.argsort(flat_b, stable=True)
            b_sorted = flat_b[sort]
            q_sorted = (sort // nprobes).astype(jnp.int32)
            slot_sorted = (sort % nprobes).astype(jnp.int32)
            counts = jnp.zeros(s + 1, jnp.int32).at[b_sorted].add(1)
            padded = -(-counts // qb) * qb
            starts = jnp.concatenate(
                [jnp.zeros(1, jnp.int32), jnp.cumsum(padded)]
            )[:-1]
            first = jnp.searchsorted(b_sorted, jnp.arange(s + 1), side="left")
            rank = jnp.arange(mn, dtype=jnp.int32) - first[b_sorted]
            pos = starts[b_sorted] + rank
            total = -(-mn // qb) * qb + (s + 1) * qb  # static worst case
            nb = total // qb
            pair_q = jnp.full(total, m, jnp.int32).at[pos].set(q_sorted)
            # shard of each block: which padded range contains its start
            block_start = jnp.arange(nb, dtype=jnp.int32) * qb
            cum_padded = jnp.cumsum(padded)
            block_shard = jnp.searchsorted(
                cum_padded, block_start, side="right"
            ).astype(jnp.int32)
            block_shard = jnp.minimum(block_shard, s)

            # ---- scan ----
            queries_ext = jnp.concatenate(
                [queries, jnp.zeros((1, queries.shape[1]), queries.dtype)]
            )
            q_sq_ext = sq_norms(queries_ext) if metric == "l2" else None

            def scan_block(qidx, b):
                qs = queries_ext[qidx]
                blk = shard_points[jnp.minimum(b, s - 1)]
                size = shard_sizes_ext[b]  # 0 for dummy shard s
                bids = shard_ids[jnp.minimum(b, s - 1)]
                if scan_mode == "binned":
                    from gpann_tpu.search.pallas_scan import fused_topk

                    tq_eff = min(qb, 128)
                    if qb % tq_eff:
                        raise ValueError(
                            f"query_block={qb} must be a multiple of {tq_eff}"
                        )
                    # size==0 for the dummy shard masks every row in-kernel
                    d, pos2 = fused_topk(qs, blk, size, k, metric,
                                         interpret=interpret, tq=tq_eff)
                    return d, bids[pos2]
                dots = jnp.dot(qs, blk.T, preferred_element_type=jnp.float32,
                               precision=precision)
                if metric == "mips":
                    dm = 1.0 - dots
                else:
                    dm = (q_sq_ext[qidx][:, None] + sq_norms(blk)[None, :]
                          - 2.0 * dots)
                valid = jnp.arange(cap) < size
                dm = jnp.where(valid[None, :], dm, jnp.inf)
                negk, posk = jax.lax.top_k(-dm, _scan_k(k, cap, rescore))
                if rescore:
                    d, pos2 = _exact_rescore(qs, blk, -negk, posk, k, metric)
                    return d, bids[pos2]
                return -negk[:, :k], bids[posk[:, :k]]

            def body(carry, inp):
                qidx, b = inp
                # padding blocks (dummy shard or all-padding queries) skip the
                # scan entirely — the grouping's static worst case adds up to
                # s+1 such blocks per batch
                is_real = (shard_sizes_ext[b] > 0) & jnp.any(qidx < m)
                d, i = jax.lax.cond(
                    is_real,
                    lambda args: scan_block(*args),
                    lambda args: (
                        jnp.full((qb, k), jnp.inf, jnp.float32),
                        jnp.full((qb, k), -1, jnp.int32),
                    ),
                    (qidx, b),
                )
                return carry, (d, i)

            _, (bd, bi) = jax.lax.scan(
                body, None, (pair_q.reshape(nb, qb), block_shard)
            )
            bd = bd.reshape(total, k)
            bi = bi.reshape(total, k)

            # ---- merge ----
            out_d = jnp.full((m + 1, nprobes, k), jnp.inf).at[
                q_sorted, slot_sorted
            ].set(bd[pos])
            out_i = jnp.full((m + 1, nprobes, k), -1, jnp.int32).at[
                q_sorted, slot_sorted
            ].set(bi[pos])
            cat_d = out_d[:m].reshape(m, nprobes * k)
            cat_i = out_i[:m].reshape(m, nprobes * k)
            if dedup:
                # mask duplicate ids (keep one copy): sort by id, mark
                # equal-adjacent, scatter the mask back
                order_i = jnp.argsort(cat_i, axis=1, stable=True)
                sorted_i = jnp.take_along_axis(cat_i, order_i, axis=1)
                dup_sorted = jnp.concatenate(
                    [jnp.zeros((m, 1), bool),
                     (sorted_i[:, 1:] == sorted_i[:, :-1]) & (sorted_i[:, 1:] >= 0)],
                    axis=1,
                )
                dup = jnp.zeros_like(dup_sorted).at[
                    jnp.arange(m)[:, None], order_i
                ].set(dup_sorted)
                cat_d = jnp.where(dup, jnp.inf, cat_d)
            fneg, fpos = jax.lax.top_k(-cat_d, k)
            return -fneg, jnp.take_along_axis(cat_i, fpos, axis=1)

        return jax.jit(pipeline)

    def serve_device(
        self,
        queries,
        k: int,
        nprobes: int,
        voting_t: int = 60,
        rule: str = "min_dist",
        query_block: int = 1024,
        spann_eps: float = 0.6,
    ):
        """Like :meth:`serve` but returns device arrays — for pipelined
        serving loops that overlap result readback with the next batch's
        compute (this environment's D2H link is ~20 MB/s with ~50 ms
        round-trip; readback must never serialize the pipeline)."""
        key = (k, nprobes, voting_t, rule, query_block, spann_eps)
        if key not in self._fns:
            self._fns[key] = self._build(k, nprobes, voting_t, rule,
                                         query_block, spann_eps)
        return self._fns[key](
            jnp.asarray(queries, jnp.float32),
            self.shard_points,
            self.shard_sizes_ext,
            self.shard_ids,
            self.router_points,
            self.router_labels,
            self.router_blocks,
            self.router_bsq,
        )

    def serve(
        self,
        queries,
        k: int,
        nprobes: int,
        voting_t: int = 60,
        rule: str = "min_dist",
        query_block: int = 1024,
        spann_eps: float = 0.6,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """End-to-end routed search. ``queries`` may be a device array (no
        upload cost) or NumPy (uploaded once)."""
        key = (k, nprobes, voting_t, rule, query_block, spann_eps)
        if key not in self._fns:
            self._fns[key] = self._build(k, nprobes, voting_t, rule,
                                         query_block, spann_eps)
        d, i = self._fns[key](
            jnp.asarray(queries, jnp.float32),
            self.shard_points,
            self.shard_sizes_ext,
            self.shard_ids,
            self.router_points,
            self.router_labels,
            self.router_blocks,
            self.router_bsq,
        )
        return np.asarray(d), np.asarray(i)
