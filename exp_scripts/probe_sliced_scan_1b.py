"""Chip probe: validate the sliced shard scan at the exact 1B curve shape.

The round-5 1B curve died with an HBM OOM (19.57G > 15.75G) scanning one
16,416,768-row padded u8 shard as a single fused_topk program
(exp_outputs/scale1b_r5.log). The fix (streamed.py::_scan_row_limit) slices
over-limit shards into <=2^22-row blocks merged on host. This probe builds
one synthetic shard of that exact size and runs the real
StreamedShardEngine._scan_shard path on the chip — ~5 min — so the ~4 h 1B
rerun doesn't gamble on an unvalidated fix.

Chip job: run bare (sitecustomize provides the axon platform). Serialize
with every other chip job (CLAUDE.md).
"""

import json
import sys
import time

import numpy as np

SHARD_ROWS = 15_700_000   # ~1B/64, below the 16,416,768 padded capacity
D = 64
NQ = 1024
K = 10


def main() -> int:
    t0 = time.time()
    import jax.numpy as jnp

    from gpann_tpu.search.streamed import StreamedShardEngine

    rng = np.random.default_rng(7)
    rows = np.frombuffer(rng.bytes(SHARD_ROWS * D), np.uint8).reshape(
        SHARD_ROWS, D)
    q = rng.standard_normal((NQ, D), dtype=np.float32) * 40.0 + 128.0
    print(f"# [{time.time()-t0:6.1f}s] host data ready "
          f"({rows.nbytes/1e9:.2f} GB u8)", file=sys.stderr, flush=True)

    eng = StreamedShardEngine(
        points=rows,
        clusters=[np.arange(SHARD_ROWS, dtype=np.int64)],
        routing_points=rng.standard_normal((4, D)).astype(np.float32),
        routing_labels=np.zeros(4, np.int32),
        scan_mode="binned",
    )
    limit = eng._scan_row_limit()
    print(f"# [{time.time()-t0:6.1f}s] capacity={eng.capacity} "
          f"limit={limit} blocks={-(-SHARD_ROWS // limit)}",
          file=sys.stderr, flush=True)

    qb = jnp.asarray(q)
    t1 = time.time()
    d, pos = eng._scan_shard(qb, rows, SHARD_ROWS, K)
    t_cold = time.time() - t1
    print(f"# [{time.time()-t0:6.1f}s] cold sliced scan ok: {t_cold:.1f}s",
          file=sys.stderr, flush=True)
    t1 = time.time()
    d2, pos2 = eng._scan_shard(qb, rows, SHARD_ROWS, K)
    t_warm = time.time() - t1

    # sanity: positions in range, distances sorted nondecreasing
    assert pos.min() >= 0 and pos.max() < SHARD_ROWS
    assert np.all(np.diff(d[:, :K], axis=1) >= -1e-3)
    assert np.array_equal(pos, pos2)
    print(json.dumps({
        "probe": "sliced_scan_1b_shard",
        "shard_rows": SHARD_ROWS,
        "limit": limit,
        "cold_s": round(t_cold, 1),
        "warm_s": round(t_warm, 1),
        "ok": True,
    }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
