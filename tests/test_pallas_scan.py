"""Pallas bin-min scan kernel tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gpann_tpu.search.pallas_scan import (
    BIN,
    binmin_scan,
    fused_topk,
    pad_base_for_scan,
)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(555)
    base = rng.standard_normal((15900, 32)).astype(np.float32)  # needs padding
    qs = rng.standard_normal((256, 32)).astype(np.float32)
    return qs, base


def test_binmin_matches_numpy(data):
    qs, base = data
    padded, n_valid = pad_base_for_scan(base, "l2", tc=16384)
    mins, argmins = binmin_scan(
        jnp.asarray(qs), jnp.asarray(padded), n_valid,
        "l2", tq=128, tc=16384, interpret=True,
    )
    mins, argmins = np.asarray(mins), np.asarray(argmins)
    # padded may carry zero feature-padding columns: distances are unchanged
    dm = ((qs[:, None] - padded[None, :, : qs.shape[1]]) ** 2).sum(-1)
    dm[:, len(base):] = np.inf
    dm3 = dm.reshape(len(qs), -1, BIN)
    want1 = np.sort(dm3, axis=-1)[:, :, 0]  # per-bin min
    want2 = np.sort(dm3, axis=-1)[:, :, 1]  # per-bin 2nd min
    L = dm3.shape[1]
    got1 = mins[:, :L]
    got2 = mins[:, L:]
    for got, want in [(got1, want1), (got2, want2)]:
        np.testing.assert_allclose(
            np.where(np.isfinite(got), got, 0),
            np.where(np.isfinite(want), want, 0), rtol=1e-4, atol=1e-4,
        )
    # argmins point at elements with the reported distances
    got_d = dm[np.arange(len(qs))[:, None], argmins]
    np.testing.assert_allclose(
        np.where(np.isfinite(got_d), got_d, 0),
        np.where(np.isfinite(mins), mins, 0), rtol=1e-4, atol=1e-4,
    )


@pytest.mark.parametrize("metric", ["l2", "mips"])
def test_fused_topk_high_recall(data, metric):
    qs, base = data
    padded, n_valid = pad_base_for_scan(base, metric, tc=16384)
    d, i = fused_topk(
        jnp.asarray(qs), jnp.asarray(padded), n_valid, 10,
        metric=metric, interpret=True, tq=128, tc=16384,
    )
    d, i = np.asarray(d), np.asarray(i)
    assert (i < len(base)).all()  # padding never returned
    if metric == "l2":
        dm = ((qs[:, None] - base[None]) ** 2).sum(-1)
    else:
        dm = 1.0 - qs @ base.T
    want_ids = np.argsort(dm, axis=1)[:, :10]
    want_d = np.take_along_axis(dm, want_ids, axis=1)
    # bin-collision losses only: recall@10 must be near-perfect
    hits = np.array([
        len(np.intersect1d(i[q], want_ids[q])) for q in range(len(qs))
    ])
    assert hits.mean() / 10 > 0.97, hits.mean() / 10
    # returned distances are exact for the returned ids
    np.testing.assert_allclose(
        d, np.take_along_axis(dm, i, axis=1), rtol=1e-4, atol=1e-4
    )


def test_fused_topk_exhaustive_bins_is_exact(data):
    qs, base = data
    padded, n_valid = pad_base_for_scan(base, "l2", tc=16384)
    # with one candidate bin per point... bins >= k guarantee only; use all
    d, i = fused_topk(
        jnp.asarray(qs), jnp.asarray(padded), n_valid, 1,
        metric="l2", num_candidate_bins=2 * padded.shape[0] // BIN,
        interpret=True, tq=128, tc=16384,
    )
    dm = ((qs[:, None] - base[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(i)[:, 0], dm.argmin(1))
