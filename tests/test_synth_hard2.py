"""hard2 fast-generator contract: native/numpy parity, chunking
independence, distribution sanity.

hard2 is the counter-based generator the 1B virtual base runs on
(eval/synth.py; native/src/synth_gen.cc). The reference streams big-ann
files off disk (points_io.cpp:25-27); with zero egress the base is
regenerated per chunk instead, so generator determinism *is* dataset
integrity: every stage (aggs, assign+relayout, GT, curve) must see the
same bytes at row r.
"""

import numpy as np
import pytest

from gpann_tpu import native
from gpann_tpu.eval.synth import (
    VirtualPoints,
    _hard2_chunk_numpy,
    _quantize_chunk,
    gen_chunk_typed,
    generate,
    generate_queries,
    make_params,
)

D, SEED = 48, 917


@pytest.fixture(scope="module")
def params():
    return make_params("hard2", D, SEED)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_matches_numpy_oracle(params):
    m = 8192
    centers, scales, w = params
    cdf = np.cumsum(np.asarray(w, np.float64))
    ref_f = _hard2_chunk_numpy(m, D, SEED, 5 << 20, params)
    nat_f = native.synth_hard2_chunk(SEED, 5 << 20, m, D, centers, scales,
                                     cdf, "f32", 12.0)
    # -ffp-contract=off on the C++ side: both implementations round alike
    np.testing.assert_allclose(nat_f, ref_f, rtol=1e-5, atol=1e-5)
    nat_u = native.synth_hard2_chunk(SEED, 5 << 20, m, D, centers, scales,
                                     cdf, "u8", 12.0)
    ref_u = _quantize_chunk(ref_f.copy(), "u8")
    assert (nat_u != ref_u).mean() < 1e-4  # boundary rounding only
    nat_i = native.synth_hard2_chunk(SEED, 5 << 20, m, D, centers, scales,
                                     cdf, "i8", 12.0)
    ref_i = _quantize_chunk(ref_f.copy(), "i8")
    assert (nat_i != ref_i).mean() < 1e-4


def test_chunking_independence(params):
    """Row r's value depends only on (seed, r) — the property that lets
    stages with different chunk sizes agree bit-for-bit."""
    a = np.concatenate([
        gen_chunk_typed("hard2", 256, D, SEED, ci, params, "u8",
                        chunk_rows=256)
        for ci in range(4)
    ])
    b = np.concatenate([
        gen_chunk_typed("hard2", 512, D, SEED, ci, params, "u8",
                        chunk_rows=512)
        for ci in range(2)
    ])
    np.testing.assert_array_equal(a, b)


def test_virtual_points_slicing(params):
    n = 5000
    vp = VirtualPoints("hard2", n, D, SEED, dtype="u8", chunk_rows=1024)
    full = generate("hard2", n, D, SEED, chunk_rows=1024, dtype="u8")
    np.testing.assert_array_equal(vp[0:n], full)
    np.testing.assert_array_equal(vp[900:2100], full[900:2100])
    idx = np.random.default_rng(0).integers(0, n, size=333)
    np.testing.assert_array_equal(vp[idx], full[idx])


def test_distribution_sanity(params):
    pts = gen_chunk_typed("hard2", 60000, D, SEED, 0, params, "f32")
    assert np.isfinite(pts).all()
    # heavy-tail scale mixture: clearly super-gaussian spread
    assert 1.5 < pts.std() < 12.0
    # support roughly [-10, 10] like "hard" (background is [-8, 8))
    assert np.abs(np.median(pts)) < 1.0
    # u8 quantization uses a good part of the byte range
    u8 = gen_chunk_typed("hard2", 60000, D, SEED, 0, params, "u8")
    assert u8.min() < 30 and u8.max() > 225


def test_queries_disjoint_and_typed():
    qf = generate_queries("hard2", 100, D, SEED)
    qu = generate_queries("hard2", 100, D, SEED, dtype="u8")
    assert qf.dtype == np.float32 and qu.dtype == np.float32
    # byte queries are the quantized-then-widened lattice
    assert np.all(qu == np.rint(qu))
    base = generate("hard2", 2048, D, SEED)
    # query stream (chunk id 0x7E57) never collides with base rows
    dmin = ((qf[:4, None, :] - base[None, :, :]) ** 2).sum(-1).min()
    assert dmin > 0.0
