"""QC code structure + gather-free decoder equivalence tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpcsimulation_tpu.channel import awgn, snr_to_sigma
from ldpcsimulation_tpu.codes.qc import (
    build_qc_code,
    find_girth6_shifts,
    qc_peg,
)
from ldpcsimulation_tpu.decoders.minsum import decode_minsum
from ldpcsimulation_tpu.decoders.minsum_qc import (
    decode_minsum_qc,
    qc_check_satisfied,
)


@pytest.fixture(scope="module")
def small_qc():
    return qc_peg(12, 6, 3, z=8, seed=3)  # (96, 48)


def test_qc_construction(small_qc):
    qc = small_qc
    assert qc.n == 96 and qc.m == 48
    assert qc.dv_max == 3
    h = qc.to_alist().to_dense()
    assert h.shape == (48, 96)
    assert (h.sum(axis=0) == 3).all()
    gram = h.T @ h
    np.fill_diagonal(gram, 0)
    assert gram.max() <= 1  # girth >= 6 guaranteed by shift search


def test_find_girth6_rejects_bad_small_z():
    mask = np.ones((2, 4), np.int64)  # dense base
    with pytest.raises(RuntimeError):
        find_girth6_shifts(mask, z=2, tries=20)


def test_qc_block_tables(small_qc):
    qc = small_qc
    base = np.array(qc.base)
    for bj, rows in enumerate(qc.vn_blocks):
        assert [bi for bi, _ in rows] == sorted(
            bi for bi in range(qc.mb) if base[bi, bj] >= 0
        )
        for bi, shift in rows:
            assert shift == base[bi, bj] % qc.z
    for bi, cols in enumerate(qc.cn_blocks):
        assert [bj for bj, _ in cols] == sorted(
            bj for bj in range(qc.nb) if base[bi, bj] >= 0
        )


@pytest.mark.parametrize(
    "variant,kw",
    [("plain", {}), ("normalized", {"alpha": 1.25}), ("offset", {"delta": 0.1})],
)
def test_qc_decoder_bitexact_vs_generic(small_qc, rng, variant, kw):
    qc = small_qc
    code = qc.to_code()
    y = rng.normal(0, 1.2, size=(16, qc.n))
    r1 = decode_minsum(code, jnp.asarray(y), 8, variant=variant, **kw)
    r2 = decode_minsum_qc(qc, jnp.asarray(y), 8, variant=variant, **kw)
    np.testing.assert_array_equal(np.asarray(r1.hard), np.asarray(r2.hard))
    np.testing.assert_array_equal(
        np.asarray(r1.satisfied), np.asarray(r2.satisfied)
    )


def test_qc_decoder_early_termination(small_qc, rng):
    qc = small_qc
    code = qc.to_code()
    y = rng.normal(0.8, 0.7, size=(32, qc.n))
    r1 = decode_minsum(code, jnp.asarray(y), 15, early_termination=True)
    r2 = decode_minsum_qc(qc, jnp.asarray(y), 15, early_termination=True)
    np.testing.assert_array_equal(np.asarray(r1.hard), np.asarray(r2.hard))
    np.testing.assert_array_equal(
        np.asarray(r1.iterations), np.asarray(r2.iterations)
    )


def test_qc_check_satisfied(small_qc):
    qc = small_qc
    d = jnp.ones((qc.nb, qc.z, 3), jnp.int32)  # all-one word is a codeword
    assert np.asarray(qc_check_satisfied(qc, d)).all()
    d = d.at[0, 0, 1].set(-1)  # single bit flip violates its checks
    ok = np.asarray(qc_check_satisfied(qc, d))
    assert ok[0] and not ok[1] and ok[2]


def test_qc_hybrid_storage_decodes(small_qc):
    """f16 storage + f32 arithmetic: decodes clean frames, decisions match
    full precision on a comfortable-SNR batch."""
    qc = small_qc
    sigma = float(snr_to_sigma(5.0, 0.5))
    y = awgn(jax.random.key(2), jnp.ones((64, qc.n)), sigma, dtype=jnp.float32)
    r32 = decode_minsum_qc(qc, y, 12, early_termination=True)
    r16 = decode_minsum_qc(
        qc, y, 12, early_termination=True, storage_dtype=jnp.float16
    )
    h32 = np.asarray(r32.hard)
    h16 = np.asarray(r16.hard)
    assert (h16 == h32).mean() > 0.999
    assert (h16 == 1).all(axis=1).mean() > 0.9


def test_qc_flagship_registry():
    from ldpcsimulation_tpu.codes.library import load_named_qc

    qc = load_named_qc("qc_1008_504")
    assert qc.n == 1008 and qc.m == 504
    h = qc.to_alist().to_dense()
    gram = h.T @ h
    np.fill_diagonal(gram, 0)
    assert gram.max() <= 1


def test_bp_qc_bitexact_vs_generic(small_qc, rng):
    from ldpcsimulation_tpu.decoders.bp import decode_bp
    from ldpcsimulation_tpu.decoders.bp_qc import decode_bp_qc

    qc = small_qc
    code = qc.to_code()
    llr = np.clip(rng.normal(0, 3.0, size=(12, qc.n)), -20, 20)
    for et in (False, True):
        r1 = decode_bp(code, jnp.asarray(llr), 8, early_termination=et)
        r2 = decode_bp_qc(qc, jnp.asarray(llr), 8, early_termination=et)
        np.testing.assert_array_equal(np.asarray(r1.hard), np.asarray(r2.hard))
        np.testing.assert_array_equal(
            np.asarray(r1.iterations), np.asarray(r2.iterations)
        )


def test_generic_f16_storage_bitexact_vs_qc_f16(small_qc, rng):
    """The generic path's storage_dtype flag mirrors the QC one exactly:
    same rounding points, so the two f16 decoders stay bit-identical."""
    qc = small_qc
    code = qc.to_code()
    y = jnp.asarray(rng.normal(0.9, 0.8, size=(32, qc.n)), jnp.float32)
    r1 = decode_minsum(
        code, y, 10, early_termination=True, storage_dtype=jnp.float16
    )
    r2 = decode_minsum_qc(
        qc, y, 10, early_termination=True, storage_dtype=jnp.float16
    )
    np.testing.assert_array_equal(np.asarray(r1.hard), np.asarray(r2.hard))
    np.testing.assert_array_equal(
        np.asarray(r1.iterations), np.asarray(r2.iterations)
    )


def test_bp_qc_clamps_input_llrs(small_qc, rng):
    """Regression: decode_bp_qc must clamp input LLRs like decode_bp
    (decodeBP.cpp:188-191) — unclamped |llr| ≳ 89 underflows phi to 0 and
    NaN-poisons frames on the QC fast path only."""
    from ldpcsimulation_tpu.decoders.bp import decode_bp
    from ldpcsimulation_tpu.decoders.bp_qc import decode_bp_qc

    qc = small_qc
    code = qc.to_code()
    llr = rng.normal(0, 200.0, size=(8, qc.n))  # far beyond MAXLLR
    r1 = decode_bp(code, jnp.asarray(llr), 6)
    r2 = decode_bp_qc(qc, jnp.asarray(llr), 6)
    assert np.isfinite(np.asarray(r2.hard)).all()
    np.testing.assert_array_equal(np.asarray(r1.hard), np.asarray(r2.hard))


def test_bp_qc_f16_storage_decodes(small_qc):
    """BP f16 message storage + f32 arithmetic: decodes clean frames,
    decisions match full precision on a comfortable-SNR batch (the
    bench precision mode extended to BP)."""
    from ldpcsimulation_tpu.channel.awgn import llr_from_channel, snr_to_n0
    from ldpcsimulation_tpu.decoders.bp_qc import decode_bp_qc

    qc = small_qc
    sigma = float(snr_to_sigma(5.0, 0.5))
    n0 = float(snr_to_n0(5.0, 0.5))
    y = awgn(jax.random.key(7), jnp.ones((64, qc.n)), sigma, dtype=jnp.float32)
    llr = llr_from_channel(y, n0)
    r32 = decode_bp_qc(qc, llr, 12, early_termination=True)
    r16 = decode_bp_qc(
        qc, llr, 12, early_termination=True, storage_dtype=jnp.float16
    )
    h32 = np.asarray(r32.hard)
    h16 = np.asarray(r16.hard)
    assert (h16 == h32).mean() > 0.999
    assert (h16 == 1).all(axis=1).mean() > 0.9


def test_bp_generic_f16_bitexact_vs_qc_f16(small_qc, rng):
    """decode_bp's storage_dtype mirrors decode_bp_qc's rounding points
    exactly, so the two f16 BP decoders stay bit-identical."""
    from ldpcsimulation_tpu.decoders.bp import decode_bp
    from ldpcsimulation_tpu.decoders.bp_qc import decode_bp_qc

    qc = small_qc
    code = qc.to_code()
    llr = jnp.asarray(
        np.clip(rng.normal(0, 3.0, size=(16, qc.n)), -20, 20), jnp.float32
    )
    for et in (False, True):
        r1 = decode_bp(
            code, llr, 8, early_termination=et, storage_dtype=jnp.float16
        )
        r2 = decode_bp_qc(
            qc, llr, 8, early_termination=et, storage_dtype=jnp.float16
        )
        np.testing.assert_array_equal(np.asarray(r1.hard), np.asarray(r2.hard))
        np.testing.assert_array_equal(
            np.asarray(r1.iterations), np.asarray(r2.iterations)
        )


def test_int_scan_bitexact(small_qc, rng):
    """Sign-magnitude integer-view CN scan (minsum_qc._cn_scan_int) is
    bit-identical to the float scan for f16 AND f32 storage, including
    early termination (VERDICT r3 item 7 probe)."""
    import jax.numpy as jnp

    from ldpcsimulation_tpu.channel import awgn, snr_to_sigma
    from ldpcsimulation_tpu.decoders.minsum_qc import decode_minsum_qc

    qc = small_qc
    sigma = float(snr_to_sigma(2.0, 0.5))
    y = awgn(jax.random.key(3), jnp.ones((32, qc.n)), sigma)
    for sdt in (jnp.float16, None):
        a = decode_minsum_qc(
            qc, y, 12, early_termination=True, storage_dtype=sdt,
            int_scan=True,
        )
        b = decode_minsum_qc(
            qc, y, 12, early_termination=True, storage_dtype=sdt,
        )
        np.testing.assert_array_equal(
            np.asarray(a.hard), np.asarray(b.hard), err_msg=str(sdt)
        )
        np.testing.assert_array_equal(
            np.asarray(a.iterations), np.asarray(b.iterations)
        )
