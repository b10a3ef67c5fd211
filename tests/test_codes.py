"""Tests for alist parsing, code constructions, and the Code slot arrays."""

import numpy as np
import pytest

from ldpcsimulation_tpu.codes import (
    build_code,
    code_to_alist,
    dumps_alist,
    from_dense,
    load_alist,
    make_regular_code,
    parse_alist,
    peg,
    qc_expand,
    random_regular,
)
from tests.conftest import require_reference

# A tiny (7,3) parity-check matrix for hand-checkable cases.
H_TINY = np.array(
    [
        [1, 1, 0, 1, 0, 0, 1],
        [0, 1, 1, 0, 1, 0, 1],
        [1, 0, 1, 0, 0, 1, 0],
    ],
    dtype=np.int32,
)


def test_from_dense_roundtrip():
    a = from_dense(H_TINY)
    assert a.n == 7 and a.m == 3
    assert a.to_dense().tolist() == H_TINY.tolist()
    a.validate()
    text = dumps_alist(a)
    b = parse_alist(text)
    assert b.to_dense().tolist() == H_TINY.tolist()
    # unpadded round-trip too
    c = parse_alist(dumps_alist(a, pad=False))
    assert c.to_dense().tolist() == H_TINY.tolist()


def test_transposed_autodetect(tmp_path):
    a = from_dense(H_TINY)
    t = a.transpose()
    p = tmp_path / "t.alist"
    p.write_text(dumps_alist(t))
    loaded = load_alist(str(p))  # auto-orientation should swap back
    assert loaded.n == 7 and loaded.m == 3
    assert loaded.to_dense().tolist() == H_TINY.tolist()


def test_code_slot_arrays():
    code = build_code(from_dense(H_TINY))
    assert code.n == 7 and code.m == 3 and code.num_edges == int(H_TINY.sum())
    vn_cn = np.asarray(code.vn_cn)
    vn_mask = np.asarray(code.vn_mask)
    cn_vn = np.asarray(code.cn_vn)
    cn_mask = np.asarray(code.cn_mask)
    # Masked adjacency reproduces H
    h = np.zeros((3, 7), np.int32)
    for v in range(7):
        for s in range(code.dv_max):
            if vn_mask[v, s]:
                h[vn_cn[v, s], v] = 1
    assert h.tolist() == H_TINY.tolist()
    # Permutations are mutually inverse on valid slots
    cn_from_vn = np.asarray(code.cn_from_vn)
    vn_from_cn = np.asarray(code.vn_from_cn)
    for c in range(3):
        for t in range(code.dc_max):
            if not cn_mask[c, t]:
                continue
            flat_vn = cn_from_vn[c, t]
            v, s = divmod(flat_vn, code.dv_max)
            assert vn_mask[v, s]
            assert vn_cn[v, s] == c and cn_vn[c, t] == v
            assert vn_from_cn[v, s] == c * code.dc_max + t


def test_code_roundtrip_alist():
    code = build_code(from_dense(H_TINY))
    a = code_to_alist(code)
    assert a.to_dense().tolist() == H_TINY.tolist()


@pytest.mark.parametrize("n,m,dv", [(24, 12, 3), (96, 48, 3)])
def test_peg_regular(n, m, dv):
    a = peg(n, m, dv, seed=7)
    a.validate()
    assert a.dv == [dv] * n
    dc = n * dv // m
    assert all(abs(d - dc) <= 1 for d in a.dc)
    h = a.to_dense()
    # no empty checks, no duplicate edges (to_dense is 0/1)
    assert (h.sum(axis=1) > 0).all()
    assert h.sum() == n * dv
    # PEG on a (3,6) code at n=96 should achieve girth >= 6: no 4-cycles
    # means no pair of columns shares 2 rows. (At n=24 the graph is too
    # dense for girth 6, so only check the larger instance.)
    if n >= 96:
        gram = h.T @ h
        np.fill_diagonal(gram, 0)
        assert gram.max() <= 1


def test_peg_deterministic():
    a1 = peg(48, 24, 3, seed=3)
    a2 = peg(48, 24, 3, seed=3)
    assert a1.nlist == a2.nlist


def test_random_regular():
    a = random_regular(120, 60, 3, seed=1)
    a.validate()
    assert a.dv == [3] * 120
    assert a.dc == [6] * 60


def test_qc_expand():
    base = np.array([[0, 1, -1], [2, -1, 0]])
    z = 4
    a = qc_expand(base, z)
    a.validate()
    assert a.n == 12 and a.m == 8
    h = a.to_dense()
    # block (0,0) shift 0 => identity
    assert (h[0:4, 0:4] == np.eye(4)).all()
    # block (0,1) shift 1 => identity shifted right by 1
    assert (h[0:4, 4:8] == np.roll(np.eye(4, dtype=int), 1, axis=1)).all()
    # block (0,2) is zero
    assert h[0:4, 8:12].sum() == 0


def test_make_regular_code():
    code = make_regular_code(96, 48, 3, seed=0)
    assert code.n == 96 and code.m == 48 and code.num_edges == 288
    assert code.rate == pytest.approx(0.5)


def test_load_reference_pegreg():
    """Parity: load the reference's PEGReg504x1008 alist (skips if absent)."""
    p = require_reference(
        "C_implementations/codes/PEGReg504x1008/PEGReg504x1008.alist"
    )
    a = load_alist(p)
    assert a.n == 1008 and a.m == 504
    assert a.dv_max == 3 and a.dc_max == 8
    assert a.num_edges == 3024
    code = build_code(a)
    assert code.num_edges == 3024


def test_load_reference_transposed_systemc():
    """The SystemC tree stores the same code transposed (header '504 1008')."""
    p = require_reference("SystemC/NGDBF/codes/PegReg/PEGReg504x1008.alist")
    a = load_alist(p)  # auto-detect should normalize
    assert a.n == 1008 and a.m == 504


def test_load_reference_802_3():
    p = require_reference("C_implementations/codes/802_3/802_3.alist")
    a = load_alist(p)
    assert a.n == 2048


def test_load_reference_nonbinary():
    p = require_reference("SystemC/NB-LDPC/codes/GF4/q4.sp.9000.6000.4500.1")
    a = load_alist(p)
    assert a.q == 4
    assert a.n == 9000 and a.m == 6000
    assert a.nvals is not None
    # all coefficients nonzero field elements
    assert all(0 < v < 4 for row in a.nvals for v in row)


def test_load_all_reference_binary_alists():
    """Every binary alist shipped by the reference loads with correct
    dimensions (covers padded/unpadded dialects and the transposed
    802.11n storage, SURVEY §2.5)."""
    cases = [
        ("C_implementations/codes/4376.282.4.9598/4376.282.4.9598.alist",
         4376, 282),
        ("C_implementations/codes/802_3/802_3_H.alist", 2048, 384),
        ("C_implementations/codes/802_3/802_3.alist", 2048, 325),
    ]
    for rel, n, m in cases:
        p = require_reference(rel)
        a = load_alist(p)
        assert (a.n, a.m) == (n, m), rel
        a.validate()
    # The reference's two 802.11n alists are themselves truncated (their
    # adjacency sections are 24 tokens short of the declared degrees; no
    # reference program reads them — SURVEY §2.5 notes them as unused).
    # The parser must reject them loudly rather than mis-load.
    for rel in (
        "C_implementations/codes/802.11n/802.11n.alist",
        "C_implementations/codes/802.11n/ldpc_802.11n.alist",
    ):
        p = require_reference(rel)
        with pytest.raises(ValueError, match="truncated"):
            load_alist(p)


def test_load_reference_dvbs2_alist():
    """The 64800-column DVB-S2 rate-1/2 alist parses (large-file path)."""
    p = require_reference(
        "C_implementations/codes/dvbs2_1_2/dvbs2_1_2.alist"
    )
    a = load_alist(p, validate=False)  # full validate is O(E) dict-heavy
    assert a.n == 64800 and a.m == 32400
    assert a.num_edges == sum(a.dv)
    code = build_code(a)
    assert code.n == 64800


def test_true_rate_full_rank():
    """For a full-rank H, true_k == nominal k (and the value is cached)."""
    from ldpcsimulation_tpu.codes import make_regular_code

    code = make_regular_code(96, 48, 3, seed=0)
    tk = code.true_k()
    assert tk <= code.k
    assert code.true_k() is tk or code.true_k() == tk  # cached path
    assert code.true_rate() == tk / code.n


def test_true_rate_redundant_rows_802_3():
    """The reference's 802_3_H.alist has redundant rows (384 rows, rank 325)
    — nominal rate is wrong there, true_rate() gives the real one
    (the reference scripts hard-code R=0.8413 for the same reason)."""
    p = require_reference("C_implementations/codes/802_3/802_3_H.alist")
    code = build_code(load_alist(p))
    assert code.true_k() == 2048 - 325
    assert abs(code.true_rate() - 0.8413) < 2e-4
    assert code.rate != code.true_rate()


def test_random_regular_stays_regular_under_collision_swaps():
    """Regression: the parallel-edge resolution swap must be a true
    permutation of the socket multiset.  A vectorized fancy-index swap
    corrupted it when partner indices collided (numpy last-write-wins),
    yielding irregular check degrees on ~10% of seeds."""
    for seed in (5, 16, 36, 38, 0, 1, 2, 3):
        a = random_regular(500, 250, 4, seed=seed)
        a.validate()
        assert a.dv == [4] * 500, f"seed {seed}: variable degrees broken"
        assert a.dc == [8] * 250, f"seed {seed}: check degrees broken"
