"""Native C++ tier: PEG construction and alist parsing."""

import numpy as np
import pytest

from ldpcsimulation_tpu import native
from ldpcsimulation_tpu.codes import dumps_alist, parse_alist, peg
from ldpcsimulation_tpu.codes.construct import nb_regular

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_native_peg_invariants():
    a = native.peg_native(96, 48, 3, seed=7)
    a.validate()
    assert a.dv == [3] * 96
    h = a.to_dense()
    assert h.sum() == 96 * 3
    gram = h.T @ h
    np.fill_diagonal(gram, 0)
    assert gram.max() <= 1  # girth >= 6, same bar as the Python backend


def test_native_peg_deterministic():
    a1 = native.peg_native(48, 24, 3, seed=3)
    a2 = native.peg_native(48, 24, 3, seed=3)
    assert a1.nlist == a2.nlist
    a3 = native.peg_native(48, 24, 3, seed=4)
    assert a1.nlist != a3.nlist


def test_peg_backend_dispatch():
    a = peg(48, 24, 3, seed=1, backend="native")
    a.validate()
    assert a.dv == [3] * 48


def test_native_alist_parse_matches_python():
    a = peg(96, 48, 3, seed=2, backend="python")
    for pad in (True, False):
        txt = dumps_alist(a, pad=pad)
        p1 = parse_alist(txt)
        p2 = native.parse_alist_native(txt)
        assert p1.nlist == p2.nlist and p1.mlist == p2.mlist


def test_native_alist_parse_nonbinary():
    a = nb_regular(24, 12, 3, q=8, seed=1)
    txt = dumps_alist(a)
    p1 = parse_alist(txt)
    p2 = native.parse_alist_native(txt)
    assert p1.nlist == p2.nlist
    assert p1.nvals == p2.nvals and p1.mvals == p2.mvals
    assert p2.q == 8
