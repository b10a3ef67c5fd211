"""QC auto-detection: exact structure recovery from expanded matrices."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpcsimulation_tpu.codes import build_code, load_alist
from ldpcsimulation_tpu.codes.alist import Alist
from ldpcsimulation_tpu.codes.qc import qc_peg
from ldpcsimulation_tpu.codes.qc_detect import detect_qc, permuted_decoder
from ldpcsimulation_tpu.codes.standards import wifi_648_rate12_qc
from ldpcsimulation_tpu.decoders.minsum import decode_minsum
from ldpcsimulation_tpu.decoders.minsum_qc import decode_minsum_qc
from tests.conftest import require_reference


def _edge_set(alist):
    return {
        (r, c) for r, lst in enumerate(alist.mlist) for c in lst
    }


def _assert_detected_matches(alist, det):
    """expand(det.qc) must equal H[row_perm][:, col_perm] edge-exactly."""
    exp = det.qc.to_alist()
    # map expanded edges back to original labels
    inv_r = det.row_perm  # permuted position -> original row
    inv_c = det.col_perm
    back = {
        (int(inv_r[r]), int(inv_c[c]))
        for r, lst in enumerate(exp.mlist)
        for c in lst
    }
    assert back == _edge_set(alist)


def test_detect_contiguous_qc_roundtrip():
    qc = qc_peg(8, 4, 3, z=16, seed=5)
    alist = qc.to_alist()
    det = detect_qc(alist)
    assert det is not None
    assert det.qc.z == 16
    assert (det.row_perm == np.arange(alist.m)).all()
    _assert_detected_matches(alist, det)


def test_detect_wifi_648():
    """The real 802.11n code is detected at its standard z=27."""
    alist = wifi_648_rate12_qc().to_alist()
    det = detect_qc(alist)
    assert det is not None and det.qc.z == 27
    _assert_detected_matches(alist, det)


def test_detect_interleaved_rows():
    """DVB-S2-style storage: rows stored as (offset-major) interleave."""
    qc = qc_peg(8, 4, 3, z=12, seed=3)
    alist = qc.to_alist()
    m, n = alist.m, alist.n
    q = m // 12
    # scatter rows: natural block layout -> interleaved storage where
    # original (stored) index i corresponds to block i%q, offset i//q
    imap = (np.arange(m) % q) * 12 + np.arange(m) // q  # stored -> natural
    mlist = [None] * m
    for i in range(m):
        mlist[i] = alist.mlist[int(imap[i])]
    nlist = [[] for _ in range(n)]
    for r, lst in enumerate(mlist):
        for c in lst:
            nlist[c].append(r)
    shuffled = Alist(n=n, m=m, nlist=nlist, mlist=mlist)
    det = detect_qc(shuffled)
    assert det is not None and det.qc.z == 12
    _assert_detected_matches(shuffled, det)


def test_detect_rejects_unstructured():
    """The real 802.3an RS-LDPC has permutation (non-circulant) blocks."""
    p = require_reference("C_implementations/codes/802_3/802_3_H.alist")
    det = detect_qc(load_alist(p))
    assert det is None


def test_permuted_decoder_equivalence(rng):
    """Detected-QC decode (natural-order wrapper) agrees with the generic
    decoder on the same alist."""
    qc = qc_peg(12, 6, 3, z=8, seed=7)
    alist = qc.to_alist()
    code = build_code(alist)
    det = detect_qc(alist)
    assert det is not None
    y = jnp.asarray(rng.normal(0.9, 0.7, size=(48, code.n)))
    dec = permuted_decoder(
        det, lambda yq, key: decode_minsum_qc(det.qc, yq, 12,
                                              early_termination=True)
    )
    r_qc = dec(y, jax.random.key(0))
    r_gen = decode_minsum(code, y, 12, early_termination=True)
    h1 = np.asarray(r_qc.hard)
    h2 = np.asarray(r_gen.hard)
    # identical arithmetic up to float summation order; decisions agree
    assert (h1 == h2).mean() > 0.999
    np.testing.assert_array_equal(
        np.asarray(r_qc.satisfied), np.asarray(r_gen.satisfied)
    )
