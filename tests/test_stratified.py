"""Stratified block-permutation structure + MXU one-hot min-sum decoder.

Validates the structure invariants (strata, independent-set groups, H
round-trip) and bit-exact equivalence with the generic slot-array decoder
on the reference's real 802.3an ``802_3_H.alist`` — the code class this
path exists for (SURVEY §2.5; VERDICT round-1 item 2: exact-H perf gap).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpcsimulation_tpu.codes import build_code, load_alist
from ldpcsimulation_tpu.codes.construct import peg
from ldpcsimulation_tpu.codes.stratified import (
    StratifiedCode,
    detect_stratified,
    stratify,
)
from ldpcsimulation_tpu.decoders.minsum import decode_minsum
from ldpcsimulation_tpu.decoders.minsum_stratified import (
    decode_minsum_stratified,
    stratified_check_satisfied,
    stratified_to_cn,
    stratified_to_vn,
)

from .conftest import require_reference


@pytest.fixture(scope="module")
def ref_802_3():
    p = require_reference("C_implementations/codes/802_3/802_3_H.alist")
    alist = load_alist(p)
    return alist, build_code(alist), detect_stratified(alist)


def test_detects_802_3_structure(ref_802_3):
    alist, _code, sc = ref_802_3
    assert sc is not None
    # contiguous 64-row strata, one edge per column per stratum
    assert (sc.mb, sc.h) == (6, 64)
    assert np.asarray(sc.vn_valid).sum() == sc.num_edges == 12288
    assert sc.cost <= 2.0


def test_structure_reconstructs_h(ref_802_3):
    """The one-hot tensors + slot maps are exactly H, edge for edge."""
    alist, _code, sc = ref_802_3
    onehot = np.asarray(sc.onehot)
    col_slot = np.asarray(sc.col_slot)
    row_of = np.asarray(sc.row_of)
    edges = set()
    for b in range(sc.mb):
        for g in range(sc.kg):
            for c in range(sc.w):
                for r in np.nonzero(onehot[b, g, c])[0]:
                    col = col_slot[g, c]
                    row = row_of[b, r]
                    assert col >= 0 and row >= 0
                    edges.add((int(row), int(col)))
    want = {
        (r, c) for r, cols in enumerate(alist.mlist) for c in cols
    }
    assert edges == want
    # each one-hot row has at most one 1 (partial permutation)
    assert (onehot.sum(axis=3) <= 1).all()
    assert (onehot.sum(axis=2) <= 1).all()


def test_transforms_roundtrip(ref_802_3, rng):
    """to_cn followed by to_vn is the identity on valid slots (the block
    maps are partial permutations)."""
    _alist, _code, sc = ref_802_3
    x = jnp.asarray(
        rng.normal(size=(sc.mb, sc.kg, sc.w, 4)).astype(np.float32)
    )
    x = jnp.where(sc.vn_valid[..., None], x, 0.0)
    back = stratified_to_vn(sc, stratified_to_cn(sc, x))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(),
        dict(variant="normalized", alpha=1.25),
        dict(variant="offset", delta=0.15),
        dict(early_termination=True),
        dict(storage_dtype=jnp.float16),
        dict(early_termination=True, storage_dtype=jnp.float16),
    ],
    ids=["plain", "normalized", "offset", "et", "f16", "et_f16"],
)
def test_bitexact_vs_generic_802_3(ref_802_3, rng, kwargs):
    """Same decisions and iteration counts as the generic decoder on the
    real 802.3an H — one-hot einsum interleaving is exact."""
    _alist, code, sc = ref_802_3
    y = (1.0 + 0.55 * rng.standard_normal((16, code.n))).astype(np.float32)
    r_gen = decode_minsum(code, y, 6, **kwargs)
    r_str = decode_minsum_stratified(sc, y, 6, **kwargs)
    np.testing.assert_array_equal(
        np.asarray(r_gen.hard), np.asarray(r_str.hard)
    )
    np.testing.assert_array_equal(
        np.asarray(r_gen.iterations), np.asarray(r_str.iterations)
    )
    np.testing.assert_array_equal(
        np.asarray(r_gen.satisfied), np.asarray(r_str.satisfied)
    )


def test_f16_deep_run_no_overflow_garbage(ref_802_3):
    """Regression: dv=6 min-sum messages grow ~x7/iteration, overflowing
    f16 by T=10.  Un-saturated stores turned inf into 0*inf=NaN inside the
    one-hot einsum and sign-inverted WHOLE frames (BER 0.11 vs 2e-4 on
    TPU).  With saturating storage_cast the stratified and generic f16
    paths stay bit-identical and frame-inversion-free at the deep
    operating point that originally triggered it."""
    _alist, code, sc = ref_802_3
    rng = np.random.default_rng(3)
    y = (1.0 + 0.4755 * rng.standard_normal((256, code.n))).astype(
        np.float32
    )
    r_gen = decode_minsum(code, y, 10, storage_dtype=jnp.float16)
    r_str = decode_minsum_stratified(sc, y, 10, storage_dtype=jnp.float16)
    hg, hs = np.asarray(r_gen.hard), np.asarray(r_str.hard)
    np.testing.assert_array_equal(hg, hs)
    # no garbage frames: f16 bit errors must be commensurate with f32
    r32 = decode_minsum(code, y, 10)
    err32 = (np.asarray(r32.hard) < 0).sum()
    err16 = (hs < 0).sum()
    assert err16 <= max(4 * err32, err32 + 64), (err16, err32)


def test_check_satisfied_matches_generic(ref_802_3, rng):
    from ldpcsimulation_tpu.decoders.base import check_satisfied

    _alist, code, sc = ref_802_3
    d_t = jnp.asarray(
        rng.choice([-1, 1], size=(code.n, 8)).astype(np.int32)
    )
    want = np.asarray(check_satisfied(code, d_t))
    safe = jnp.maximum(sc.col_slot, 0)
    d_grid = jnp.take(d_t, safe.reshape(-1), axis=0).reshape(
        sc.kg, sc.w, 8
    )
    got = np.asarray(stratified_check_satisfied(sc, d_grid))
    np.testing.assert_array_equal(got, want)
    # and a valid codeword (all-ones BPSK of the zero codeword) passes
    ones = jnp.ones((sc.kg, sc.w, 3), jnp.int32)
    assert np.asarray(stratified_check_satisfied(sc, ones)).all()


def test_last_min_tiebreak_matches_scan(ref_802_3):
    """Duplicate minima: the order-independent CN formulation must give
    min2 to the LAST minimum in alist order, like the reference scan."""
    _alist, code, sc = ref_802_3
    # integer-valued samples make exact duplicates likely
    rng = np.random.default_rng(7)
    y = rng.integers(-3, 4, size=(32, code.n)).astype(np.float32)
    y = np.where(y == 0, 1.0, y)  # keep sgn well-exercised but nonzero
    r_gen = decode_minsum(code, y, 4)
    r_str = decode_minsum_stratified(sc, y, 4)
    np.testing.assert_array_equal(
        np.asarray(r_gen.hard), np.asarray(r_str.hard)
    )


def test_stratify_rejects_bad_partitions(ref_802_3):
    alist, _code, _sc = ref_802_3
    # two conflicting columns forced into one group
    groups = [list(range(64 * g, 64 * (g + 1))) for g in range(32)]
    # columns 0 and its first row-neighbor share a row; put them together
    c0 = 0
    partner = next(c for c in alist.mlist[alist.nlist[0][0]] if c != c0)
    if partner not in groups[0]:
        groups[0][1], groups[partner // 64][partner % 64] = (
            partner,
            groups[0][1],
        )
    with pytest.raises(ValueError):
        stratify(alist, col_groups=groups)


def test_detect_rejects_random_codes():
    """PEG random codes have sparse strata — not worth the layout; they
    stay on the generic gather path."""
    alist = peg(120, 60, 3, seed=5)
    assert detect_stratified(alist) is None


def test_pytree_roundtrip(ref_802_3):
    _alist, _code, sc = ref_802_3
    leaves, treedef = jax.tree.flatten(sc)
    sc2 = jax.tree.unflatten(treedef, leaves)
    assert isinstance(sc2, StratifiedCode)
    assert (sc2.mb, sc2.h, sc2.kg, sc2.w) == (sc.mb, sc.h, sc.kg, sc.w)


def test_detect_rejects_oversized_without_allocation():
    """detect_stratified must reject a high-cost structure BEFORE
    materializing the one-hot tensor (the real DVB-S2 H would otherwise
    attempt a ~10.9 GiB allocation; here a synthetic high-cost code
    exercises the same pre-allocation gate)."""
    import resource

    from ldpcsimulation_tpu.codes import peg
    from ldpcsimulation_tpu.codes.stratified import detect_stratified

    # a random regular code stratifies with high cost (sparse strata)
    alist = peg(512, 256, 3, seed=7)
    before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    sc = detect_stratified(alist, max_cost=0.01)  # force rejection
    after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    assert sc is None
    # peak RSS must not have grown by a one-hot-tensor-sized amount
    assert after - before < 512 * 1024  # KiB on Linux => <512 MiB growth
