"""Harness, encoder, fixtures, and log-row tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpcsimulation_tpu.codes import (
    build_code,
    gf2_rref,
    make_encoder,
    make_regular_code,
    peg,
    random_codewords,
)
from ldpcsimulation_tpu.channel import llr_from_channel, snr_to_n0
from ldpcsimulation_tpu.decoders.bp import decode_bp
from ldpcsimulation_tpu.decoders.minsum import decode_minsum
from ldpcsimulation_tpu.harness import (
    MCStats,
    StopRule,
    bp_log_row,
    default_min_word_errors,
    gdbf_log_row,
    load_codeword_file,
    minsum_log_row,
    save_codeword_file,
    simulate,
)


# ---------------------------------------------------------------- encoder


def test_gf2_rref_identity():
    h = np.eye(4, dtype=np.uint8)
    rref, piv, free = gf2_rref(h)
    assert piv.tolist() == [0, 1, 2, 3] and free.size == 0
    assert (rref == h).all()


def test_encoder_produces_codewords():
    code = make_regular_code(48, 24, 3, seed=2)
    enc = make_encoder(code)
    assert enc.k + enc.rank == 48
    key = jax.random.key(0)
    cw = np.asarray(random_codewords(enc, key, 32))
    assert cw.shape == (32, 48)
    # every codeword satisfies H (dense check)
    from ldpcsimulation_tpu.codes import code_to_alist

    h = code_to_alist(code).to_dense()
    assert ((h @ cw.T) % 2 == 0).all()
    # codewords are nontrivial
    assert cw.sum() > 0


def test_encoder_rank_deficient():
    # duplicate row -> rank deficiency must be handled
    h = np.array(
        [[1, 1, 0, 1, 0], [0, 1, 1, 0, 1], [1, 1, 0, 1, 0]], dtype=np.uint8
    )
    code = build_code(__import__(
        "ldpcsimulation_tpu.codes.alist", fromlist=["from_dense"]
    ).from_dense(h))
    enc = make_encoder(code)
    assert enc.rank == 2 and enc.k == 3
    cw = np.asarray(random_codewords(enc, jax.random.key(1), 16))
    assert ((h @ cw.T) % 2 == 0).all()


# ---------------------------------------------------------------- stop rule


def test_default_min_word_errors():
    assert default_min_word_errors(1008) == 20
    assert default_min_word_errors(10001) == 10
    assert default_min_word_errors(64800) == 5


def test_stop_rule():
    s = StopRule(min_bit_errors=200, min_word_errors=20)
    assert not s.done(199, 50, 10_000)
    assert not s.done(500, 19, 10_000)
    assert s.done(200, 20, 10_000)
    f = StopRule.fixed_frames(100)
    assert not f.done(0, 0, 99)
    assert f.done(0, 0, 100)


# ---------------------------------------------------------------- simulate


@pytest.fixture(scope="module")
def sim_code():
    return make_regular_code(96, 48, 3, seed=0)


def test_simulate_minsum_highsnr(sim_code):
    stats = simulate(
        sim_code,
        lambda y, key: decode_minsum(
            sim_code, y, num_iterations=10, early_termination=True
        ),
        snr_db=5.0,
        stop=StopRule.fixed_frames(256),
        batch_size=128,
        seed=1,
        dtype=jnp.float64,
    )
    assert stats.total_words == 256
    assert stats.total_bits == 256 * 96
    assert stats.ber < 1e-2
    assert stats.uncoded_errors > 0  # channel itself is noisy
    assert stats.fer <= 1.0
    # histogram consistent with counters
    assert stats.error_weight_hist.sum() == stats.word_errors
    weighted = (np.arange(1, 97) * stats.error_weight_hist).sum()
    assert weighted == stats.errors


def test_simulate_verbose_incremental_report(sim_code, capsys):
    """Regression: incremental_report was orphaned off MCStats during the
    round-3 itdist refactor, crashing every --verbose single-device run."""
    stats = simulate(
        sim_code,
        lambda y, key: decode_minsum(sim_code, y, num_iterations=5),
        snr_db=-2.0,
        stop=StopRule.fixed_frames(64),
        batch_size=64,
        seed=3,
        verbose=True,
    )
    out = capsys.readouterr().out
    assert "Incremental result:" in out and "Error weights:" in out
    rpt = stats.incremental_report()
    assert f"{stats.errors} bit errs in {stats.total_words}" in rpt


def test_simulate_stoprule_terminates(sim_code):
    # at very low SNR errors accumulate immediately -> stops after ~1 batch
    stats = simulate(
        sim_code,
        lambda y, key: decode_minsum(sim_code, y, num_iterations=5),
        snr_db=-2.0,
        stop=StopRule(min_bit_errors=50, min_word_errors=5),
        batch_size=64,
        seed=2,
    )
    assert stats.errors >= 50 and stats.word_errors >= 5
    assert stats.total_words <= 128


def test_simulate_bp_with_llr_preprocess(sim_code):
    n0 = float(snr_to_n0(4.0, 0.5))
    stats = simulate(
        sim_code,
        lambda llr, key: decode_bp(
            sim_code, llr, num_iterations=15, early_termination=True
        ),
        snr_db=4.0,
        stop=StopRule.fixed_frames(128),
        batch_size=64,
        preprocess=lambda y: llr_from_channel(y, n0),
        seed=3,
    )
    assert stats.total_words == 128
    assert stats.ber < 5e-2
    assert stats.avg_iterations < 15  # early termination engaged


def test_simulate_deterministic(sim_code):
    kw = dict(
        snr_db=3.0,
        stop=StopRule.fixed_frames(64),
        batch_size=32,
        seed=7,
    )
    f = lambda y, key: decode_minsum(sim_code, y, num_iterations=5)
    s1 = simulate(sim_code, f, **kw)
    s2 = simulate(sim_code, f, **kw)
    assert s1.errors == s2.errors and s1.word_errors == s2.word_errors


def test_simulate_with_codewords(sim_code):
    enc = make_encoder(sim_code)
    cw = np.asarray(random_codewords(enc, jax.random.key(5), 10))
    stats = simulate(
        sim_code,
        lambda y, key: decode_minsum(
            sim_code, y, num_iterations=10, early_termination=True
        ),
        snr_db=6.0,
        stop=StopRule.fixed_frames(40),  # cycles the 10 fixtures 4x
        batch_size=20,
        codewords=cw,
        seed=4,
    )
    assert stats.total_words == 40
    assert stats.ber < 1e-2


# ---------------------------------------------------------------- fixtures


def test_codeword_file_roundtrip(tmp_path):
    cw = np.array([[1, 0, 1, 1], [0, 0, 0, 1]], np.uint8)
    p = tmp_path / "data.enc"
    save_codeword_file(str(p), cw)
    assert p.read_text() == "1011\n0001\n"
    loaded = load_codeword_file(str(p))
    assert (loaded == cw).all()
    loaded_n = load_codeword_file(str(p), n=4)
    assert (loaded_n == cw).all()


# ---------------------------------------------------------------- log rows


def _stats():
    s = MCStats(n=1008)
    s.errors = 250
    s.total_bits = 1008 * 1000
    s.total_words = 1000
    s.word_errors = 30
    s.total_iterations = 4500
    return s


def test_bp_log_row():
    row = bp_log_row(2.0, _stats(), 100, "PEGReg504x1008.alist")
    cols = row.split("\t")
    assert cols[0] == "2"
    assert cols[1] == f"{250 / (1008 * 1000):.6g}"
    assert cols[2] == "4.5"
    assert cols[3] == "0.03"
    assert cols[4] == "100"
    assert cols[5] == "PEGReg504x1008.alist"


def test_minsum_log_row_variants():
    plain = minsum_log_row(2.0, _stats(), 8, "x.alist")
    assert len(plain.split("\t")) == 6
    norm = minsum_log_row(2.0, _stats(), 8, "x.alist", ymax=1.5, alpha=1.25)
    cols = norm.split("\t")
    assert len(cols) == 8 and cols[5] == "1.5" and cols[6] == "1.25"


def test_gdbf_log_row_full():
    row = gdbf_log_row(
        2.5,
        _stats(),
        300,
        -0.9,
        "x.alist",
        noise_scale=0.975,
        lam=0.988,
        alpha=2.3,
        smoothing_used=120,
        window_size=64,
        ymax=2.5,
    )
    cols = row.split("\t")
    # SNR BER avgIters WER totalBits totalWords T theta noiseScale lambda
    # alpha smoothingUsed ratio windowsize Ymax alist
    assert len(cols) == 16
    assert cols[7] == "-0.9" and cols[8] == "0.975"
    assert cols[11] == "120" and cols[12] == "0.12" and cols[13] == "64"


def test_iteration_cdf_biased_properties():
    """The reference-compat biased itdist estimator (NGDBFhw.cpp:419-421):
    entries past a frame's completion are never decayed, so the biased
    curve dominates the unbiased complement-CDF; idx 0 is updated by every
    frame (exactly 1); all-frames-at-cap makes the two estimators equal."""
    from ldpcsimulation_tpu.harness.montecarlo import MCStats

    s = MCStats(n=10)
    s.total_words = 64
    s.iteration_hist = np.zeros(21, np.int64)
    s.iteration_hist[[0, 3, 7, 20]] = [10, 30, 20, 4]
    biased = s.iteration_cdf_biased()
    unbiased = s.iteration_cdf()
    assert biased.shape == unbiased.shape
    assert abs(biased[0] - 1.0) < 1e-12
    assert (np.diff(biased) <= 1e-12).all()  # nonincreasing
    assert (biased >= unbiased - 1e-12).all()
    # the bias is real where frames completed early
    assert biased[10] > unbiased[10]
    # deterministic across calls (seeded shuffle)
    np.testing.assert_array_equal(biased, s.iteration_cdf_biased())

    # degenerate: every frame runs the full cap -> estimators coincide
    s2 = MCStats(n=10)
    s2.total_words = 16
    s2.iteration_hist = np.zeros(6, np.int64)
    s2.iteration_hist[5] = 16
    np.testing.assert_allclose(
        s2.iteration_cdf_biased(), s2.iteration_cdf(), atol=1e-12
    )
