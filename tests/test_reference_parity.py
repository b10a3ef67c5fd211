"""Statistical BER/FER cross-validation against the compiled C reference.

SURVEY §4's "golden-model cross-check" made executable: compile the
reference simulators from the read-only checkout, run them at an operating
point (they stop at their own error thresholds), decode the *same
parity-check matrix* with this framework at the same point, and require the
BER estimates to agree within Monte-Carlo bounds.  Skips when the reference
checkout or toolchain is unavailable.
"""

import os
import subprocess
import zlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpcsimulation_tpu.channel import llr_from_channel, snr_to_n0
from ldpcsimulation_tpu.codes import build_code, load_alist
from ldpcsimulation_tpu.decoders.bp import decode_bp
from ldpcsimulation_tpu.decoders.minsum import decode_minsum
from ldpcsimulation_tpu.harness import StopRule, simulate
from tests.conftest import REFERENCE_ROOT, require_reference

PEG_ALIST = "C_implementations/codes/PEGReg504x1008/PEGReg504x1008.alist"


@pytest.fixture(scope="session")
def ref_bins(tmp_path_factory):
    src = os.path.join(REFERENCE_ROOT, "C_implementations")
    if not os.path.isdir(src):
        pytest.skip("reference checkout not available")
    build = tmp_path_factory.mktemp("refbuild")
    objs = []
    try:
        for unit in ("nrutil", "r", "alist"):
            obj = build / f"{unit}.o"
            subprocess.run(
                ["g++", "-O2", f"-I{src}/inc", "-c", "-o", str(obj),
                 f"{src}/src/{unit}.cpp"],
                check=True, capture_output=True, timeout=120,
            )
            objs.append(str(obj))
        bins = {}
        for name, extra in [
            ("decodeMinSum", []),
            ("decodeBP", []),
        ]:
            out = build / name
            subprocess.run(
                ["g++", "-O2", f"-I{src}/inc", "-o", str(out), *objs,
                 f"{src}/src/{name}.cpp", "-lm"],
                check=True, capture_output=True, timeout=120,
            )
            bins[name] = str(out)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        pytest.skip(f"cannot build reference binaries: {e}")
    return bins


def _run_ref(binary, alist, rate, snr, iters, log, repeats=3):
    """Average several reference runs: each is time-seeded and stops at only
    ~200 bit errors, so a single run's BER carries ~15-20% relative noise
    (frame-level error clustering)."""
    import time as _time

    bers = []
    for r in range(repeats):
        subprocess.run(
            [binary, alist, str(rate), str(snr), str(iters), log],
            check=True, capture_output=True, timeout=600,
        )
        row = open(log).read().strip().splitlines()[-1].split("\t")
        bers.append(float(row[1]))
        _time.sleep(1.1)  # distinct time(0) seeds between runs
    return dict(ber=float(np.mean(bers)), fer=float(row[3]))


def _ref_median(argv, log, repeats=3, timeout=900):
    """Median BER/avg-iters over several time-seeded reference runs.

    The GDBF-family binaries seed from time(0) and stop at ~200 bit
    errors; single-run BER has fat tails from frame-error clustering
    (measured >2x spread on noisy operating points), so single-run parity
    assertions flake.  The median is outlier-resistant."""
    import time as _time

    bers, iters = [], []
    for _rep in range(repeats):
        subprocess.run(argv, check=True, capture_output=True,
                       timeout=timeout)
        row = open(log).read().strip().splitlines()[-1].split("\t")
        bers.append(float(row[1]))
        iters.append(float(row[2]))
        _time.sleep(1.1)
    return float(np.median(bers)), float(np.median(iters))


def _assert_close_ber(ours: float, ref: float, factor: float):
    assert ref > 0 and ours > 0
    ratio = ours / ref
    assert 1.0 / factor < ratio < factor, (
        f"BER mismatch: ours={ours:.4e} ref={ref:.4e} ratio={ratio:.2f}"
    )


def test_minsum_ber_matches_reference(ref_bins, tmp_path):
    alist_path = require_reference(PEG_ALIST)
    code = build_code(load_alist(alist_path))
    snr, T = 2.0, 10
    ref = _run_ref(
        ref_bins["decodeMinSum"], alist_path, 0.5, snr, T,
        str(tmp_path / "ms.log"),
    )
    stats = simulate(
        code,
        lambda y, key: decode_minsum(code, y, num_iterations=T),
        snr_db=snr,
        rate=0.5,
        stop=StopRule.fixed_frames(512),
        batch_size=256,
        seed=123,
    )
    # reference stops at >=200 bit errors (~70 frames here); both estimates
    # carry Monte-Carlo noise — bound the ratio generously but tightly
    # enough to catch algorithmic deviations (e.g. a wrong sign convention
    # or update order shifts BER by >2x at this point)
    _assert_close_ber(stats.ber, ref["ber"], factor=1.35)


def test_bp_ber_matches_reference(ref_bins, tmp_path):
    alist_path = require_reference(PEG_ALIST)
    code = build_code(load_alist(alist_path))
    snr, T = 1.6, 20  # higher-BER point keeps both sides cheap
    ref = _run_ref(
        ref_bins["decodeBP"], alist_path, 0.5, snr, T,
        str(tmp_path / "bp.log"), repeats=4,
    )
    n0 = float(snr_to_n0(snr, 0.5))
    stats = simulate(
        code,
        lambda llr, key: decode_bp(code, llr, num_iterations=T),
        snr_db=snr,
        rate=0.5,
        stop=StopRule.fixed_frames(1024),
        batch_size=256,
        preprocess=lambda y: llr_from_channel(y, n0),
        seed=321,
    )
    # the reference side still carries ~10% estimator noise after averaging
    # (error clustering at FER~0.5); 1.45 is ~3.5 sigma of the combined
    # estimate while any semantic deviation observed so far exceeds 2x
    _assert_close_ber(stats.ber, ref["ber"], factor=1.45)


@pytest.fixture(scope="session")
def ref_smngdbf(tmp_path_factory, ref_bins):
    """SM-NGDBF binary needs the GDBF flag set (Makefile:41-42)."""
    src = os.path.join(REFERENCE_ROOT, "C_implementations")
    build = tmp_path_factory.mktemp("refgdbf")
    out = build / "decodeSMNGDBF"
    objs = [
        str(p)
        for p in __import__("pathlib").Path(ref_bins["decodeMinSum"]).parent.glob("*.o")
    ]
    try:
        subprocess.run(
            ["g++", "-O2", f"-I{src}/inc", "-o", str(out),
             "-DaddNoise", "-DthresholdAdaptation", "-DweightSyndromes",
             "-DoutputSmoothing", "-DsaturateSamples",
             *objs, f"{src}/src/decodeGDBF.cpp", "-lm"],
            check=True, capture_output=True, timeout=120,
        )
    except subprocess.CalledProcessError as e:
        pytest.skip(f"cannot build decodeSMNGDBF: {e}")
    return str(out)


def test_smngdbf_ber_matches_reference(ref_smngdbf, tmp_path):
    """SM-NGDBF at a *working* deep-waterfall point (argv per
    scripts/ngdbf_example_PEGReg504x1008.sh: alist R SNR T theta log
    noiseScale lambda alpha windowsize Ymax).

    Note: the script's own alpha=2.3 diverges (BER ~0.3 on BOTH
    implementations — the value was tuned for the commented-out
    ``w = alpha*Ymax/dv`` weight semantics, decodeGDBF.cpp:548-551, and is
    stale for the shipped ``w = alpha``).  alpha=0.75 restores the
    published-class behavior (reference: BER ~1e-5 at 3.5 dB, avg ~48
    iterations) and both BER and the low-variance average-iteration
    statistic are compared there."""
    from ldpcsimulation_tpu.channel import saturate, snr_to_sigma
    from ldpcsimulation_tpu.decoders.gdbf import decode_gdbf, preset

    alist_path = require_reference(PEG_ALIST)
    code = build_code(load_alist(alist_path))
    snr, T = 3.5, 300
    theta, nscale, lam, alpha, window, ymax = -0.9, 0.975, 0.988, 0.75, 64, 2.5
    log = str(tmp_path / "sm.log")
    # GDBF row: SNR BER avgIters WER totalBits totalWords T theta ...
    ref_ber, ref_iters = _ref_median(
        [ref_smngdbf, alist_path, "0.5", str(snr), str(T), str(theta), log,
         str(nscale), str(lam), str(alpha), str(window), str(ymax)], log,
    )

    cfg = preset(
        "SMNGDBF", num_iterations=T, theta=theta, noise_scale=nscale,
        lam=lam, alpha=alpha, window_size=window,
    )
    sigma = float(snr_to_sigma(snr, 0.5))
    stats = simulate(
        code,
        lambda yq, key: decode_gdbf(code, yq, sigma, cfg, key=key),
        snr_db=snr,
        rate=0.5,
        stop=StopRule.fixed_frames(8192),
        batch_size=1024,
        preprocess=lambda y: saturate(y, ymax),
        seed=777,
    )
    # convergence dynamics must match tightly (measured 48.0 vs 48.1)
    assert 0.85 < stats.avg_iterations / ref_iters < 1.18, (
        stats.avg_iterations, ref_iters,
    )
    # BER at ~1e-5 from ~100 errors per side: generous ratio bound
    _assert_close_ber(stats.ber, ref_ber, factor=2.5)


@pytest.fixture(scope="session")
def ref_variant_bins(tmp_path_factory, ref_bins):
    """Quantized min-sum variants + DD-BMP (Makefile:58-71)."""
    src = os.path.join(REFERENCE_ROOT, "C_implementations")
    build = tmp_path_factory.mktemp("refvar")
    objs = [
        str(p)
        for p in __import__("pathlib").Path(ref_bins["decodeMinSum"]).parent.glob("*.o")
    ]
    bins = {}
    try:
        for name, src_file, flags in [
            ("decodeOffsetMinSum", "decodeMinSum.cpp",
             ["-DquantizeSamples", "-DoffsetMS"]),
            ("decodeNormalizedMinSum", "decodeMinSum.cpp",
             ["-DquantizeSamples", "-DnormalizedMS"]),
            ("decodeDDBMP", "decodeDDBMP.cpp", []),
        ]:
            out = build / name
            subprocess.run(
                ["g++", "-O2", f"-I{src}/inc", "-o", str(out), *flags,
                 *objs, f"{src}/src/{src_file}", "-lm"],
                check=True, capture_output=True, timeout=120,
            )
            bins[name] = str(out)
    except subprocess.CalledProcessError as e:
        pytest.skip(f"cannot build variant binaries: {e}")
    return bins


def test_offset_minsum_ber_matches_reference(ref_variant_bins, tmp_path):
    """argv: alist R SNR T Ymax Q delta logfile (decodeMinSum.cpp:75-131;
    Q is BITS, the quantizer gets Nq = 2^Q levels)."""
    from ldpcsimulation_tpu.channel import quantize_no_zero

    alist_path = require_reference(PEG_ALIST)
    code = build_code(load_alist(alist_path))
    snr, T, ymax, qbits, delta = 2.2, 10, 2.0, 3, 0.3
    nq = 2.0 ** qbits
    log = str(tmp_path / "oms.log")
    bers = []
    for _ in range(3):
        subprocess.run(
            [ref_variant_bins["decodeOffsetMinSum"], alist_path, "0.5",
             str(snr), str(T), str(ymax), str(qbits), str(delta), log],
            check=True, capture_output=True, timeout=600,
        )
        bers.append(float(open(log).read().strip().splitlines()[-1].split("\t")[1]))
        __import__("time").sleep(1.1)
    ref_ber = float(np.mean(bers))
    stats = simulate(
        code,
        lambda y, key: decode_minsum(code, y, T, variant="offset", delta=delta),
        snr_db=snr, rate=0.5,
        stop=StopRule.fixed_frames(768), batch_size=256,
        preprocess=lambda y: quantize_no_zero(y, ymax, nq),
        seed=555,
    )
    _assert_close_ber(stats.ber, ref_ber, factor=1.4)


def test_normalized_minsum_ber_matches_reference(ref_variant_bins, tmp_path):
    from ldpcsimulation_tpu.channel import quantize_no_zero

    alist_path = require_reference(PEG_ALIST)
    code = build_code(load_alist(alist_path))
    snr, T, ymax, qbits, alpha = 2.2, 10, 2.0, 3, 1.25
    nq = 2.0 ** qbits
    log = str(tmp_path / "nms.log")
    bers = []
    for _ in range(3):
        subprocess.run(
            [ref_variant_bins["decodeNormalizedMinSum"], alist_path, "0.5",
             str(snr), str(T), str(ymax), str(qbits), str(alpha), log],
            check=True, capture_output=True, timeout=600,
        )
        bers.append(float(open(log).read().strip().splitlines()[-1].split("\t")[1]))
        __import__("time").sleep(1.1)
    ref_ber = float(np.mean(bers))
    stats = simulate(
        code,
        lambda y, key: decode_minsum(
            code, y, T, variant="normalized", alpha=alpha
        ),
        snr_db=snr, rate=0.5,
        stop=StopRule.fixed_frames(768), batch_size=256,
        preprocess=lambda y: quantize_no_zero(y, ymax, nq),
        seed=556,
    )
    _assert_close_ber(stats.ber, ref_ber, factor=1.4)


def test_ddbmp_ber_matches_reference(ref_variant_bins, tmp_path):
    """argv: alist R SNR T Ymax Q logfile (decodeDDBMP.cpp; Nq = 2^Q)."""
    from ldpcsimulation_tpu.channel import quantize_no_zero
    from ldpcsimulation_tpu.decoders.ddbmp import decode_ddbmp

    alist_path = require_reference(PEG_ALIST)
    code = build_code(load_alist(alist_path))
    snr, T, ymax, qbits = 3.6, 50, 1.5, 3
    log = str(tmp_path / "dd.log")
    bers = []
    iters_ref = []
    for _ in range(3):
        subprocess.run(
            [ref_variant_bins["decodeDDBMP"], alist_path, "0.5", str(snr),
             str(T), str(ymax), str(qbits), log],
            check=True, capture_output=True, timeout=600,
        )
        row = open(log).read().strip().splitlines()[-1].split("\t")
        bers.append(float(row[1]))
        iters_ref.append(float(row[2]))
        __import__("time").sleep(1.1)
    ref_ber = float(np.mean(bers))
    ref_iters = float(np.mean(iters_ref))
    stats = simulate(
        code,
        lambda yq, key: decode_ddbmp(code, yq, T),
        snr_db=snr, rate=0.5,
        stop=StopRule.fixed_frames(2048), batch_size=512,
        preprocess=lambda y: quantize_no_zero(y, ymax, 2.0 ** qbits),
        seed=557,
    )
    assert 0.8 < stats.avg_iterations / ref_iters < 1.25, (
        stats.avg_iterations, ref_iters,
    )
    _assert_close_ber(stats.ber, ref_ber, factor=1.6)


@pytest.fixture(scope="session")
def ref_ngdbfhw(tmp_path_factory, ref_bins):
    """NGDBFhw is compiled manually in the reference (not in `all`)."""
    src = os.path.join(REFERENCE_ROOT, "C_implementations")
    build = tmp_path_factory.mktemp("refhw")
    out = build / "NGDBFhw"
    objs = [
        str(p)
        for p in __import__("pathlib").Path(ref_bins["decodeMinSum"]).parent.glob("*.o")
    ]
    try:
        subprocess.run(
            ["g++", "-O2", f"-I{src}/inc", "-o", str(out), *objs,
             f"{src}/src/NGDBFhw.cpp", "-lm"],
            check=True, capture_output=True, timeout=120,
        )
    except subprocess.CalledProcessError as e:
        pytest.skip(f"cannot build NGDBFhw: {e}")
    return str(out)


def test_ngdbfhw_matches_reference_802_3(ref_ngdbfhw, tmp_path):
    """Fixed-point NGDBF on the real 802.3an H at its hard-coded operating
    point (NGDBFhw.cpp:48-57), 4.0 dB.  At 20k frames the full runs give
    BER 2.155e-3 vs 2.244e-3, FER 0.0476 vs 0.0488, avg iterations 87.20
    vs 87.01; CI uses fewer frames with correspondingly looser BER bounds
    and the tight iteration statistic."""
    from ldpcsimulation_tpu.channel import snr_to_sigma
    from ldpcsimulation_tpu.decoders.ngdbf_hw import (
        NGDBFHwConfig,
        decode_ngdbf_hw,
    )

    alist_path = require_reference(
        "C_implementations/codes/802_3/802_3_H.alist"
    )
    code = build_code(load_alist(alist_path))
    snr, nf = 4.0, 4000
    log = str(tmp_path / "hw.log")
    subprocess.run(
        [ref_ngdbfhw, alist_path, str(snr), str(nf), "20260817", log],
        check=True, capture_output=True, timeout=600,
    )
    # row: SNR errs werrs BER avgIters FER ... (NGDBFhw.cpp:452-462)
    row = open(log).read().strip().splitlines()[-1].split("\t")
    ref_ber, ref_iters = float(row[3]), float(row[4])

    cfg = NGDBFHwConfig()
    sigma = float(snr_to_sigma(snr, 0.8413))
    stats = simulate(
        code,
        lambda y, key: decode_ngdbf_hw(code, y, sigma, cfg, key=key),
        snr_db=snr, rate=0.8413,
        stop=StopRule.fixed_frames(nf), batch_size=500, seed=4343,
    )
    assert 0.9 < stats.avg_iterations / ref_iters < 1.12, (
        stats.avg_iterations, ref_iters,
    )
    _assert_close_ber(stats.ber, ref_ber, factor=1.5)


def test_reference_data_enc_fixtures():
    """The reference's real codeword fixtures load, are valid codewords of
    its H, and decode end-to-end through the harness (codeword-symmetric
    decoders must perform identically to the all-zero runs)."""
    from ldpcsimulation_tpu.harness.fixtures import load_codeword_file

    alist_path = require_reference(PEG_ALIST)
    enc_path = require_reference(
        "C_implementations/codes/PEGReg504x1008/data.enc"
    )
    code = build_code(load_alist(alist_path))
    cw = load_codeword_file(enc_path, n=code.n)
    assert cw.shape == (500, 1008)  # 500 pre-encoded lines (SURVEY §2.5)
    from ldpcsimulation_tpu.codes import code_to_alist

    h = code_to_alist(code).to_dense()
    assert ((h @ cw[:50].T) % 2 == 0).all()  # real codewords of the real H

    stats = simulate(
        code,
        lambda y, key: decode_minsum(
            code, y, 10, early_termination=True
        ),
        snr_db=3.0, rate=0.5,
        stop=StopRule.fixed_frames(1000),  # cycles the 500 lines twice
        batch_size=500,
        codewords=cw,
        seed=777,
    )
    assert stats.total_words == 1000
    assert stats.ber < 5e-3  # 3 dB min-sum: near-clean
    assert stats.uncoded_errors > 0


def test_reference_nb_gf4_code_decodes():
    """FFT-QSPA on the reference's real GF(4) (9000,6000) code."""
    from ldpcsimulation_tpu.channel import snr_to_n0
    from ldpcsimulation_tpu.channel.nb import symbol_priors
    from ldpcsimulation_tpu.decoders.nb_qspa import decode_nb_qspa

    p = require_reference("SystemC/NB-LDPC/codes/GF4/q4.sp.9000.6000.4500.1")
    code = build_code(load_alist(p))
    assert code.q == 4 and code.n == 9000
    snr, rate = 3.5, 1.0 / 3.0  # (9000,6000) checks -> rate 1/3
    n0 = float(snr_to_n0(snr, rate))
    sigma = float(np.sqrt(n0 / 2))
    rng = np.random.default_rng(5)
    b = 4
    y = 1.0 + sigma * rng.normal(size=(b, 9000, 2)).astype(np.float32)
    pri = symbol_priors(jnp.asarray(y), n0, 4)
    res = decode_nb_qspa(code, pri, num_iterations=20)
    syms = np.asarray(res.symbols)
    uncoded = (np.asarray(pri).argmax(-1) != 0).mean()
    decoded = (syms != 0).mean()
    assert decoded < uncoded / 10  # decoding works on the real NB code


def test_ngdbfhw_bit_exact_vs_reference_log(ref_bins, tmp_path):
    """BIT-EXACT cross-validation: compile NGDBFhw with -DLOG_PROCESSING,
    capture its quantized channel words and noise rings for THREE
    consecutive frames, replay them through our integer-domain trace, and
    require every per-node per-iteration flip metric E and flip decision to
    match exactly — including the noise-ring pointer that PERSISTS across
    frames (``qpointer`` is declared outside the frame loop,
    ``NGDBFhw.cpp:153``, wrapped only at ``:356-358``), which is observable
    from frame 2 onward."""
    from ldpcsimulation_tpu.decoders.ngdbf_hw import NGDBFHwConfig
    from ldpcsimulation_tpu.tools.hw_trace import trace_ngdbf_hw
    import io
    import pathlib
    import re

    src = os.path.join(REFERENCE_ROOT, "C_implementations")
    alist_path = require_reference(
        "C_implementations/codes/802_3/802_3_H.alist"
    )
    objs = [
        str(p)
        for p in pathlib.Path(ref_bins["decodeMinSum"]).parent.glob("*.o")
    ]
    hw = tmp_path / "NGDBFhw_log"
    # the reference's LOG_PROCESSING code does not compile on modern g++
    # (`abs(unsigned long)` ambiguity); abs of unsigned is the identity, so
    # patch a scratch copy for the capture build.  The dumps are gated to
    # the first frame (``if (totalWords==0)``, NGDBFhw.cpp:262,305); the
    # same scratch copy ungates them so frames 2+ are captured too — a
    # logging-only change, the decoding algorithm is untouched.
    patched = tmp_path / "NGDBFhw_patched.cpp"
    patched.write_text(
        open(f"{src}/src/NGDBFhw.cpp")
        .read()
        .replace("abs(yul)", "yul")
        .replace("if (totalWords==0) {", "if (true) {")
    )
    try:
        subprocess.run(
            ["g++", "-O2", f"-I{src}/inc", "-DLOG_PROCESSING", "-o",
             str(hw), *objs, str(patched), "-lm"],
            check=True, capture_output=True, timeout=180,
        )
    except subprocess.CalledProcessError as e:
        pytest.skip(f"cannot build LOG_PROCESSING NGDBFhw: {e}")

    log = str(tmp_path / "cap")
    snr = "4"  # cout renders 4.0 as "4" in the dump filenames
    n_frames = 3
    subprocess.run(
        [str(hw), alist_path, snr, str(n_frames), "20260817", log],
        check=True, capture_output=True, timeout=300, cwd=str(tmp_path),
    )

    def unpack_lines(path):
        vals = []
        for line in open(path):
            b = line.strip()
            if not b or not set(b) <= {"0", "1"}:
                continue
            sign = -1 if b[0] == "1" else 1
            mag = int(b[1:], 2)
            vals.append(sign * (2 * mag + 1))
        return vals

    yint = unpack_lines(f"{log}_{snr}_chanin.dat")
    qint = unpack_lines(f"{log}_{snr}_noise.dat")
    assert len(yint) == n_frames * 2048 and len(qint) == n_frames * 2648

    def parse_iters(lines):
        """[(E[2048], flip[2048])] per logged iteration, split into frames
        at each 'IT 0' header."""
        frames, cur = [], []
        cur_e, cur_f = None, None
        for line in lines:
            m = re.match(r"IT (\d+)", line)
            if m:
                if cur_e is not None:
                    cur.append((cur_e, cur_f))
                if int(m.group(1)) == 0 and cur:
                    frames.append(cur)
                    cur = []
                cur_e, cur_f = [], []
            m = re.match(r"\tE: (-?\d+)", line)
            if m and cur_e is not None:
                cur_e.append(int(m.group(1)))
            m = re.match(r"\tflip: (\d)", line)
            if m and cur_f is not None:
                cur_f.append(int(m.group(1)))
        if cur_e is not None:
            cur.append((cur_e, cur_f))
        if cur:
            frames.append(cur)
        return frames

    ref_frames = parse_iters(open(f"{log}_{snr}_msgs.dat"))
    assert len(ref_frames) >= 2, "need >=2 decoded frames for persistence"
    assert len(ref_frames[0][0][0]) == 2048
    ref_flat = [it for fr in ref_frames for it in fr]

    # replay all frames through our integer trace, chaining the ring
    # pointer exactly as the reference does.  Frames are compared as one
    # flattened iteration stream (a frame satisfied at iteration 0 logs
    # nothing on either side), with the per-frame split cross-checked.
    code = build_code(load_alist(alist_path))
    cfg = NGDBFHwConfig()  # 802.3an defaults incl. theta/Smult derivation
    qp = 0
    qp_seen = []
    our_flat = []
    our_nonempty = 0
    for f in range(n_frames):
        buf = io.StringIO()
        _d, _it, _sat, qp_next = trace_ngdbf_hw(
            code, None, 0.0, cfg, None, buf,
            yint_override=yint[f * 2048:(f + 1) * 2048],
            qint_override=qint[f * 2648:(f + 1) * 2648],
            qpointer0=qp,
        )
        ours = [
            it for fr in parse_iters(buf.getvalue().splitlines())
            for it in fr
        ]
        our_flat.extend(ours)
        our_nonempty += bool(ours)
        qp_seen.append(qp)
        qp = qp_next
    assert our_nonempty == len(ref_frames), (
        f"frame split differs: ours {our_nonempty} nonempty frames "
        f"vs reference {len(ref_frames)}"
    )
    assert len(our_flat) == len(ref_flat), (
        f"iteration stream length differs: ours {len(our_flat)} "
        f"vs reference {len(ref_flat)} (qpointers {qp_seen})"
    )
    for it, ((re_, rf), (oe, of)) in enumerate(zip(ref_flat, our_flat)):
        assert oe == re_, f"E mismatch at stream position {it}"
        assert of == rf, f"flip mismatch at stream position {it}"
    # persistence must actually be observable: at least one later frame
    # started at a non-zero ring offset
    assert any(q != 0 for q in qp_seen[1:]), qp_seen


def test_minsum_matches_reference_on_mackay_4000(ref_bins, tmp_path):
    """Second real code: MacKay 4000.2000.4.244 (4,8)-regular, min-sum T=15
    per scripts/minsum_example_4000.2000.4.244.sh's operating range."""
    alist_path = require_reference(
        "C_implementations/codes/4000.2000.4.244/4000.2000.4.244.alist"
    )
    code = build_code(load_alist(alist_path))
    assert code.n == 4000 and code.m == 2000
    assert code.dv_max == 4 and code.dc_max == 8
    snr, T = 2.6, 15
    ref = _run_ref(
        ref_bins["decodeMinSum"], alist_path, 0.5, snr, T,
        str(tmp_path / "mk.log"),
    )
    stats = simulate(
        code,
        lambda y, key: decode_minsum(code, y, num_iterations=T),
        snr_db=snr, rate=0.5,
        stop=StopRule.fixed_frames(512), batch_size=256, seed=888,
    )
    _assert_close_ber(stats.ber, ref["ber"], factor=1.45)


# ---------------------------------------------------------------------------
# Full GDBF-family C-parity matrix (VERDICT r1 #3): every remaining
# Makefile binary (Makefile:24-56) cross-run at a verified working
# operating point.  Each case: (binary, -D flags, extra argv after the log
# filename, preset kwargs beyond theta/T, preprocess spec, expected-ish
# reference BER magnitude).  argv order per decodeGDBF.cpp:90-165:
#   alist R SNR T theta log [noiseScale] [NQ] [lambda] [alpha]
#   [windowsize] [Ymax]
GDBF_FAMILY_CASES = [
    # sequential: one flip per iteration, strict-<-scan argmin
    ("SGDBF", ["-Dsequentialmode"], 4.0, 600, -0.9, [], {}, None),
    # mode switching (Tswitch=0): parallel -> sequential on non-improvement
    ("MGDBF", ["-Dmodeswitching"], 4.0, 100, -0.9, [], {}, None),
    # output smoothing alone needs a shallower theta to converge
    ("SMGDBF", ["-DoutputSmoothing"], 5.0, 100, -0.6, ["64"],
     dict(window_size=64), None),
    ("ATGDBF", ["-DthresholdAdaptation"], 4.0, 100, -0.9, ["0.99"],
     dict(lam=0.99), None),
    ("SATGDBF", ["-DthresholdAdaptation", "-DoutputSmoothing"],
     4.0, 100, -0.9, ["0.99", "64"], dict(lam=0.99, window_size=64), None),
    # MNGDBF = SM-NGDBF without smoothing (alpha=0.75: the working regime,
    # see test_smngdbf_ber_matches_reference for the stale-alpha story)
    ("MNGDBF",
     ["-DaddNoise", "-DthresholdAdaptation", "-DweightSyndromes",
      "-DsaturateSamples"],
     3.0, 200, -0.9, ["0.975", "0.988", "0.75", "2.5"],
     dict(noise_scale=0.975, lam=0.988, alpha=0.75), ("sat", 2.5)),
    # stochastic: quantized samples (NQ=3 bits) + hardware flip levels
    ("StochasticNGDBF",
     ["-DquantizeSamples", "-DquantizeProbabilities", "-DweightSyndromes",
      "-DsaturateSamples"],
     3.5, 300, -0.9, ["0.975", "3", "0.75", "2.5"],
     dict(noise_scale=0.975, alpha=0.75), ("satq", 2.5, 3)),
    # uniform perturbation noise (decodeGDBF.cpp:318-333, the -DUNIFORM
    # builds of ngdbf_example_uniform_PEGReg504x1008.sh): same argv as
    # MNGDBF — uniformNoise is a sub-flag of addNoise adding no argv
    # (decodeGDBF.cpp:95-113).  VERDICT r2 missing #3: the last GDBF
    # variant validated by oracle alone.
    ("UniformMNGDBF",
     ["-DaddNoise", "-DuniformNoise", "-DthresholdAdaptation",
      "-DweightSyndromes", "-DsaturateSamples"],
     3.0, 200, -0.9, ["0.975", "0.988", "0.75", "2.5"],
     dict(preset_name="MNGDBF", uniform_noise=True, noise_scale=0.975,
          lam=0.988, alpha=0.75), ("sat", 2.5)),
]


@pytest.fixture(scope="session")
def ref_gdbf_family(tmp_path_factory, ref_bins):
    src = os.path.join(REFERENCE_ROOT, "C_implementations")
    build = tmp_path_factory.mktemp("refgdbffam")
    objs = [
        str(p)
        for p in __import__("pathlib").Path(
            ref_bins["decodeMinSum"]
        ).parent.glob("*.o")
    ]
    bins = {}
    try:
        for name, flags, *_ in GDBF_FAMILY_CASES:
            out = build / f"decode{name}"
            subprocess.run(
                ["g++", "-O2", f"-I{src}/inc", "-o", str(out), *flags,
                 *objs, f"{src}/src/decodeGDBF.cpp", "-lm"],
                check=True, capture_output=True, timeout=180,
            )
            bins[name] = str(out)
        out = build / "decodeRSMNGDBF"
        subprocess.run(
            ["g++", "-O2", f"-I{src}/inc", "-o", str(out),
             "-Dredecode", "-DaddNoise", "-DthresholdAdaptation",
             "-DweightSyndromes", "-DoutputSmoothing", "-DsaturateSamples",
             *objs, f"{src}/src/RNGDBF.cpp", "-lm"],
            check=True, capture_output=True, timeout=180,
        )
        bins["RSMNGDBF"] = str(out)
    except subprocess.CalledProcessError as e:
        pytest.skip(f"cannot build GDBF-family binaries: {e}")
    return bins


@pytest.mark.parametrize(
    "case", GDBF_FAMILY_CASES, ids=[c[0] for c in GDBF_FAMILY_CASES]
)
def test_gdbf_family_matches_reference(case, ref_gdbf_family, tmp_path):
    """BER + average-iterations parity for one GDBF-family binary."""
    from ldpcsimulation_tpu.channel import (
        quantize_round,
        saturate,
        snr_to_sigma,
    )
    from ldpcsimulation_tpu.decoders.gdbf import decode_gdbf, preset

    name, _flags, snr, T, theta, extra_argv, kw, pre_spec = case
    alist_path = require_reference(PEG_ALIST)
    code = build_code(load_alist(alist_path))
    log = str(tmp_path / f"{name}.log")
    # noisy operating points (MNGDBF measured 1.1e-3..2.4e-3 across time
    # seeds): median of 5 runs, see _ref_median
    ref_ber, ref_iters = _ref_median(
        [ref_gdbf_family[name], alist_path, "0.5", str(snr), str(T),
         str(theta), log, *extra_argv], log, repeats=5, timeout=600,
    )

    kw = dict(kw)
    preset_name = kw.pop("preset_name", name)
    cfg = preset(preset_name, num_iterations=T, theta=theta, **kw)
    sigma = float(snr_to_sigma(snr, 0.5))
    if pre_spec is None:
        pre = None
    elif pre_spec[0] == "sat":
        pre = lambda y: saturate(y, pre_spec[1])
    else:  # satq: saturate then round-quantize (decodeGDBF.cpp:250-267)
        pre = lambda y: quantize_round(
            saturate(y, pre_spec[1]), pre_spec[1], pre_spec[2]
        )
    # 4096 frames everywhere: at 1024 the our-side avg-iterations
    # estimate wobbled enough for a measured hair's-width bound miss
    # (SMGDBF ratio 0.8197 vs the 0.82 bound, 1-in-10 suite runs)
    frames = 4096
    stats = simulate(
        code,
        lambda yq, key: decode_gdbf(code, yq, sigma, cfg, key=key),
        snr_db=snr,
        rate=0.5,
        stop=StopRule.fixed_frames(frames),
        batch_size=512,
        preprocess=pre,
        seed=zlib.crc32(name.encode()) % 100000,
    )
    # average iterations is the low-variance statistic: tight bound
    assert 0.82 < stats.avg_iterations / ref_iters < 1.22, (
        name, stats.avg_iterations, ref_iters,
    )
    # UniformMNGDBF's 3.0 dB point is intrinsically twitchy: the REFERENCE
    # binary's own time-seeded BER spans 8.7e-4..4.1e-3 (4.7x) across
    # runs, so its median-of-5 still wobbles ~±50%; ours runs 4096 frames
    # (tight) and leans on the avg-iterations bound above (measured ~91 vs
    # reference ~90) for the discriminative signal.
    factor = 2.6 if name == "UniformMNGDBF" else 1.8
    _assert_close_ber(stats.ber, ref_ber, factor=factor)


def test_rsmngdbf_matches_reference(ref_gdbf_family, tmp_path):
    """Redecode (RNGDBF.cpp): phase-accumulated iterations + phase count.

    argv: alist R SNR T theta log noiseScale lambda alpha windowsize Ymax
    maxphase."""
    from ldpcsimulation_tpu.channel import saturate, snr_to_sigma
    from ldpcsimulation_tpu.decoders.gdbf import decode_gdbf, preset

    alist_path = require_reference(PEG_ALIST)
    code = build_code(load_alist(alist_path))
    snr, T, theta = 3.25, 100, -0.9
    log = str(tmp_path / "rs.log")
    # GDBF row with redecode: ... alpha, smoothingUsed, smoothingUsed/words,
    # windowsize, Ymax, maxphase, alist (decodeGDBF.cpp:430-450 family; the
    # per-PHASE smoothingUsed makes the ratio exceed 1).  Median of 3
    # time-seeded runs per _ref_median's rationale.
    import time as _time

    _b, _i, _s = [], [], []
    for _rep in range(3):
        subprocess.run(
            [ref_gdbf_family["RSMNGDBF"], alist_path, "0.5", str(snr),
             str(T), str(theta), log, "0.975", "0.988", "0.75", "64",
             "2.5", "4"],
            check=True, capture_output=True, timeout=600,
        )
        row = open(log).read().strip().splitlines()[-1].split("\t")
        _b.append(float(row[1]))
        _i.append(float(row[2]))
        _s.append(float(row[12]))
        _time.sleep(1.1)
    ref_ber, ref_iters, ref_smooth_ratio = (
        float(np.median(_b)), float(np.median(_i)), float(np.median(_s))
    )

    cfg = preset(
        "RSMNGDBF", num_iterations=T, theta=theta, noise_scale=0.975,
        lam=0.988, alpha=0.75, window_size=64, max_phases=4,
    )
    sigma = float(snr_to_sigma(snr, 0.5))
    stats = simulate(
        code,
        lambda yq, key: decode_gdbf(code, yq, sigma, cfg, key=key),
        snr_db=snr,
        rate=0.5,
        # 6144 frames: at FER ~2-3% the 2048-frame estimate's own MC
        # spread (fixed by seed) occasionally pushed the ratio past the
        # 1.8x bound against the reference's ~200-error stop runs
        stop=StopRule.fixed_frames(6144),
        batch_size=512,
        preprocess=lambda y: saturate(y, 2.5),
        seed=4242,
    )
    assert 0.82 < stats.avg_iterations / ref_iters < 1.22, (
        stats.avg_iterations, ref_iters,
    )
    ours_smooth_ratio = stats.extra["smoothing_used"] / stats.total_words
    assert 0.82 < ours_smooth_ratio / ref_smooth_ratio < 1.22, (
        ours_smooth_ratio, ref_smooth_ratio,
    )
    _assert_close_ber(stats.ber, ref_ber, factor=1.8)


@pytest.fixture(scope="session")
def ref_systemc_bin(tmp_path_factory):
    """Attempt to build the SystemC ldpcsim.x (SystemC/NGDBF/Makefile).

    The event-driven model needs the Accellera SystemC library; this image
    does not ship it, so the build attempt documents that (VERDICT r1
    missing #5) and skips.  If a systemc install appears (SYSTEMC_HOME or
    a discoverable libsystemc), the binary is built and the statistical
    test below runs against it.
    """
    import shutil

    src = os.path.join(REFERENCE_ROOT, "SystemC/NGDBF")
    if not os.path.isdir(src):
        pytest.skip("reference SystemC tree not available")
    sc_home = os.environ.get("SYSTEMC_HOME")
    candidates = [sc_home] if sc_home else []
    candidates += ["/usr/local/systemc", "/opt/systemc"]
    sc = next(
        (
            c
            for c in candidates
            if c and os.path.exists(os.path.join(c, "include/systemc.h"))
        ),
        None,
    )
    if sc is None:
        pytest.skip(
            "SystemC library not installed (no SYSTEMC_HOME, no "
            "systemc.h found) — ldpcsim.x cannot be built in this image"
        )
    build = tmp_path_factory.mktemp("refsystemc")
    out = build / "ldpcsim.x"
    srcs = [str(p) for p in __import__("pathlib").Path(src, "src").glob("*.cpp")]
    try:
        subprocess.run(
            ["g++", "-O2", f"-I{src}/inc", f"-I{sc}/include",
             f"-L{sc}/lib-linux64", "-o", str(out), *srcs,
             "-lsystemc", "-lm"],
            check=True, capture_output=True, timeout=600,
        )
    except subprocess.CalledProcessError as e:
        pytest.skip(f"SystemC build failed: {e.stderr[:500]}")
    return str(out)


def test_systemc_ngdbf_matches_reference(ref_systemc_bin, tmp_path):
    """Statistical parity vs ldpcsim.x at the example.sh operating point
    (only runs when a SystemC toolchain is available — see fixture)."""
    import jax

    from ldpcsimulation_tpu.channel.awgn import snr_to_sigma
    from ldpcsimulation_tpu.decoders.ngdbf_systemc import (
        SystemCNGDBFConfig,
        decode_ngdbf_systemc,
    )
    from ldpcsimulation_tpu.harness import simulate

    alist = require_reference(
        "SystemC/NGDBF/codes/PegReg/PEGReg504x1008.alist"
    )
    code = build_code(load_alist(alist))
    # example.sh: ldpcsim.x alist SNR T theta lambda precision Ymax alpha
    snr, T = 3.5, 300
    log = str(tmp_path / "sc.log")
    subprocess.run(
        [ref_systemc_bin, alist, str(snr), str(T), "-0.55", "0.975", "4",
         "3.0", "0.95", log],
        check=True, capture_output=True, timeout=900,
    )
    row = open(log).read().strip().splitlines()[-1].split("\t")
    ref_ber = float(row[1])
    cfg = SystemCNGDBFConfig(
        num_iterations=T, theta=-0.55, lam=0.975, nq_levels=16, ymax=3.0,
        alpha=0.95,
    )
    sigma = float(snr_to_sigma(snr, 0.5))
    stats = simulate(
        code,
        lambda y, key: decode_ngdbf_systemc(code, y, sigma, cfg, key=key),
        snr_db=snr, rate=0.5, stop=StopRule.fixed_frames(2048),
        batch_size=512, awgn_form="additive", seed=99,
    )
    _assert_close_ber(stats.ber, ref_ber, factor=2.0)


def test_smngdbf_4376_highrate_matches_reference(ref_smngdbf, tmp_path):
    """SM-NGDBF on the reference's REAL 4376.282 high-rate code (the last
    untouched BASELINE row).

    The script's own operating point (ngdbf_example_4376.282.4.9598.sh:
    alpha=0.75 at 4.0-5.5 dB) DIVERGES on the reference binary itself
    (FER=1, avg iters = T at every SNR tried) — the same stale-alpha rot
    as the PEG script: 0.75 was tuned for the old w=alpha*Ymax/dv
    semantics, and 0.75*2.5/4 = 0.47 restores working behavior
    (reference: BER ~1.2e-3 at 5.5 dB, avg ~110 iters; 8.1e-6 at 6 dB).
    Parity is asserted at the working 5.5 dB point."""
    from ldpcsimulation_tpu.channel import saturate, snr_to_sigma
    from ldpcsimulation_tpu.decoders.gdbf import decode_gdbf, preset

    alist_path = require_reference(
        "C_implementations/codes/4376.282.4.9598/4376.282.4.9598.alist"
    )
    code = build_code(load_alist(alist_path))
    assert code.n == 4376 and code.m == 282
    snr, T, theta, alpha = 5.5, 300, -0.7, 0.47
    log = str(tmp_path / "hr.log")
    ref_ber, ref_iters = _ref_median(
        [ref_smngdbf, alist_path, "0.9356", str(snr), str(T), str(theta),
         log, "0.65", "0.993", str(alpha), "64", "2.5"], log,
    )

    cfg = preset(
        "SMNGDBF", num_iterations=T, theta=theta, noise_scale=0.65,
        lam=0.993, alpha=alpha, window_size=64,
    )
    sigma = float(snr_to_sigma(snr, 0.9356))
    stats = simulate(
        code,
        lambda yq, key: decode_gdbf(code, yq, sigma, cfg, key=key),
        snr_db=snr,
        rate=0.9356,
        stop=StopRule.fixed_frames(512),
        batch_size=256,
        preprocess=lambda y: saturate(y, 2.5),
        seed=55,
    )
    assert 0.82 < stats.avg_iterations / ref_iters < 1.22, (
        stats.avg_iterations, ref_iters,
    )
    _assert_close_ber(stats.ber, ref_ber, factor=1.8)


# ---------------------------------------------------------------------------
# SystemC NGDBF: build the reference's event-driven simulator (ldpcsim.x)
# against the original minimal kernel in native/scsim and cross-run it.
# ---------------------------------------------------------------------------

SC_ROOT = "SystemC/NGDBF"
SC_ALIST = f"{SC_ROOT}/codes/PegReg/PEGReg504x1008.alist"


@pytest.fixture(scope="session")
def ref_ldpcsim(tmp_path_factory):
    """Compile SystemC/NGDBF/src/*.cpp with the scsim shim kernel.

    The reference needs a real SystemC installation (Makefile:54 hardcodes
    /home/reiss/systemc); native/scsim/systemc.h implements the subset of
    IEEE 1666 the design uses, so the *actual reference program* runs here.
    The vendored sc_vector.h is skipped via its own include guard."""
    require_reference(f"{SC_ROOT}/src")
    native = os.path.join(os.path.dirname(__file__), "..", "native")
    out = tmp_path_factory.mktemp("scsim") / "ldpcsim.x"
    # single source of truth for the build recipe: the Makefile target
    try:
        subprocess.run(
            ["make", "-C", native, str(out), f"LDPCSIM_OUT={out}",
             f"REFERENCE={REFERENCE_ROOT}"],
            check=True, capture_output=True, timeout=300,
        )
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        pytest.skip(f"cannot build ldpcsim.x against scsim shim: {e}")
    return str(out)


def _run_ldpcsim(binary, alist_path, tmp_path, snr, tag):
    """One deterministic ldpcsim.x run (all-zero stimulus, default seed).

    The reference's example.sh stimulus (codes/PegReg/data.enc) is absent
    from the tree, and running with a missing file makes the testbench
    index empty getline() strings (LDPC_testbench.h:105,136 — UB, observed
    nondeterministic).  A generated all-zero-codeword stimulus matches our
    harness's all-zero convention and makes ldpcsim.x bit-deterministic
    (seeded by srandom's default).  Returns (ber, fer, avg_iters)."""
    stim = tmp_path / "zeros.enc"
    if not stim.exists():
        stim.write_text(("0" * 1008 + "\n") * 4000)
    log = str(tmp_path / f"sc_{tag}")
    subprocess.run(
        [binary, alist_path, str(stim), "0.5", str(snr), "300", "400000",
         "0.975", "-0.5", "4", "3", "0.95", log],
        check=True, capture_output=True, timeout=600, text=True,
    )
    row = open(log + ".dat").read().strip().splitlines()[-1].split("\t")
    return float(row[0]), float(row[1]), float(row[2])


def _ours_ldpcsim(code, snr, smoothed, frames):
    from ldpcsimulation_tpu.channel import snr_to_sigma
    from ldpcsimulation_tpu.decoders.ngdbf_systemc import (
        SystemCNGDBFConfig,
        decode_ngdbf_systemc,
    )

    cfg = SystemCNGDBFConfig(
        num_iterations=300, theta=-0.5, lam=0.975, alpha=0.95, ymax=3.0,
        nq_levels=16, smoothed=smoothed,
    )
    sigma = float(snr_to_sigma(snr, 0.5))
    return simulate(
        code,
        lambda y, key: decode_ngdbf_systemc(code, y, sigma, cfg, key=key),
        snr_db=snr, rate=0.5, stop=StopRule.fixed_frames(frames),
        batch_size=512, awgn_form="additive", seed=7,
    )


def test_systemc_ldpcsim_matches_reference(ref_ldpcsim, tmp_path):
    """Statistical parity of decode_ngdbf_systemc vs the COMPILED SystemC
    reference at TWO operating points of the example.sh parameter set
    (theta=-0.5, lambda=0.975, 4-bit, Ymax=3, alpha=0.95; example.sh's own
    1.5 dB does not converge, so the converging 2.5/3.0 dB points are
    used).  The shipped decoder.h hard-defines SMOOTHED true
    (decoder.h:25), so this is the window-32 smoothing path on both sides.
    Measured ratios: BER 1.13 @2.5 dB, 0.98 @3.0 dB — bands at 1.3."""
    alist_path = require_reference(SC_ALIST)
    code = build_code(load_alist(alist_path))
    assert code.n == 1008 and code.m == 504  # transposed-alist autodetect

    for snr, frames in ((2.5, 2048), (3.0, 4096)):
        ref_ber, ref_fer, ref_iters = _run_ldpcsim(
            ref_ldpcsim, alist_path, tmp_path, snr, f"sm{snr:g}"
        )
        assert ref_fer > 0.02  # the stop rule actually engaged
        stats = _ours_ldpcsim(code, snr, smoothed=True, frames=frames)
        _assert_close_ber(stats.ber, ref_ber, factor=1.3)
        assert 0.75 < stats.fer / ref_fer < 1.35, (snr, stats.fer, ref_fer)
        # ldpcsim.x counts handshake clock cycles; ours counts
        # symbol-update rounds (module docstring) — a few-cycle offset on
        # ~70-200 iterations.
        assert 0.80 < stats.avg_iterations / ref_iters < 1.15, (
            snr, stats.avg_iterations, ref_iters,
        )


@pytest.fixture(scope="session")
def ref_ldpcsim_unsmoothed(tmp_path_factory):
    """ldpcsim.x with the smoothing OFF.

    decoder.h hard-defines ``SMOOTHED true`` (decoder.h:25) with no build
    hook, so — like the NGDBFhw -DLOG_PROCESSING abs() fix above — the
    single define is toggled in a tmp copy of decoder.h that shadows the
    reference's via include order; every other line is the reference's
    own."""
    require_reference(f"{SC_ROOT}/src")
    native = os.path.join(os.path.dirname(__file__), "..", "native")
    build = tmp_path_factory.mktemp("scsim_unsm")
    inc = build / "inc"
    inc.mkdir()
    hdr = open(
        os.path.join(REFERENCE_ROOT, SC_ROOT, "inc", "decoder.h")
    ).read()
    assert "#define SMOOTHED true" in hdr
    (inc / "decoder.h").write_text(
        hdr.replace("#define SMOOTHED true", "#define SMOOTHED false")
    )
    out = build / "ldpcsim_unsm.x"
    import glob as _glob

    srcs = sorted(_glob.glob(
        os.path.join(REFERENCE_ROOT, SC_ROOT, "src", "*.cpp")
    ))
    try:
        subprocess.run(
            ["g++", "-O2", "-w", f"-I{native}/scsim", f"-I{inc}",
             f"-I{os.path.join(REFERENCE_ROOT, SC_ROOT, 'inc')}",
             "-DSC_VECTOR_H_INCLUDED_", *srcs,
             f"{native}/scsim/scsim_main.cpp", "-o", str(out), "-lm"],
            check=True, capture_output=True, timeout=300,
        )
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        pytest.skip(f"cannot build unsmoothed ldpcsim.x: {e}")
    return str(out)


def test_systemc_ldpcsim_unsmoothed_matches_reference(
    ref_ldpcsim_unsmoothed, tmp_path
):
    """The termination path WITHOUT output smoothing, cross-run against
    the reference compiled with SMOOTHED=false.  Smoothing is strongly
    discriminative at 2.5 dB — the reference's own BER doubles without it
    (0.103 vs 0.047) — so this pins decoder.h:221-246's window-32 logic
    from both sides.  Measured ratio 1.06; band 1.3."""
    alist_path = require_reference(SC_ALIST)
    code = build_code(load_alist(alist_path))
    ref_ber, ref_fer, ref_iters = _run_ldpcsim(
        ref_ldpcsim_unsmoothed, alist_path, tmp_path, 2.5, "unsm"
    )
    assert ref_ber > 0.08  # the smoothing really is OFF in this build
    stats = _ours_ldpcsim(code, 2.5, smoothed=False, frames=2048)
    _assert_close_ber(stats.ber, ref_ber, factor=1.3)
    assert 0.75 < stats.fer / ref_fer < 1.35, (stats.fer, ref_fer)
    assert 0.80 < stats.avg_iterations / ref_iters < 1.15, (
        stats.avg_iterations, ref_iters,
    )


def test_smngdbf_dvbs2_matches_reference(ref_smngdbf, tmp_path):
    """SM-NGDBF on the REAL DVB-S2 rate-1/2 (64800, 32400) H.

    The example script's alpha=2.5 diverges on the reference binary itself
    (measured BER 0.115 at 3.4 dB — the stale-alpha artifact of the old
    w=alpha*Ymax/dv semantics, as for PEG/4376); alpha=1.2 works on both
    sides (full waterfall cross-run at 3.4 dB/T=700 in docs/CONFIGS.md:
    BER ratio 0.87, iters ratio 0.98).  For the suite, compare the
    partial-decode trajectory at 3.2 dB/T=150 (FER=1 regime): the BER
    after 150 iterations is a sensitive functional of the full update
    semantics (weights, adaptation, smoothing, saturation) and both
    estimators are low-variance there (every frame contributes ~1.3k bit
    errors).  Our side decodes the standards.py generalized-QC structure
    (z=360 rolls) — the same graph up to row/column relabeling."""
    from ldpcsimulation_tpu.channel import saturate, snr_to_sigma
    from ldpcsimulation_tpu.codes.standards import dvbs2_rate12_qc
    from ldpcsimulation_tpu.decoders.gdbf import decode_gdbf, preset

    alist_path = require_reference(
        "C_implementations/codes/dvbs2_1_2/dvbs2_1_2.alist"
    )
    snr, T, theta, alpha = 3.2, 150, -1.1, 1.2
    import time as _time

    bers = []
    log = str(tmp_path / "dvb.log")
    for _rep in range(3):
        subprocess.run(
            [ref_smngdbf, alist_path, "0.5", str(snr), str(T), str(theta),
             log, "0.775", "0.987", str(alpha), "64", "2.5"],
            check=True, capture_output=True, timeout=600,
        )
        row = open(log).read().strip().splitlines()[-1].split("\t")
        bers.append(float(row[1]))
        assert float(row[3]) == 1.0  # FER=1 partial-decode regime
        _time.sleep(1.1)
    ref_ber = float(np.median(bers))

    det = dvbs2_rate12_qc()
    qc = det.qc
    code = build_code(qc.to_alist())
    cfg = preset(
        "SMNGDBF", num_iterations=T, theta=theta, noise_scale=0.775,
        lam=0.987, alpha=alpha, window_size=64,
    )
    sigma = float(snr_to_sigma(snr, 0.5))
    stats = simulate(
        code,
        lambda y, key: decode_gdbf(code, y, sigma, cfg, key=key, qc=qc),
        snr_db=snr, rate=0.5, stop=StopRule.fixed_frames(16),
        batch_size=16, preprocess=lambda y: saturate(y, 2.5), seed=17,
    )
    assert stats.fer == 1.0
    _assert_close_ber(stats.ber, ref_ber, factor=1.25)


def test_reference_nb_gf8_code_decodes():
    """FFT-QSPA on the reference's real GF(8) (6000,4000) code
    (SystemC/NB-LDPC/codes/GF8/q8.sp.6000.4000.3000.1) — the third NB
    field the reference ships; the Walsh-Hadamard CN update runs over
    GF(2^3) bit-plane butterflies."""
    from ldpcsimulation_tpu.channel import snr_to_n0
    from ldpcsimulation_tpu.channel.nb import symbol_priors
    from ldpcsimulation_tpu.decoders.nb_qspa import decode_nb_qspa

    p = require_reference("SystemC/NB-LDPC/codes/GF8/q8.sp.6000.4000.3000.1")
    code = build_code(load_alist(p))
    assert code.q == 8 and code.n == 6000 and code.m == 4000
    snr, rate = 4.0, 1.0 / 3.0  # (6000,4000) checks -> rate 1/3
    n0 = float(snr_to_n0(snr, rate))
    sigma = float(np.sqrt(n0 / 2))
    rng = np.random.default_rng(6)
    b = 2
    y = 1.0 + sigma * rng.normal(size=(b, 6000, 3)).astype(np.float32)
    pri = symbol_priors(jnp.asarray(y), n0, 8)
    res = decode_nb_qspa(code, pri, num_iterations=15)
    syms = np.asarray(res.symbols)
    uncoded = (np.asarray(pri).argmax(-1) != 0).mean()
    decoded = (syms != 0).mean()
    assert decoded < uncoded / 10


def test_itdist_biased_recurrence_bitexact_vs_c():
    """BIT-EXACT parity of the biased itdist estimator against a compiled
    replica of the reference's own update loop (NGDBFhw.cpp:419-421,
    copied semantics: double arithmetic, idx <= L update range, %.17g
    round-trip)."""
    import tempfile

    from ldpcsimulation_tpu.harness.montecarlo import itdist_biased_sequence

    rng = np.random.default_rng(3)
    ls = rng.integers(0, 40, size=200).tolist()
    length = 41
    c_src = """
#include <stdio.h>
int main() {
  double itdist[%LEN%] = {0};
  int ls[] = {%LS%};
  int nf = sizeof(ls)/sizeof(ls[0]);
  long totalWords = 0;
  for (int f = 0; f < nf; f++) {
    totalWords++;
    for (int idx = 0; idx <= ls[f]; idx++)
      itdist[idx] = (double)((totalWords-1.0)/totalWords)*itdist[idx]
                    + (double)(1.0/totalWords);
  }
  for (int idx = 0; idx < %LEN%; idx++) printf("%.17g\\n", itdist[idx]);
  return 0;
}
""".replace("%LEN%", str(length)).replace(
        "%LS%", ",".join(str(x) for x in ls)
    )
    with tempfile.TemporaryDirectory() as td:
        cp = os.path.join(td, "it.c")
        with open(cp, "w") as f:
            f.write(c_src)
        exe = os.path.join(td, "it")
        subprocess.run(["g++", "-O2", "-o", exe, cp],
                       check=True, capture_output=True, timeout=60)
        out = subprocess.run([exe], check=True, capture_output=True,
                             timeout=60).stdout.decode()
    c_vals = np.array([float(x) for x in out.strip().splitlines()])
    ours = itdist_biased_sequence(ls, length)
    np.testing.assert_array_equal(ours, c_vals)


def test_itdist_biased_matches_reference_file(ref_ngdbfhw, tmp_path):
    """--itdist-biased cross-run vs the reference NGDBFhw's own
    *_itdist.dat at the 802.3an operating point.

    The reference estimator (NGDBFhw.cpp:419-421) never decays an entry
    past a frame's completion, so each entry equals 1 - prod(1 - 1/w)
    over the frames that updated it — a statistic dominated by whether
    EARLY frames updated the entry, with run-to-run variance far above
    the underlying CDF's.  Exact curve matching across independent runs
    is therefore impossible by construction (the bit-exact recurrence
    parity is the test above); this test checks what IS stable: the file
    format is identical, both curves are exactly 1 over the head region,
    and both dominate the unbiased complement-CDF measured on our run —
    the bias signature that motivates the compat flag."""
    import re

    from ldpcsimulation_tpu.channel import snr_to_sigma
    from ldpcsimulation_tpu.decoders.ngdbf_hw import (
        NGDBFHwConfig,
        decode_ngdbf_hw,
    )

    alist_path = require_reference(
        "C_implementations/codes/802_3/802_3_H.alist"
    )
    code = build_code(load_alist(alist_path))
    snr, nf = 4.25, 3000
    log = str(tmp_path / "hw.log")
    subprocess.run(
        [ref_ngdbfhw, alist_path, str(snr), str(nf), "20260819", log],
        check=True, capture_output=True, timeout=600,
    )
    ref_lines = open(f"{log}_{snr:g}_itdist.dat").read().splitlines()
    # file-format parity: the reference's own artifact satisfies the exact
    # format our writer produces (idx<TAB>%.6g-formatted double)
    for idx, line in enumerate(ref_lines):
        m = re.fullmatch(r"(\d+)\t(-?[\d.]+(?:e[+-]?\d+)?)", line)
        assert m and int(m.group(1)) == idx, line
        assert m.group(2) == f"{float(m.group(2)):.6g}", line
    ref_curve = np.array([float(l.split("\t")[1]) for l in ref_lines])

    cfg = NGDBFHwConfig()
    sigma = float(snr_to_sigma(snr, 0.8413))
    stats = simulate(
        code,
        lambda y, key: decode_ngdbf_hw(code, y, sigma, cfg, key=key),
        snr_db=snr, rate=0.8413,
        stop=StopRule.fixed_frames(nf), batch_size=500, seed=11,
    )
    biased = stats.iteration_cdf_biased()
    unbiased = stats.iteration_cdf()
    L = min(len(biased), len(ref_curve))
    assert L > 100
    # head region: every frame of BOTH runs used >= a few iterations, and
    # the estimator is exactly 1 wherever the first frame updated it
    assert ref_curve[0] == 1.0 and biased[0] == 1.0
    # the bias signature, on both artifacts, against the measured
    # unbiased complement-CDF: where the curves are statistically
    # meaningful, the biased estimators sit ON or ABOVE it
    sig = (ref_curve[:L] >= 20.0 / nf) & (unbiased[:L] > 0)
    assert (ref_curve[:L][sig] >= unbiased[:L][sig] - 1e-12).all()
    assert (biased[:L][sig] >= unbiased[:L][sig] - 1e-12).all()
    # and the inflation is real on both (not equal curves)
    assert ref_curve[:L][sig].sum() > 1.5 * unbiased[:L][sig].sum()
    assert biased[:L][sig].sum() > 1.5 * unbiased[:L][sig].sum()
