"""Experiment sweep runner — the CLI replacing the reference's bash grids.

The reference's entire experiment-orchestration layer is 17 bash scripts of
nested loops launching ``nohup ./bin/X … &`` per operating point
(``C_implementations/scripts/*.sh``, e.g.
``mngdbf_example_PEGReg504x1008.sh:43-59`` — a 5-deep sweep).  This runner
collapses that into one command: a cartesian grid over SNR and algorithm
parameters, each point simulated with the batched Monte-Carlo harness, and
one reference-format row appended to the log per point.

Examples:
    python -m ldpcsimulation_tpu.tools.sweep minsum \
        --code qc_1008_504 --snr 1.6:3.8:0.2 -T 8 --log ms.log
    python -m ldpcsimulation_tpu.tools.sweep gdbf --preset SMNGDBF \
        --alist PEGReg504x1008.alist --snr 2.0:4.0:0.25 -T 300 \
        --theta -0.9 --noise-scale 0.975 0.75 --lam 0.988 \
        --alpha 2.3 --window 64 --ymax 2.5 --log smngdbf.log
    python -m ldpcsimulation_tpu.tools.sweep bp --code peg_1008_504 \
        --snr 1.6:2.6:0.2 -T 100 --log bp.log
"""

from __future__ import annotations

import argparse
import itertools
import sys
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..channel.awgn import llr_from_channel, snr_to_n0, snr_to_sigma
from ..channel.quantize import quantize_no_zero, quantize_round, saturate
from ..codes import build_code, load_alist
from ..codes.library import NAMED_CODES, load_named_code
from ..decoders.bp import decode_bp
from ..decoders.ddbmp import decode_ddbmp, decode_ddbmp_qc
from ..decoders.gdbf import PRESETS, preset
from ..decoders.gdbf import decode_gdbf
from ..decoders.minsum import decode_minsum
from ..decoders.ngdbf_hw import NGDBFHwConfig, decode_ngdbf_hw
from ..harness import (
    StopRule,
    append_row,
    bp_log_row,
    default_min_word_errors,
    fmt,
    gdbf_log_row,
    minsum_log_row,
    ngdbfhw_log_row,
    simulate,
)
from ..harness.fixtures import load_codeword_file

__all__ = ["main", "build_parser"]


def _grid_key(point) -> str:
    """Canonical resume key for one cartesian grid point (None -> '-')."""
    return "|".join("-" if v is None else fmt(v) for v in point)


def _mark_done(log: str, key: str) -> None:
    """Record a completed grid point in the '<log>.done' resume sidecar."""
    with open(log + ".done", "a") as f:
        f.write(key + "\n")


def _parse_snr(spec: str) -> List[float]:
    """"a:b:step" inclusive grid, or a single value, or comma list."""
    try:
        if ":" in spec:
            a, b, s = (float(x) for x in spec.split(":"))
            n = int(round((b - a) / s)) + 1
            if n < 1:
                raise SystemExit(
                    f"sweep: error: --snr range {spec!r} is empty "
                    "(end before start with a positive step?)"
                )
            return [round(a + i * s, 10) for i in range(n)]
        if "," in spec:
            return [float(x) for x in spec.split(",")]
        return [float(spec)]
    except ValueError:
        raise SystemExit(
            f"sweep: error: argument --snr: expected 'a:b:step', "
            f"'v1,v2,...' or a single dB value, got {spec!r}"
        )


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="sweep", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    p.add_argument(
        "decoder",
        choices=["bp", "minsum", "offsetminsum", "normalizedminsum",
                 "gdbf", "ddbmp", "ngdbfhw", "nbqspa"],
    )
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--code", choices=sorted(NAMED_CODES), help="named code")
    src.add_argument("--alist", help="path to an alist file (binary or NB)")
    src.add_argument("--nb-random", metavar="N:M:DV:Q",
                     help="random GF(Q) regular code, e.g. 96:48:3:64")
    p.add_argument("--schedule", choices=["flooding", "layered"],
                   default="flooding",
                   help="min-sum schedule (layered needs a QC --code)")
    p.add_argument("--distributed", action="store_true",
                   help="run all SNR points concurrently on the device "
                        "mesh (snr x data) with psum-reduced statistics")
    p.add_argument("--rate", type=float, help="code rate R (default k/n)")
    p.add_argument("--snr", required=True, help="Eb/N0 grid 'a:b:step' dB")
    p.add_argument("-T", "--iterations", type=int, required=True)
    p.add_argument("--log", required=True, help="append-only result log")
    p.add_argument("--codewords", help="data.enc-style codeword file")
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--min-errors", type=int, default=200)
    p.add_argument("--min-word-errors", type=int, default=None)
    p.add_argument("--early-termination", action="store_true")
    p.add_argument(
        "--msg-dtype", choices=["f32", "f16"], default="f32",
        help="message STORAGE dtype (arithmetic stays f32); f16 is the "
             "benchmark precision mode, BER-identical to f32.  Applied "
             "uniformly to every min-sum route (generic, QC, layered, "
             "stratified) and to flooding BP (generic, QC) so results "
             "stay bit-comparable.",
    )
    p.add_argument("--verbose", action="store_true")
    # min-sum / ddbmp quantization
    p.add_argument("--ymax", type=float, nargs="+", default=[None])
    p.add_argument("--nq", type=float, nargs="+", default=[None],
                   help="quantizer levels (minsum/ddbmp) or bits (gdbf)")
    p.add_argument("--alpha", type=float, nargs="+", default=[None])
    p.add_argument("--delta", type=float, nargs="+", default=[None])
    # gdbf family
    p.add_argument("--preset", choices=sorted(PRESETS), default="SMNGDBF")
    p.add_argument("--theta", type=float, nargs="+", default=[None])
    p.add_argument("--noise-scale", type=float, nargs="+", default=[None])
    p.add_argument("--lam", type=float, nargs="+", default=[None])
    p.add_argument("--window", type=int, default=64)
    p.add_argument("--max-phases", type=int, default=None)
    p.add_argument("--uniform-noise", action="store_true",
                   help="variance-matched uniform perturbation noise "
                        "(the reference's -DUNIFORM NGDBF builds, e.g. "
                        "ngdbf_example_uniform_PEGReg504x1008.sh)")
    # ngdbfhw
    p.add_argument("--w", type=float, nargs="+", default=[None])
    p.add_argument("--theta0", type=float, nargs="+", default=[None])
    p.add_argument("--frames", type=int, default=10000,
                   help="fixed frame count for ngdbfhw")
    p.add_argument(
        "--resume", action="store_true",
        help="skip grid points already recorded in the '<log>.done' "
             "sidecar, keyed by the full operating-point tuple (the "
             "reference's interrupted-sweep recovery: append-only logs, "
             "idempotent rows); legacy sidecar-less logs resume by SNR "
             "column for SNR-only grids",
    )
    return p


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)

    qc = None
    strat = None
    if args.code:
        from ..codes.library import load_named_qc

        try:
            qc = load_named_qc(args.code)  # QC fast paths when available
        except KeyError:
            pass
        code = qc.to_code() if qc is not None else load_named_code(args.code)
        alist_name = args.code
    elif args.alist:
        alist = load_alist(args.alist)
        code = build_code(alist)
        alist_name = args.alist
        if code.q <= 2:
            # Auto-detect circulant-block structure in loaded matrices
            # (802.11n-style storage) and route to the gather-free QC
            # decoders.  Only the natural-order layout is auto-routed from
            # the CLI; permuted layouts are available via
            # codes.qc_detect.permuted_decoder in the library API.
            from ..codes.qc_detect import detect_qc

            det = detect_qc(alist)
            if (
                det is not None
                and (det.col_perm == np.arange(code.n)).all()
                and (det.row_perm == np.arange(code.m)).all()
            ):
                qc = det.qc
                print(
                    f"sweep: detected QC structure z={qc.z} "
                    f"({qc.mb}x{qc.nb} base) — using roll decoders",
                    file=sys.stderr,
                )
            if qc is None and args.decoder in (
                "minsum", "offsetminsum", "normalizedminsum"
            ):
                # Non-QC but stratified matrices (802.3an RS-LDPC) get the
                # MXU one-hot interleaver instead of the gather path.  Only
                # the min-sum route consumes the structure, so only it pays
                # for the host-side greedy search.
                from ..codes.stratified import detect_stratified

                strat = detect_stratified(alist)
                if strat is not None:
                    print(
                        f"sweep: detected stratified structure "
                        f"({strat.mb}x{strat.h} strata, {strat.kg} column "
                        "groups) — using MXU one-hot decoders",
                        file=sys.stderr,
                    )
    else:
        from ..codes.construct import nb_regular

        n_, m_, dv_, q_ = (int(x) for x in args.nb_random.split(":"))
        code = build_code(nb_regular(n_, m_, dv_, q=q_, seed=args.seed))
        alist_name = f"nb_random_{args.nb_random}"
    rate = args.rate if args.rate is not None else code.rate
    codewords = (
        load_codeword_file(args.codewords, n=code.n)
        if args.codewords
        else None
    )
    if codewords is not None and code.q <= 2:
        # Fail fast if the fixture rows are not in the code's null space —
        # the classic trap is natural-order words against a column-
        # relabeled variant (e.g. dvbs2_1_2_qc): BER vs a non-codeword
        # "truth" is silently wrong.  A few syndrome products are cheap.
        from ..decoders.base import syndrome_from_hard

        probe = np.asarray(codewords[:4], np.int64)
        d = jnp.asarray(1 - 2 * probe.T, jnp.float32)  # bit->±1, [N, B]
        if bool((syndrome_from_hard(code, d) < 0).any()):
            raise SystemExit(
                f"sweep: error: {args.codewords}: rows are not codewords "
                f"of this H (column order mismatch? e.g. natural-order "
                f"DVB-S2 words require --code dvbs2_1_2, not dvbs2_1_2_qc)"
            )
    snrs = _parse_snr(args.snr)
    T = args.iterations
    mwe = (
        args.min_word_errors
        if args.min_word_errors is not None
        else default_min_word_errors(code.n)
    )
    stop = StopRule(
        min_bit_errors=args.min_errors,
        min_word_errors=mwe,
        max_frames=args.max_frames,
    )

    # Unstructured codes (no QC fast path) get the dense MXU graph ops for
    # the bit-flip decoders when H is small enough to pay off — this is how
    # the reference's own 802.3an RS-LDPC avoids the gather-bound path.
    dense = None
    if qc is None and args.decoder in ("gdbf", "ngdbfhw"):
        from ..decoders.dense_ops import DenseGraph, dense_worthwhile

        if dense_worthwhile(code):
            dense = DenseGraph.from_code(code)

    def run_point(snr, decode_fn, preprocess=None, stop_override=None):
        return simulate(
            code,
            decode_fn,
            snr_db=snr,
            rate=rate,
            stop=stop_override or stop,
            batch_size=args.batch,
            seed=args.seed,
            preprocess=preprocess,
            codewords=codewords,
            verbose=args.verbose,
        )

    if args.distributed:
        return _run_distributed(
            args, code, qc, alist_name, snrs, rate, stop, T, codewords
        )

    rows = 0
    grid = list(
        itertools.product(
            snrs, args.ymax, args.nq, args.alpha, args.delta,
            args.theta, args.noise_scale, args.lam, args.w, args.theta0,
        )
    )
    # --resume keys completed points on the FULL operating-point tuple (SNR
    # plus every grid parameter), recorded in a "<log>.done" sidecar so the
    # reference log-row format stays untouched.  Legacy logs without a
    # sidecar resume by SNR column only when the grid is SNR-only —
    # otherwise skipping by SNR would silently drop unexplored parameter
    # combinations at an already-logged SNR.
    done_keys = set()
    if args.resume:
        try:
            with open(args.log + ".done") as f:
                done_keys.update(line.rstrip("\n") for line in f)
        except FileNotFoundError:
            snr_only = len({point[1:] for point in grid}) == 1
            if snr_only:
                by_snr = {fmt(point[0]): _grid_key(point) for point in grid}
                try:
                    with open(args.log) as f:
                        for line in f:
                            cols = line.split("\t")
                            if cols and cols[0] in by_snr:
                                done_keys.add(by_snr[cols[0]])
                except FileNotFoundError:
                    pass
            else:
                print(
                    "sweep: --resume found no sidecar "
                    f"{args.log}.done; multi-parameter grid will re-run "
                    "all points",
                    file=sys.stderr,
                )
    for point in grid:
        (snr, ymax, nq, alpha, delta, theta, nscale, lam, w, theta0) = point
        gkey = _grid_key(point)
        if args.resume and gkey in done_keys:
            rows += 1
            print(
                f"[{rows}/{len(grid)}] SNR={snr} point already logged, "
                "skipping",
                file=sys.stderr,
            )
            continue
        n0 = float(snr_to_n0(snr, rate))
        sigma = float(snr_to_sigma(snr, rate))
        if args.decoder == "bp":
            sdt = jnp.float16 if args.msg_dtype == "f16" else None
            if args.schedule == "layered":
                if qc is None:
                    raise SystemExit(
                        "sweep: error: --schedule layered requires a "
                        "QC-structured --code"
                    )
                from ..decoders.bp_layered import decode_bp_layered_qc

                dec = lambda llr, key: decode_bp_layered_qc(
                    qc, llr, T, early_termination=args.early_termination
                )
            elif qc is not None:
                from ..decoders.bp_qc import decode_bp_qc

                dec = lambda llr, key: decode_bp_qc(
                    qc, llr, T, early_termination=args.early_termination,
                    storage_dtype=sdt,
                )
            else:
                dec = lambda llr, key: decode_bp(
                    code, llr, T, early_termination=args.early_termination,
                    storage_dtype=sdt,
                )
            stats = run_point(
                snr, dec, preprocess=lambda y: llr_from_channel(y, n0),
            )
            row = bp_log_row(snr, stats, T, alist_name)
        elif args.decoder in ("minsum", "offsetminsum", "normalizedminsum"):
            variant = {"minsum": "plain", "offsetminsum": "offset",
                       "normalizedminsum": "normalized"}[args.decoder]
            sdt = jnp.float16 if args.msg_dtype == "f16" else None
            pre = None
            if variant != "plain":
                ym = ymax if ymax is not None else 2.0
                nql = nq if nq is not None else 8.0
                pre = lambda y: quantize_no_zero(y, ym, nql)
            if args.schedule == "layered":
                if qc is None:
                    raise SystemExit(
                        "sweep: error: --schedule layered requires a "
                        "QC-structured --code"
                    )
                from ..decoders.minsum_layered import decode_minsum_layered_qc

                dec = lambda y, key: decode_minsum_layered_qc(
                    qc, y, T, variant=variant,
                    alpha=alpha if alpha is not None else 1.0,
                    delta=delta if delta is not None else 0.0,
                    early_termination=args.early_termination,
                    storage_dtype=sdt,
                )
            elif qc is not None:
                from ..decoders.minsum_qc import decode_minsum_qc

                dec = lambda y, key: decode_minsum_qc(
                    qc, y, T, variant=variant,
                    alpha=alpha if alpha is not None else 1.0,
                    delta=delta if delta is not None else 0.0,
                    early_termination=args.early_termination,
                    storage_dtype=sdt,
                )
            elif strat is not None:
                from ..decoders.minsum_stratified import (
                    decode_minsum_stratified,
                )

                dec = lambda y, key: decode_minsum_stratified(
                    strat, y, T, variant=variant,
                    alpha=alpha if alpha is not None else 1.0,
                    delta=delta if delta is not None else 0.0,
                    early_termination=args.early_termination,
                    storage_dtype=sdt,
                )
            else:
                dec = lambda y, key: decode_minsum(
                    code, y, T, variant=variant,
                    alpha=alpha if alpha is not None else 1.0,
                    delta=delta if delta is not None else 0.0,
                    early_termination=args.early_termination,
                    storage_dtype=sdt,
                )
            stats = run_point(snr, dec, preprocess=pre)
            row = minsum_log_row(
                snr, stats, T, alist_name,
                ymax=ymax if variant != "plain" else None,
                alpha=alpha if variant == "normalized" else None,
                delta=delta if variant == "offset" else None,
            )
        elif args.decoder == "gdbf":
            cfg = preset(
                args.preset,
                num_iterations=T,
                theta=theta if theta is not None else -0.9,
                **{
                    k: v
                    for k, v in dict(
                        noise_scale=nscale,
                        lam=lam,
                        alpha=alpha,
                        window_size=args.window,
                        max_phases=args.max_phases,
                        uniform_noise=args.uniform_noise or None,
                    ).items()
                    if v is not None
                },
            )
            def pre(y):
                out = y
                if ymax is not None:
                    out = saturate(out, ymax)
                if nq is not None:
                    out = quantize_round(out, ymax or 2.25, int(nq))
                return out
            stats = run_point(
                snr,
                lambda yq, key: decode_gdbf(
                    code, yq, sigma, cfg, key=key, qc=qc, dense=dense
                ),
                preprocess=pre,
            )
            row = gdbf_log_row(
                snr, stats, T, cfg.theta, alist_name,
                noise_scale=cfg.noise_scale if cfg.add_noise or cfg.quantize_probabilities else None,
                nq=int(nq) if nq is not None else None,
                lam=cfg.lam if cfg.threshold_adaptation else None,
                alpha=cfg.alpha if cfg.weight_syndromes else None,
                smoothing_used=int(stats.extra.get("smoothing_used", 0))
                if cfg.output_smoothing else None,
                window_size=cfg.window_size if cfg.output_smoothing else None,
                ymax=ymax,
            )
        elif args.decoder == "ddbmp":
            ym = ymax if ymax is not None else 1.5
            nql = nq if nq is not None else 8.0
            stats = run_point(
                snr,
                (lambda yq, key: decode_ddbmp_qc(qc, yq, T))
                if qc is not None
                else (lambda yq, key: decode_ddbmp(code, yq, T)),
                preprocess=lambda y: quantize_no_zero(y, ym, nql),
            )
            row = minsum_log_row(snr, stats, T, alist_name, ymax=ym)
        elif args.decoder == "nbqspa":
            from ..harness.montecarlo_nb import simulate_nb

            nb_stats = simulate_nb(
                code, snr_db=snr, num_iterations=T, rate=rate,
                stop=stop, batch_size=args.batch, seed=args.seed,
                early_termination=args.early_termination,
            )
            # NB row: SNR SER BER avgIters FER T alist
            row = "\t".join(
                fmt(v) for v in (
                    snr, nb_stats.ser, nb_stats.ber,
                    nb_stats.avg_iterations, nb_stats.fer, T,
                )
            ) + f"\t{alist_name}"
            append_row(args.log, row)
            _mark_done(args.log, gkey)
            rows += 1
            print(
                f"[{rows}/{len(grid)}] SNR={snr} SER={nb_stats.ser:.4g} "
                f"BER={nb_stats.ber:.4g} frames={nb_stats.total_words} "
                f"({nb_stats.wall_seconds:.1f}s)",
                file=sys.stderr,
            )
            continue
        elif args.decoder == "ngdbfhw":
            cfg = NGDBFHwConfig(
                num_iterations=T,
                w=w if w is not None else 0.185,
                ymax=ymax if ymax is not None else 1.625,
                noise_scale=nscale if nscale is not None else 0.95,
                theta0=theta0 if theta0 is not None else -0.525,
                max_phases=args.max_phases or 1,
                ring_len=max(2648, code.n + 600),
            )
            # NGDBFhw runs a fixed frame count (NGDBFhw.cpp:193)
            stats = run_point(
                snr,
                lambda y, key: decode_ngdbf_hw(
                    code, y, sigma, cfg, key=key, dense=dense, qc=qc
                ),
                stop_override=StopRule.fixed_frames(args.frames),
            )
            row = ngdbfhw_log_row(
                snr, stats, T, cfg.theta0, cfg.noise_scale, cfg.w,
                cfg.ymax, cfg.nq, cfg.max_phases, args.seed,
            )
            # iteration-completion CDF file (NGDBFhw.cpp:464-469)
            cdf = stats.iteration_cdf()
            with open(f"{args.log}_{snr:g}_itdist.dat", "w") as f:
                for idx, v in enumerate(cdf):
                    f.write(f"{idx}\t{v:.6g}\n")
        append_row(args.log, row)
        _mark_done(args.log, gkey)
        rows += 1
        print(
            f"[{rows}/{len(grid)}] SNR={snr} BER={stats.ber:.4g} "
            f"FER={stats.fer:.4g} frames={stats.total_words} "
            f"({stats.wall_seconds:.1f}s)",
            file=sys.stderr,
        )
    return 0


def _run_distributed(
    args, code, qc, alist_name, snrs, rate, stop, T, codewords=None
):
    """--distributed: all SNR points concurrently on the (snr x data) mesh.

    The mesh snr axis must equal len(snrs) and divide the device count
    (e.g. 2 points on an 8-device mesh -> 4 data shards per point).
    The SNR grid is the mesh axis; the other parameters take exactly ONE
    value per invocation (a cartesian parameter grid needs one launch per
    combination — erroring beats silently dropping grid points).
    """
    import jax

    from ..parallel.mesh import make_mesh
    from ..parallel.montecarlo import simulate_distributed

    if args.schedule == "layered":
        raise SystemExit(
            "sweep: error: --schedule layered is not supported with "
            "--distributed (run it single-device)"
        )
    multi = [
        name
        for name, vals in [
            ("--ymax", args.ymax), ("--nq", args.nq),
            ("--alpha", args.alpha), ("--delta", args.delta),
            ("--theta", args.theta), ("--noise-scale", args.noise_scale),
            ("--lam", args.lam), ("--w", args.w), ("--theta0", args.theta0),
        ]
        if len(vals) > 1
    ]
    if multi:
        raise SystemExit(
            f"sweep: error: --distributed runs one value per parameter; "
            f"{', '.join(multi)} given multiple values (the SNR grid is "
            "the distributed axis — launch once per parameter combination)"
        )
    if args.resume:
        point = (
            args.ymax[0], args.nq[0], args.alpha[0], args.delta[0],
            args.theta[0], args.noise_scale[0], args.lam[0], args.w[0],
            args.theta0[0],
        )
        done = set()
        try:
            with open(args.log + ".done") as f:
                done.update(line.rstrip("\n") for line in f)
        except FileNotFoundError:
            pass
        snrs = [s for s in snrs if _grid_key((s,) + point) not in done]
        if not snrs:
            print("sweep: all points already done", file=sys.stderr)
            return 0

    nd = len(jax.devices())
    if nd % len(snrs):
        raise SystemExit(
            f"sweep: error: --distributed needs len(snrs)={len(snrs)} to "
            f"divide the device count ({nd})"
        )
    mesh = make_mesh(n_snr=len(snrs))

    if args.decoder == "nbqspa":
        from ..parallel.montecarlo_nb import simulate_nb_distributed

        nb_stats = simulate_nb_distributed(
            code, snrs, mesh, T, rate=rate, stop=stop,
            batch_per_device=args.batch, seed=args.seed,
            early_termination=args.early_termination,
        )
        for snr, st in zip(snrs, nb_stats):
            row = "\t".join(
                fmt(v)
                for v in (snr, st.ser, st.ber, st.avg_iterations, st.fer, T)
            ) + f"\t{alist_name}"
            append_row(args.log, row)
            print(
                f"SNR={snr} SER={st.ser:.4g} BER={st.ber:.4g} "
                f"frames={st.total_words}",
                file=sys.stderr,
            )
        return 0

    if args.decoder == "bp":
        bp_sdt = jnp.float16 if args.msg_dtype == "f16" else None

        def dec(y, sigma, key):
            from ..decoders.bp import decode_bp

            n0 = 2.0 * sigma * sigma
            return decode_bp(
                code, jnp.clip(4.0 * y / n0, -20.0, 20.0), T,
                early_termination=args.early_termination,
                storage_dtype=bp_sdt,
            )
    elif args.decoder in ("minsum", "offsetminsum", "normalizedminsum"):
        variant = {"minsum": "plain", "offsetminsum": "offset",
                   "normalizedminsum": "normalized"}[args.decoder]
        alpha = args.alpha[0] if args.alpha[0] is not None else 1.0
        delta = args.delta[0] if args.delta[0] is not None else 0.0
        sdt = jnp.float16 if args.msg_dtype == "f16" else None
        # same channel as the non-distributed route: the quantized
        # variants run through quantize_no_zero(ymax, nq)
        ms_ymax = ms_nq = None
        preprocess = None
        if variant != "plain":
            ms_ymax = args.ymax[0] if args.ymax[0] is not None else 2.0
            ms_nq = args.nq[0] if args.nq[0] is not None else 8.0
            preprocess = lambda y: quantize_no_zero(y, ms_ymax, ms_nq)

        def dec(y, sigma, key):
            return decode_minsum(
                code, y, T, variant=variant, alpha=alpha, delta=delta,
                early_termination=args.early_termination,
                storage_dtype=sdt,
            )
    elif args.decoder == "gdbf":
        from ..channel.quantize import saturate as _sat
        from ..decoders.gdbf import preset as _preset

        cfg = _preset(
            args.preset, num_iterations=T,
            theta=args.theta[0] if args.theta[0] is not None else -0.9,
            **{k: v for k, v in dict(
                noise_scale=args.noise_scale[0],
                lam=args.lam[0],
                alpha=args.alpha[0],
                window_size=args.window,
                max_phases=args.max_phases,
                uniform_noise=args.uniform_noise or None,
            ).items() if v is not None},
        )
        ymax = args.ymax[0]
        from ..decoders.dense_ops import DenseGraph, dense_worthwhile

        dense = (
            DenseGraph.from_code(code)
            if qc is None and dense_worthwhile(code)
            else None
        )

        def dec(y, sigma, key):
            yq = _sat(y, ymax) if ymax is not None else y
            return decode_gdbf(
                code, yq, sigma, cfg, key=key, qc=qc, dense=dense
            )
    elif args.decoder == "ddbmp":
        from ..channel.quantize import quantize_no_zero as _qnz

        ym = args.ymax[0] if args.ymax[0] is not None else 1.5
        nql = args.nq[0] if args.nq[0] is not None else 8.0

        def dec(y, sigma, key):
            if qc is not None:
                return decode_ddbmp_qc(qc, _qnz(y, ym, nql), T)
            return decode_ddbmp(code, _qnz(y, ym, nql), T)
    elif args.decoder == "ngdbfhw":
        from ..decoders.dense_ops import DenseGraph, dense_worthwhile

        # Same fixed-frame-count semantics as the non-distributed route
        # (NGDBFhw.cpp:193): --frames overrides the error-count stop rule
        # so distributed and single-device runs are statistically
        # comparable.
        stop = StopRule.fixed_frames(args.frames)
        hw_cfg = NGDBFHwConfig(
            num_iterations=T,
            w=args.w[0] if args.w[0] is not None else 0.185,
            ymax=args.ymax[0] if args.ymax[0] is not None else 1.625,
            noise_scale=(
                args.noise_scale[0]
                if args.noise_scale[0] is not None
                else 0.95
            ),
            theta0=args.theta0[0] if args.theta0[0] is not None else -0.525,
            max_phases=args.max_phases or 1,
            ring_len=max(2648, code.n + 600),
        )
        hw_dense = (
            DenseGraph.from_code(code)
            if qc is None and dense_worthwhile(code)
            else None
        )

        def dec(y, sigma, key):
            return decode_ngdbf_hw(
                code, y, sigma, hw_cfg, key=key, dense=hw_dense, qc=qc
            )
    else:
        raise SystemExit(
            "sweep: error: --distributed supports bp, min-sum variants, "
            "gdbf, ddbmp, ngdbfhw, and nbqspa"
        )

    if args.decoder not in ("minsum", "offsetminsum", "normalizedminsum"):
        preprocess = None
    # iteration counts accumulate across redecode phases (GDBF/NGDBFhw):
    # size the on-device histogram for the full budget or late frames
    # silently vanish from iteration_hist
    max_it = T
    if args.decoder == "gdbf":
        max_it = T * cfg.max_phases
    elif args.decoder == "ngdbfhw":
        max_it = T * hw_cfg.max_phases
    stats_list = simulate_distributed(
        code, dec, snrs_db=snrs, mesh=mesh, rate=rate, stop=stop,
        batch_per_device=args.batch, max_iterations=max_it, seed=args.seed,
        preprocess=preprocess, codewords=codewords,
    )
    for snr, st in zip(snrs, stats_list):
        if args.decoder == "bp":
            row = bp_log_row(snr, st, T, alist_name)
        elif args.decoder == "gdbf":
            # identical column layout to the non-distributed route
            # (logging.py: bracketed fields present iff feature enabled)
            row = gdbf_log_row(
                snr, st, T, cfg.theta, alist_name,
                noise_scale=cfg.noise_scale
                if cfg.add_noise or cfg.quantize_probabilities
                else None,
                nq=int(args.nq[0]) if args.nq[0] is not None else None,
                lam=cfg.lam if cfg.threshold_adaptation else None,
                alpha=cfg.alpha if cfg.weight_syndromes else None,
                smoothing_used=int(st.extra.get("smoothing_used", 0))
                if cfg.output_smoothing else None,
                window_size=cfg.window_size
                if cfg.output_smoothing else None,
                ymax=args.ymax[0],
            )
        elif args.decoder == "ddbmp":
            row = minsum_log_row(snr, st, T, alist_name, ymax=ym)
        elif args.decoder == "ngdbfhw":
            row = ngdbfhw_log_row(
                snr, st, T, hw_cfg.theta0, hw_cfg.noise_scale, hw_cfg.w,
                hw_cfg.ymax, hw_cfg.nq, hw_cfg.max_phases, args.seed,
            )
        else:
            row = minsum_log_row(
                snr, st, T, alist_name,
                ymax=ms_ymax,
                alpha=alpha if variant == "normalized" else None,
                delta=delta if variant == "offset" else None,
            )
        append_row(args.log, row)
        print(
            f"SNR={snr} BER={st.ber:.4g} FER={st.fer:.4g} "
            f"frames={st.total_words}",
            file=sys.stderr,
        )
        if args.resume:
            _mark_done(args.log, _grid_key((
                snr, args.ymax[0], args.nq[0], args.alpha[0], args.delta[0],
                args.theta[0], args.noise_scale[0], args.lam[0], args.w[0],
                args.theta0[0],
            )))
    return 0


if __name__ == "__main__":
    sys.exit(main())
