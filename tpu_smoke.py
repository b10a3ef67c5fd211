"""TPU compile-and-run smoke test for every decoder family.

CPU CI cannot catch TPU-compiler regressions (e.g. the reduce-broadcast
pattern that SIGSEGV'd the Mosaic/XLA compile helper in DD-BMP's original
emission form).  Run this manually on the TPU after decoder changes:

    python tpu_smoke.py

Each check compiles and executes the decoder on a small batch and prints
ok/FAIL; exits nonzero if anything fails.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    from ldpcsimulation_tpu.channel import llr_from_channel, snr_to_n0
    from ldpcsimulation_tpu.channel.nb import symbol_priors
    from ldpcsimulation_tpu.codes import build_code, make_regular_code
    from ldpcsimulation_tpu.codes.construct import nb_regular
    from ldpcsimulation_tpu.codes.qc import qc_peg
    from ldpcsimulation_tpu.decoders import (
        SystemCNGDBFConfig,
        NGDBFHwConfig,
        decode_bp,
        decode_bp_layered_qc,
        decode_bp_qc,
        decode_ddbmp,
        decode_gdbf,
        decode_minsum,
        decode_minsum_layered_qc,
        decode_minsum_qc,
        decode_nb_minsum,
        decode_nb_qspa,
        decode_ngdbf_hw,
        decode_ngdbf_systemc,
        preset,
    )

    from ldpcsimulation_tpu.codes.construct import peg
    from ldpcsimulation_tpu.codes.stratified import stratify
    from ldpcsimulation_tpu.decoders.minsum_stratified import (
        decode_minsum_stratified,
    )

    print(f"device: {jax.devices()[0]}")
    code = make_regular_code(96, 48, 3, seed=0)
    sc = stratify(peg(96, 48, 3, seed=7))
    ys = jax.random.normal(jax.random.key(5), (64, 96)) + 1.0
    qc = qc_peg(12, 6, 3, z=8, seed=3)
    qcode = qc.to_code()
    # generalized QC: multi-edge pair + minus edge (DVB-S2 structure class)
    from ldpcsimulation_tpu.codes.qc import build_qc_code_edges

    gqc = build_qc_code_edges(
        [(0, 0, 1), (0, 0, 3), (0, 1, 0), (0, 2, 2),
         (1, 0, 2), (1, 1, 2), (1, 2, 4)],
        5, 2, 3, minus_edges=((1, 2, 4, 1),),
    )
    yg = jax.random.normal(jax.random.key(9), (64, gqc.n), jnp.float32) + 1.0
    nb = build_code(nb_regular(24, 12, 3, q=8, seed=1))
    key = jax.random.key(0)
    y = jax.random.normal(key, (64, 96), jnp.float32) + 1.0
    yq = jax.random.normal(key, (64, qc.n), jnp.float32) + 1.0
    n0 = float(snr_to_n0(3.0, 0.5))
    pri = symbol_priors(
        1.0 + 0.4 * jax.random.normal(key, (16, 24, 3)), 0.3, 8
    )

    checks = [
        ("minsum", lambda: decode_minsum(code, y, 5).hard),
        ("minsum ET", lambda: decode_minsum(
            code, y, 5, early_termination=True).hard),
        ("minsum offset", lambda: decode_minsum(
            code, y, 5, variant="offset", delta=0.2).hard),
        ("bp", lambda: decode_bp(
            code, llr_from_channel(y, n0), 5).hard),
        ("minsum_strat", lambda: decode_minsum_stratified(sc, ys, 5).hard),
        ("minsum_strat et f16", lambda: decode_minsum_stratified(
            sc, ys, 5, early_termination=True,
            storage_dtype=jnp.float16).hard),
        ("bp_strat", lambda: __import__(
            "ldpcsimulation_tpu.decoders.bp_stratified",
            fromlist=["decode_bp_stratified"],
        ).decode_bp_stratified(
            sc, llr_from_channel(ys, n0), 5, early_termination=True
        ).hard),
        ("ddbmp_strat", lambda: __import__(
            "ldpcsimulation_tpu.decoders.ddbmp",
            fromlist=["decode_ddbmp_stratified"],
        ).decode_ddbmp_stratified(sc, ys, 10).hard),
        ("minsum stream refill", lambda: _stream_check()),
        ("layered stream refill", lambda: _stream_layered_check()),
        ("gdbf stream refill", lambda: _stream_gdbf_check()),
        ("ddbmp stream refill", lambda: _stream_ddbmp_check()),
        ("stratified stream refill", lambda: _stream_strat_check()),
        ("ngdbfhw stream refill", lambda: _stream_hw_check()),
        ("minsum_qc", lambda: decode_minsum_qc(qc, yq, 5).hard),
        ("minsum_qc f16", lambda: decode_minsum_qc(
            qc, yq, 5, storage_dtype=jnp.float16).hard),
        ("bp_qc", lambda: decode_bp_qc(
            qc, llr_from_channel(yq, n0), 5).hard),
        ("minsum_qc generalized", lambda: decode_minsum_qc(
            gqc, yg, 5, early_termination=True).hard),
        ("bp_qc generalized", lambda: decode_bp_qc(
            gqc, llr_from_channel(yg, n0), 5).hard),
        ("minsum layered generalized", lambda: decode_minsum_layered_qc(
            gqc, yg, 5).hard),
        ("minsum layered", lambda: decode_minsum_layered_qc(
            qc, yq, 5).hard),
        ("bp layered", lambda: decode_bp_layered_qc(
            qc, llr_from_channel(yq, n0), 5).hard),
        ("gdbf SMNGDBF", lambda: decode_gdbf(
            code, y, 0.5, preset("SMNGDBF", 10, -0.8), key=key).hard),
        ("gdbf qc-ops", lambda: decode_gdbf(
            qcode, yq, 0.5, preset("SMNGDBF", 10, -0.8), key=key, qc=qc
        ).hard),
        ("gdbf stochastic", lambda: decode_gdbf(
            code, y, 0.5, preset("StochasticNGDBF", 10, -0.6), key=key
        ).hard),
        ("gdbf redecode", lambda: decode_gdbf(
            code, y, 0.5, preset("RSMNGDBF", 5, -0.8, max_phases=2), key=key
        ).hard),
        ("ddbmp", lambda: decode_ddbmp(code, y, 10).hard),
        ("ddbmp_qc generalized", lambda: __import__(
            "ldpcsimulation_tpu.decoders.ddbmp", fromlist=["decode_ddbmp_qc"]
        ).decode_ddbmp_qc(gqc, yg, 10).hard),
        ("ngdbf_hw", lambda: decode_ngdbf_hw(
            code, y, 0.5, NGDBFHwConfig(num_iterations=10, ring_len=300),
            key=key).hard),
        ("ngdbf_hw 3ph", lambda: decode_ngdbf_hw(
            code, y, 0.5,
            NGDBFHwConfig(num_iterations=10, max_phases=3, ring_len=300),
            key=key).hard),
        ("ngdbf_systemc", lambda: decode_ngdbf_systemc(
            code, y, 0.5, SystemCNGDBFConfig(10, -0.5), key=key).hard),
        ("nb_qspa", lambda: decode_nb_qspa(nb, pri, 5).symbols),
        ("nb_qspa log-f16", lambda: decode_nb_qspa(
            nb, pri, 5, storage_dtype=jnp.float16).symbols),
        ("nb_minsum", lambda: decode_nb_minsum(nb, pri, 5).symbols),
        ("nb_minmax", lambda: decode_nb_minsum(
            nb, pri, 5, variant="minmax").symbols),
        ("grid step (traced op-point scalars)", lambda: _grid_check()),
    ]

    def _stream_check():
        # streaming refill harness end-to-end on the chip (f16 pool)
        from ldpcsimulation_tpu.harness.stream import (
            build_channel_pool,
            make_stream_call,
            minsum_qc_stream,
            stream_init,
        )

        sdec = minsum_qc_stream(qc, storage_dtype=jnp.float16)
        pool, unc, sat0 = build_channel_pool(
            sdec, jax.random.key(1), 0, 256, qc.n, 0.7,
            pool_dtype=jnp.float16,
        )
        st = stream_init(sdec, 64, qc.n, jnp.float16)
        callf = make_stream_call(sdec, qc.n, 8, 12, 2)
        _st, acc, _rec = callf(st, pool, unc, sat0, jnp.int32(0))
        assert int(acc["frames"]) > 0
        return np.asarray(acc["bit_errs"], np.float64)

    def _stream_layered_check():
        # row-layered min-sum streaming (one stream iteration = one full
        # layer sweep) on the chip, f16 pool
        from ldpcsimulation_tpu.harness.stream import (
            build_channel_pool,
            make_stream_call,
            minsum_layered_qc_stream,
            stream_init,
        )

        sdec = minsum_layered_qc_stream(qc, storage_dtype=jnp.float16)
        pool, unc, sat0 = build_channel_pool(
            sdec, jax.random.key(1), 0, 256, qc.n, 0.7,
            pool_dtype=jnp.float16,
        )
        st = stream_init(sdec, 64, qc.n, jnp.float16)
        callf = make_stream_call(sdec, qc.n, 8, 12, 2)
        _st, acc, _rec = callf(st, pool, unc, sat0, jnp.int32(0))
        assert int(acc["frames"]) > 0
        return np.asarray(acc["bit_errs"], np.float64)

    def _stream_gdbf_check():
        # GDBF streaming harness (per-frame keyed noise + drain) on chip
        from ldpcsimulation_tpu.harness.stream_gdbf import (
            build_channel_pool_gdbf,
            gdbf_stream_init,
            make_gdbf_stream_call,
        )

        cfg = preset("SMNGDBF", 8, -0.8, window_size=6)
        pool, unc, sat0 = build_channel_pool_gdbf(
            qcode, jax.random.key(1), 0, 256, 0.7, qc=qc
        )
        st = gdbf_stream_init(qcode, cfg, 64)
        callf = make_gdbf_stream_call(qcode, 12, 2, qc=qc)
        st, acc, _rec = callf(
            st, pool, unc, sat0, jnp.int32(0), jax.random.key(2), 0.7,
            cfg,
        )
        # drain path (pool pre-exhausted; early-exit round loop)
        _st, acc2, _ = callf(
            st, pool, unc, sat0, jnp.int32(0), jax.random.key(2), 0.7,
            cfg, int(pool.shape[0]),
        )
        assert int(acc["frames"]) > 0
        return np.asarray(acc["bit_errs"], np.float64)

    def _stream_ddbmp_check():
        # DD-BMP streaming adapter (break-index iteration convention)
        from ldpcsimulation_tpu.harness.stream import (
            build_channel_pool,
            ddbmp_qc_stream,
            make_stream_call,
            stream_init,
        )

        sdec = ddbmp_qc_stream(qc)
        pool, unc, sat0 = build_channel_pool(
            sdec, jax.random.key(1), 0, 256, qc.n, 0.7,
        )
        st = stream_init(sdec, 64, qc.n)
        callf = make_stream_call(sdec, qc.n, 8, 12, 2)
        _st, acc, _rec = callf(st, pool, unc, sat0, jnp.int32(0))
        assert int(acc["frames"]) > 0
        return np.asarray(acc["bit_errs"], np.float64)

    def _stream_strat_check():
        # the unstructured-fallback stream adapter on the chip (uses the
        # smoke's stratified code sc)
        from ldpcsimulation_tpu.harness.stream import (
            build_channel_pool,
            make_stream_call,
            minsum_stratified_stream,
            stream_init,
        )

        sdec = minsum_stratified_stream(sc, storage_dtype=jnp.float16)
        pool, unc, sat0 = build_channel_pool(
            sdec, jax.random.key(1), 0, 256, sc.n, 0.7,
        )
        st = stream_init(sdec, 64, sc.n)
        callf = make_stream_call(sdec, sc.n, 8, 12, 2)
        _st, acc, _rec = callf(st, pool, unc, sat0, jnp.int32(0))
        assert int(acc["frames"]) > 0
        return np.asarray(acc["bit_errs"], np.float64)

    def _stream_hw_check():
        # NGDBFhw streaming (shared-slice ring, injection-offset
        # qpointer0 semantics) on the chip
        from ldpcsimulation_tpu.harness.stream_ngdbfhw import (
            build_channel_pool_hw,
            hw_stream_init,
            make_hw_stream_call,
        )

        cfg = NGDBFHwConfig(num_iterations=10, ring_len=code.n + 64)
        pool, unc, sat0 = build_channel_pool_hw(
            code, jax.random.key(1), 0, 256, 0.5
        )
        st = hw_stream_init(code, cfg, 64)
        callf = make_hw_stream_call(code, cfg, 12, 2)
        _st, acc, _rec = callf(
            st, pool, unc, sat0, jnp.int32(0), jax.random.key(2), 0.5
        )
        assert int(acc["frames"]) > 0
        return np.asarray(acc["bit_errs"], np.float64)

    def _grid_check():
        # one-slot mesh on the chip: the distributed operating-point grid
        # step with TRACED per-slot sigma + decoder scalars (shard_map +
        # psum compile and run on the real TPU, not just the CPU dryrun)
        import numpy as _np

        from ldpcsimulation_tpu.decoders.minsum import decode_minsum
        from ldpcsimulation_tpu.parallel.mesh import make_grid_step, make_mesh

        mesh = make_mesh(n_snr=1, devices=jax.devices()[:1])
        step = make_grid_step(
            code,
            lambda yy, sigma, k, point: decode_minsum(
                code, yy, 5, variant="normalized", alpha=point["alpha"],
                early_termination=True,
            ),
            mesh, batch_per_device=32, max_iterations=5,
            param_names=("alpha",),
        )
        bits = jnp.zeros((1, step.batch_global, code.n), jnp.uint8)
        out = step(jax.random.key(0), bits,
                   _np.asarray([0.7], _np.float32),
                   {"alpha": _np.asarray([1.25], _np.float32)})
        return out["errors"]

    failed = []
    for name, fn in checks:
        try:
            out = np.asarray(fn())
            assert np.isfinite(out).all()
            print(f"  ok   {name}")
        except Exception as e:  # pragma: no cover
            print(f"  FAIL {name}: {str(e)[:120]}")
            failed.append(name)
    if failed:
        print(f"{len(failed)} failures: {failed}")
        return 1
    print(f"all {len(checks)} decoder paths compile and run")
    return 0


if __name__ == "__main__":
    sys.exit(main())
