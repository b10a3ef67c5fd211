"""Random-access gather ceiling on the real GF(4)/GF(8) NB codes (chip).

VERDICT r4 item 1: the NB CN's "gather+exp is ~40% of its wall" needs
either a layout attack or a measured random-access HBM ceiling showing
the current path is already at it.  This measures, at the codes' actual
index distributions and payload shapes:

  * the production gathers: take([slots_v, q, B], cn_gather) and
    take([slots_c, q, B], vn_gather) on f16 payloads;
  * the same bytes through candidate layouts: flattened [slots*q, B]
    rows (with and without the GF coefficient permutation folded into
    the index), q-planes-outside [q, slots, B];
  * ceilings: an ascending (sorted) index over the same rows, and a
    plain same-size copy (the no-permutation roofline).

Methodology: on-device lax.fori_loop marginal between R_hi and R_lo
repetitions, data-chained through an index shift so the result cache
cannot serve repeats (CLAUDE.md: block_until_ready does not sync the
axon tunnel — every timing fetches a scalar).
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

from ldpcsimulation_tpu.codes import build_code, load_alist

PATHS = {
    4: "/root/reference/SystemC/NB-LDPC/codes/GF4/q4.sp.9000.6000.4500.1",
    8: "/root/reference/SystemC/NB-LDPC/codes/GF8/q8.sp.6000.4000.3000.1",
}
B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
QS = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2 else [4, 8])]

key = jax.random.key(0)


def marginal(make_step, r_lo=4, r_hi=24, reps=3):
    """Per-repetition marginal of an on-device chained loop."""
    def run(r):
        f = jax.jit(lambda x0: make_step(x0, r))
        x0 = jax.random.normal(jax.random.key(9), ()).astype(jnp.float32)
        float(f(x0))  # compile+warm
        ts = []
        for i in range(reps):
            xi = jax.random.normal(jax.random.fold_in(key, i), ())
            t0 = time.perf_counter()
            float(f(xi.astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts)

    return (run(r_hi) - run(r_lo)) / (r_hi - r_lo)


for q in QS:
    code = build_code(load_alist(PATHS[q]))
    slots_v = code.n * code.dv_max
    slots_c = code.m * code.dc_max
    cn_gather = jnp.asarray(code.cn_from_vn.reshape(-1))
    vn_gather = jnp.asarray(code.vn_from_cn.reshape(-1))
    E = int(np.sum(np.asarray(code.cn_mask)))
    print(f"\n=== GF({q}) n={code.n} m={code.m} dv={code.dv_max} "
          f"dc={code.dc_max} E={E} slots_v={slots_v} slots_c={slots_c} "
          f"B={B} f16 payloads ===")

    src = jax.random.normal(
        jax.random.key(1), (slots_v, q, B)).astype(jnp.float16)
    out_bytes = slots_c * q * B * 2

    def report(name, dt, nbytes):
        print(f"{name:46s} {dt*1e3:7.3f} ms  {nbytes/dt/1e9:6.1f} GB/s "
              f"({100*nbytes/dt/819e9:4.1f}% peak)")

    # 1. production CN gather: [slots_v, q, B] rows by cn_gather
    def step_cn(x0, r):
        def body(i, acc):
            g = jnp.take(src + x0 * 0 + acc * 0,
                         cn_gather, axis=0)
            return acc + g[0, 0, 0].astype(jnp.float32) + i * 0
        return jax.lax.fori_loop(0, r, body, x0)

    report("CN gather [slots,q,B] (production)",
           marginal(step_cn), out_bytes + slots_v * q * B * 2)

    # 1b. gather + exp (the measured 40% block)
    def step_cn_exp(x0, r):
        def body(i, acc):
            g = jnp.take(src + acc * 0, cn_gather, axis=0)
            e = jnp.exp(g.astype(jnp.float32))
            return acc + e[0, 0, 0]
        return jax.lax.fori_loop(0, r, body, x0)

    report("CN gather + exp->f32",
           marginal(step_cn_exp), out_bytes + slots_v * q * B * 2)

    # 2. flattened rows: [slots*q, B], index slot*q + j
    src_flat = src.reshape(slots_v * q, B)
    idx_flat = (cn_gather[:, None] * q + jnp.arange(q)[None, :]).reshape(-1)

    def step_flat(x0, r):
        def body(i, acc):
            g = jnp.take(src_flat + acc * 0, idx_flat, axis=0)
            return acc + g[0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, r, body, x0)

    report("CN gather flattened [slots*q, B]",
           marginal(step_flat), out_bytes + slots_v * q * B * 2)

    # 3. q planes outside: [q, slots, B], gather axis=1
    src_q = jnp.moveaxis(src, 1, 0)

    def step_qout(x0, r):
        def body(i, acc):
            g = jnp.take(src_q + acc * 0, cn_gather, axis=1)
            return acc + g[0, 0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, r, body, x0)

    report("CN gather q-outside [q, slots, B]",
           marginal(step_qout), out_bytes + slots_v * q * B * 2)

    # 4. ascending index over the same row count (sorted ceiling)
    idx_sorted = jnp.sort(cn_gather)

    def step_sorted(x0, r):
        def body(i, acc):
            g = jnp.take(src + acc * 0, idx_sorted, axis=0)
            return acc + g[0, 0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, r, body, x0)

    report("CN gather SORTED index (run ceiling)",
           marginal(step_sorted), out_bytes + slots_v * q * B * 2)

    # 5. plain copy of the output size (no permutation roofline)
    src_c = jax.random.normal(
        jax.random.key(2), (slots_c, q, B)).astype(jnp.float16)

    def step_copy(x0, r):
        def body(i, acc):
            y = src_c + acc.astype(jnp.float16)
            return acc + y[0, 0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, r, body, x0)

    report("same-size elementwise copy (roofline)",
           marginal(step_copy), 2 * out_bytes)

    # 6. production VN gather
    def step_vn(x0, r):
        def body(i, acc):
            g = jnp.take(src_c + acc * 0, vn_gather, axis=0)
            return acc + g[0, 0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, r, body, x0)

    report("VN gather [slots,q,B] (production)",
           marginal(step_vn), slots_v * q * B * 2 + out_bytes)


# ---- full-iteration A/B: row vs flattened gather layout through the
# actual machine (values identical — tests pin it; this is lowering only)
from ldpcsimulation_tpu.channel.nb import symbol_priors  # noqa: E402
from ldpcsimulation_tpu.channel.awgn import snr_to_n0  # noqa: E402
from ldpcsimulation_tpu.decoders.nb_qspa import nb_qspa_machine  # noqa: E402

for q in QS:
    code = build_code(load_alist(PATHS[q]))
    m_bits = q.bit_length() - 1
    rate = (code.n - code.m) / code.n
    n0 = float(snr_to_n0(2.2 if q == 4 else 2.4, rate))
    sig = float((n0 / 2) ** 0.5)
    y = 1.0 + sig * jax.random.normal(
        jax.random.key(5), (B, code.n, m_bits), jnp.float32
    )
    pri = jnp.moveaxis(symbol_priors(y, n0, q), 0, -1)
    for flat in (False, True):
        M = nb_qspa_machine(code, q, jnp.float32, jnp.float16,
                            flat_gather=flat)
        log_pri = M["log_of"](pri)
        v2c0 = M["init"](log_pri)

        def step_iter(x0, r, M=M, log_pri=log_pri, v2c0=v2c0):
            def body(i, v2c):
                c2v = M["cn_update"](v2c)
                v2c, _post = M["vn_update"](c2v, log_pri)
                return v2c
            v = jax.lax.fori_loop(
                0, r, body,
                v2c0 + x0.astype(jnp.float16) * 0,
            )
            return v[0, 0, 0].astype(jnp.float32)

        dt = marginal(step_iter, r_lo=2, r_hi=10)
        print(f"GF({q}) full iteration, flat_gather={flat}: "
              f"{dt*1e3:.2f} ms/iter at B={B}")
