"""Log-domain NB QSPA: speed + f16-storage BER parity on real codes (chip)."""
import functools
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ldpcsimulation_tpu.codes import build_code, load_alist
from ldpcsimulation_tpu.channel.nb import symbol_priors
from ldpcsimulation_tpu.channel.awgn import snr_to_n0
from ldpcsimulation_tpu.decoders.nb_qspa import decode_nb_qspa

CASES = [
    ("GF4 (9000,6000)", "/root/reference/SystemC/NB-LDPC/codes/GF4/q4.sp.9000.6000.4500.1", 2.2),
    ("GF8 (6000,4000)", "/root/reference/SystemC/NB-LDPC/codes/GF8/q8.sp.6000.4000.3000.1", 2.4),
]

key = jax.random.key(0)


def timed(fn, reps=3):
    jax.block_until_ready(fn(jax.random.key(99)))
    ts = []
    for i in range(reps):
        k = jax.random.fold_in(key, i + 1)
        t0 = time.perf_counter()
        jax.block_until_ready(fn(k))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


for name, path, snr in CASES:
    code = build_code(load_alist(path))
    q = code.q
    m_bits = q.bit_length() - 1
    rate = (code.n - code.m) / code.n
    n0 = float(snr_to_n0(snr, rate))
    sig = float((n0 / 2) ** 0.5)
    B = 512

    def dec(k, T, et, sd):
        pri = symbol_priors(
            1.0 + sig * jax.random.normal(k, (B, code.n, m_bits), jnp.float32),
            n0, q)
        r = decode_nb_qspa(code, pri, num_iterations=T,
                           early_termination=et, storage_dtype=sd)
        return jnp.sum(r.symbols) + jnp.sum(r.iterations)

    kbits = (code.n - code.m) * m_bits
    for sd, sdname in [(None, "f32"), (jnp.float16, "f16")]:
        d4 = timed(jax.jit(functools.partial(dec, T=4, et=False, sd=sd)))
        d24 = timed(jax.jit(functools.partial(dec, T=24, et=False, sd=sd)))
        det = timed(jax.jit(functools.partial(dec, T=20, et=True, sd=sd)))
        per = (d24 - d4) / 20
        print(f"{name} {sdname}: per-iter {per*1e3:6.2f} ms  "
              f"ET T<=20 {det*1e3:7.1f} ms -> {B*kbits/det/1e6:6.1f} Mbit/s",
              flush=True)

    # BER parity f32 vs f16 over 16 batches of 512 frames
    @functools.partial(jax.jit, static_argnames=("sd",))
    def errs(k, sd):
        pri = symbol_priors(
            1.0 + sig * jax.random.normal(k, (B, code.n, m_bits), jnp.float32),
            n0, q)
        r = decode_nb_qspa(code, pri, num_iterations=20,
                           early_termination=True, storage_dtype=sd)
        return jnp.sum(r.symbols != 0), jnp.sum(r.iterations)

    tot = {"f32": 0, "f16": 0}
    its = {"f32": 0, "f16": 0}
    for i in range(16):
        k = jax.random.fold_in(key, 1000 + i)
        for sd, sdname in [(None, "f32"), (jnp.float16, "f16")]:
            e, it = errs(k, sd)
            tot[sdname] += int(e)
            its[sdname] += int(it)
    nsym = 16 * B * code.n
    print(f"{name} SER f32={tot['f32']/nsym:.3e} f16={tot['f16']/nsym:.3e}  "
          f"avg-iters f32={its['f32']/(16*B):.2f} f16={its['f16']/(16*B):.2f}",
          flush=True)
