"""Before/after timing of decode_nb_qspa on the real NB codes (chip)."""
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
    for B in (512, 1024):
        def dec(k, T, et):
            pri = symbol_priors(
                1.0 + sig * jax.random.normal(k, (B, code.n, m_bits), jnp.float32),
                n0, q)
            r = decode_nb_qspa(code, pri, num_iterations=T,
                               early_termination=et)
            return jnp.sum(r.symbols) + jnp.sum(r.iterations)

        d4 = timed(jax.jit(functools.partial(dec, T=4, et=False)))
        d24 = timed(jax.jit(functools.partial(dec, T=24, et=False)))
        det = timed(jax.jit(functools.partial(dec, T=20, et=True)))
        per = (d24 - d4) / 20
        kbits = (code.n - code.m) * m_bits  # info bits/frame (design)
        print(f"{name} B={B}: per-iter {per*1e3:6.2f} ms  "
              f"ET T<=20 {det*1e3:7.1f} ms -> {B*kbits/det/1e6:6.1f} Mbit/s")
        sys.stdout.flush()
