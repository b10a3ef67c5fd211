"""Chip profile: NB stream vs batch per-iteration decomposition (round 4)."""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

from ldpcsimulation_tpu.channel.awgn import snr_to_n0
from ldpcsimulation_tpu.channel.nb import symbol_priors
from ldpcsimulation_tpu.codes import build_code, load_alist
from ldpcsimulation_tpu.decoders.nb_qspa import decode_nb_qspa, nb_qspa_machine

P = "/root/reference/SystemC/NB-LDPC/codes/GF4/q4.sp.9000.6000.4500.1"
code = build_code(load_alist(P))
q = code.q
m_bits = 2
B = 512
rate = (code.n - code.m) / code.n
n0 = float(snr_to_n0(2.2, rate))
sigma = float((n0 / 2.0) ** 0.5)
M = nb_qspa_machine(code, q, jnp.float32, jnp.float16)
key = jax.random.key(0)


def timed(fn, reps=3):
    jax.block_until_ready(fn(jax.random.key(99)))
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(jax.random.fold_in(key, i)))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def marginal(make, lo=4, hi=16):
    return (timed(make(hi)) - timed(make(lo))) / (hi - lo)


def mk_pri(k):
    y = 1.0 + sigma * jax.random.normal(k, (B, code.n, m_bits), jnp.float32)
    return symbol_priors(y, n0, q)


def batch_fixed(R):
    @jax.jit
    def run(k):
        pri = mk_pri(k)
        res = decode_nb_qspa(code, pri, R, early_termination=False,
                             storage_dtype=jnp.float16)
        return jnp.sum(res.symbols)
    return run


def batch_et(R):
    @jax.jit
    def run(k):
        pri = mk_pri(k)
        res = decode_nb_qspa(code, pri, R, early_termination=True,
                             storage_dtype=jnp.float16)
        return jnp.sum(res.symbols)
    return run


def chain(fn, mk, R):
    @jax.jit
    def run(k):
        x = mk(k)
        def body(i, v):
            out = fn(v)
            # keep a data dependency without changing shapes
            return v * 0.999 + 0.001 * out.astype(v.dtype).reshape(v.shape).mean()
        return jnp.sum(jax.lax.fori_loop(0, R, body, x))
    return run


# component chains with proper data dependencies
lp0 = None


def mk_v2c(k):
    pri = mk_pri(k)
    lp = M["log_of"](jnp.moveaxis(pri, 0, -1))
    return M["init"](lp)


def cn_chain(R):
    @jax.jit
    def run(k):
        v2c = mk_v2c(k)
        def body(i, v):
            c2v = M["cn_update"](v)
            return v + 0.0 * c2v.mean().astype(v.dtype)
        return jnp.sum(jax.lax.fori_loop(0, R, body, v2c))
    return run


def full_iter_chain(R):
    @jax.jit
    def run(k):
        pri = mk_pri(k)
        lp = M["log_of"](jnp.moveaxis(pri, 0, -1))
        v2c = M["init"](lp)
        def body(i, v):
            c2v = M["cn_update"](v)
            v2, post = M["vn_update"](c2v, lp)
            return v2
        return jnp.sum(jax.lax.fori_loop(0, R, body, v2c))
    return run


def full_plus_syn(R):
    @jax.jit
    def run(k):
        pri = mk_pri(k)
        lp = M["log_of"](jnp.moveaxis(pri, 0, -1))
        v2c = M["init"](lp)
        sym0 = M["decide"](lp)
        def body(i, carry):
            v, sym = carry
            c2v = M["cn_update"](v)
            v2, post = M["vn_update"](c2v, lp)
            sym = M["decide"](post)
            ok = M["syndrome_ok"](sym)
            return (v2 + 0.0 * ok.sum().astype(v2.dtype), sym)
        v, sym = jax.lax.fori_loop(0, R, body, (v2c, sym0))
        return jnp.sum(v)
    return run


def prep_chain(R):
    @jax.jit
    def run(k):
        rows = 1.0 + sigma * jax.random.normal(
            k, (B, code.n * m_bits), jnp.float32)
        def body(i, r):
            y = r.reshape(B, code.n, m_bits)
            pri = symbol_priors(y, n0, q)
            lp = M["log_of"](jnp.moveaxis(pri, 0, -1))
            return r + 0.0 * lp.mean()
        return jnp.sum(jax.lax.fori_loop(0, R, body, rows))
    return run


for name, make in [
    ("batch fixed-T", batch_fixed),
    ("batch ET", batch_et),
    ("cn_update only", cn_chain),
    ("cn+vn (fixed iter)", full_iter_chain),
    ("cn+vn+decide+syndrome", full_plus_syn),
    ("prep (priors+log)", prep_chain),
]:
    per = marginal(make)
    print(f"{name:26s} {per*1e3:8.2f} ms/iter @B={B}", flush=True)
