"""Post-fusion component profile of decode_nb_qspa, GF(4) real code (chip)."""
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

from ldpcsimulation_tpu.codes import build_code, load_alist
from ldpcsimulation_tpu.codes.gf import gf_tables
from ldpcsimulation_tpu.decoders.nb_qspa import (
    _signed_combine, _wht_sign_tables)

P = "/root/reference/SystemC/NB-LDPC/codes/GF4/q4.sp.9000.6000.4500.1"
code = build_code(load_alist(P))
q = code.q
m_bits = q.bit_length() - 1
B = 512
key = jax.random.key(0)

slots_v = code.n * code.dv_max
slots_c = code.m * code.dc_max
h_cn = np.asarray(code.cn_coef).reshape(-1)
fwd_np, inv_np_t = _wht_sign_tables(q)
sgn_fwd = jnp.asarray(fwd_np)[jnp.asarray(h_cn)]
cn_gather = jnp.asarray(np.asarray(code.cn_from_vn).reshape(-1))
vn_gather = jnp.asarray(np.asarray(code.vn_from_cn).reshape(-1))
cn_vn = jnp.asarray(np.asarray(code.cn_vn).reshape(-1))

mk_v = lambda k: jax.random.uniform(k, (slots_v, q, B), jnp.float32) + 0.5
mk_c = lambda k: jax.random.uniform(k, (slots_c, q, B), jnp.float32) + 0.5
mk_sym = lambda k: jax.random.randint(k, (code.n, B), 0, q, jnp.int32)


def timed(fn, reps=3):
    jax.block_until_ready(fn(jax.random.key(99)))
    ts = []
    for i in range(reps):
        k = jax.random.fold_in(key, i + 1)
        t0 = time.perf_counter()
        jax.block_until_ready(fn(k))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def chain(fn, mk, R, scalar=False):
    @jax.jit
    def run(k):
        x0 = mk(k)
        def body(i, x):
            y = fn(x)
            if scalar:
                return x * 0.9 + 0.1 + y.astype(x.dtype).mean() * 1e-9
            return y * 0.9 + 0.1
        x = jax.lax.fori_loop(0, R, body, x0)
        return jnp.sum(x[0].astype(jnp.float32))
    return run


def normalize(x):
    return x / jnp.maximum(jnp.sum(x, axis=1, keepdims=True), 1e-30)


def softmax_q(x):
    return jax.nn.softmax(x, axis=1)


def exp_sub_max(x):
    return jnp.exp(x - jnp.max(x, axis=1, keepdims=True))


def decide(x):  # argmax over q -> int32 [n, B]; chain needs same shape out
    d = jnp.argmax(x.reshape(code.n, code.dv_max, q, B)[:, 0], axis=1)
    return x + d[:, None, None].astype(x.dtype) * 1e-9


# bit-plane syndrome from nb_qspa (rebuilt here on [n,B] symbols)
mul_np, _ = gf_tables(q)
mul = jnp.asarray(mul_np)
mcols = [mul[jnp.asarray(h_cn), 1 << i] for i in range(m_bits)]
mconst = jnp.stack(
    [jnp.stack([(mcols[i] >> j) & 1 for i in range(m_bits)], axis=-1)
     for j in range(m_bits)], axis=-2)
syn_mask = jnp.asarray(code.cn_mask).reshape(-1).astype(jnp.int32)[:, None]


def syndrome(symbols):
    s = jnp.take(symbols, cn_vn, axis=0)
    sbits = [(s >> i) & 1 for i in range(m_bits)]
    hs = jnp.zeros_like(s)
    for j in range(m_bits):
        bit = jnp.zeros_like(s)
        for i in range(m_bits):
            bit = jnp.bitwise_xor(bit, sbits[i] * mconst[:, j, i][:, None])
        hs = hs | (bit << j)
    hs = hs * syn_mask
    hs = hs.reshape(code.m, code.dc_max, B)
    acc = jnp.zeros((code.m, B), jnp.int32)
    for t in range(code.dc_max):
        acc = jnp.bitwise_xor(acc, hs[:, t])
    return jnp.all(acc == 0, axis=0)


def syn_chain(R):
    @jax.jit
    def run(k):
        s0 = mk_sym(k)
        def body(i, s):
            ok = syndrome(s)
            return (s + ok.astype(jnp.int32)[None, :]) % q
        return jnp.sum(jax.lax.fori_loop(0, R, body, s0))
    return run


R_LO, R_HI = 4, 24
rows = [
    ("fused combine (sgn)", lambda x: _signed_combine(sgn_fwd, x), mk_c),
    ("normalize (sum+div)", normalize, mk_c),
    ("softmax axis1", softmax_q, mk_v),
    ("exp(x - max)", exp_sub_max, mk_v),
    ("decide argmax chain", decide, mk_v),
]
for name, fn, mk in rows:
    tlo = timed(chain(fn, mk, R_LO))
    thi = timed(chain(fn, mk, R_HI))
    per = (thi - tlo) / (R_HI - R_LO)
    print(f"{name:26s} {per*1e3:7.3f} ms/rep", flush=True)

tlo = timed(syn_chain(R_LO))
thi = timed(syn_chain(R_HI))
print(f"{'syndrome_ok':26s} {(thi-tlo)/(R_HI-R_LO)*1e3:7.3f} ms/rep", flush=True)
