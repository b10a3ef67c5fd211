"""Component-level profile of decode_nb_qspa on the real GF(4) code (chip).

Methodology: every measurement is an on-device lax.fori_loop over R
repetitions of the component (chained through a data dependency), timed
as the marginal between R_hi and R_lo repetitions — the tunnel's ~25-40
ms dispatch floor and the result cache make naive per-call timing
meaningless (CLAUDE.md).
"""
import functools
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

from ldpcsimulation_tpu.codes import build_code, load_alist
from ldpcsimulation_tpu.codes.gf import gf_tables
from ldpcsimulation_tpu.channel.nb import symbol_priors
from ldpcsimulation_tpu.channel.awgn import snr_to_n0
from ldpcsimulation_tpu.decoders.nb_qspa import decode_nb_qspa, _gf2m_wht

P = "/root/reference/SystemC/NB-LDPC/codes/GF4/q4.sp.9000.6000.4500.1"
code = build_code(load_alist(P))
q = code.q
m_bits = q.bit_length() - 1
B = 512
rate = (code.n - code.m) / code.n
n0 = float(snr_to_n0(2.2, rate))
sig = float((n0 / 2) ** 0.5)
print(f"n={code.n} m={code.m} q={q} dv_max={code.dv_max} dc_max={code.dc_max} "
      f"edges={int(np.sum(np.asarray(code.cn_mask)))} B={B}")

key = jax.random.key(0)


def timed(fn, *args, reps=3):
    jax.block_until_ready(fn(jax.random.key(99), *args))  # compile+warm
    ts = []
    for i in range(reps):
        k = jax.random.fold_in(key, i + 1)
        t0 = time.perf_counter()
        jax.block_until_ready(fn(k, *args))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


# ---- full decode: per-iteration marginal via fixed-T difference
def decode_t(k, T):
    pri = symbol_priors(
        1.0 + sig * jax.random.normal(k, (B, code.n, m_bits), jnp.float32),
        n0, q)
    r = decode_nb_qspa(code, pri, num_iterations=T, early_termination=False)
    return jnp.sum(r.symbols)

d4 = timed(jax.jit(functools.partial(decode_t, T=4)))
d24 = timed(jax.jit(functools.partial(decode_t, T=24)))
per_iter = (d24 - d4) / 20
print(f"decode fixed T=4: {d4*1e3:.1f} ms   T=24: {d24*1e3:.1f} ms   "
      f"-> per-iteration {per_iter*1e3:.2f} ms")

# ---- components, chained R times inside one jit
slots_v = code.n * code.dv_max
slots_c = code.m * code.dc_max
mul_np, inv_np = gf_tables(q)
mul = jnp.asarray(mul_np)
inv = jnp.asarray(inv_np)
h_cn = np.asarray(code.cn_coef).reshape(-1)
pre_idx = jnp.asarray(mul_np[inv_np[h_cn]])
cn_gather = jnp.asarray(np.asarray(code.cn_from_vn).reshape(-1))
vn_gather = jnp.asarray(np.asarray(code.vn_from_cn).reshape(-1))

mk_v = lambda k: jax.random.uniform(k, (slots_v, q, B), jnp.float32) + 0.5
mk_c = lambda k: jax.random.uniform(k, (slots_c, q, B), jnp.float32) + 0.5


def roundtrip_gather(x):  # [slots_v,q,B] -> [slots_v,q,B]: both gathers
    return jnp.take(jnp.take(x, cn_gather, axis=0), vn_gather, axis=0)


def qperm(g):  # [slots_c,q,B]
    return jnp.take_along_axis(g, pre_idx[:, :, None], axis=1)


def wht_move(g):  # [slots_c,q,B], current moveaxis form
    return jnp.moveaxis(_gf2m_wht(jnp.moveaxis(g, 1, -1)), -1, 1)


def wht_axis1(g):  # butterflies along axis 1, B stays minor
    s, qq, b = g.shape
    m = qq.bit_length() - 1
    x = g
    for i in range(m):
        x = x.reshape(s, qq >> (i + 1), 2, (1 << i), b)
        a = x[:, :, 0]
        c = x[:, :, 1]
        x = jnp.stack([a + c, a - c], axis=2).reshape(s, qq, b)
    return x


def prefsuf(g):  # [slots_c,q,B] products with exclusion over dc axis
    f4 = g.reshape(code.m, code.dc_max, q, B)
    ones = jnp.ones((code.m, q, B), f4.dtype)
    pre = [ones]
    for t in range(code.dc_max - 1):
        pre.append(pre[-1] * f4[:, t])
    suf = [ones]
    for t in range(code.dc_max - 1, 0, -1):
        suf.append(suf[-1] * f4[:, t])
    suf.reverse()
    return jnp.stack([pre[t] * suf[t] for t in range(code.dc_max)],
                     axis=1).reshape(slots_c, q, B)


def vn_prefsuf(g):  # [slots_v,q,B] log-sum exclusion over dv axis
    lg = g.reshape(code.n, code.dv_max, q, B)
    zeros = jnp.zeros((code.n, q, B), lg.dtype)
    pre = [zeros]
    for s in range(code.dv_max - 1):
        pre.append(pre[-1] + lg[:, s])
    suf = [zeros]
    for s in range(code.dv_max - 1, 0, -1):
        suf.append(suf[-1] + lg[:, s])
    suf.reverse()
    return jnp.stack([pre[s] + suf[s] for s in range(code.dv_max)],
                     axis=1).reshape(slots_v, q, B)


def chain(fn, mk, R):
    @jax.jit
    def run(k):
        x0 = mk(k)
        def body(i, x):
            # renormalize cheaply to keep values finite across reps
            return fn(x) * (1.0 / (1.0 + jnp.float32(0) * i)) * 0.9 + 0.1
        x = jax.lax.fori_loop(0, R, body, x0)
        return jnp.sum(x[0])
    return run

R_LO, R_HI = 4, 24
for name, fn, mk, nbytes in [
    ("gather roundtrip (cn+vn)", roundtrip_gather, mk_v,
     (slots_v + slots_c) * q * B * 4 * 2),
    ("q-perm take_along_axis", qperm, mk_c, slots_c * q * B * 4 * 2),
    ("WHT (moveaxis form)", wht_move, mk_c, slots_c * q * B * 4 * 2),
    ("WHT (axis-1 form)", wht_axis1, mk_c, slots_c * q * B * 4 * 2),
    ("CN prefix/suffix excl", prefsuf, mk_c, slots_c * q * B * 4 * 2),
    ("VN log prefix/suffix", vn_prefsuf, mk_v, slots_v * q * B * 4 * 2),
    ("softmax axis1", lambda x: jax.nn.softmax(x, axis=1), mk_v,
     slots_v * q * B * 4 * 2),
    ("log", lambda x: jnp.log(jnp.abs(x) + 1e-30), mk_v,
     slots_v * q * B * 4 * 2),
]:
    tlo = timed(chain(fn, mk, R_LO))
    thi = timed(chain(fn, mk, R_HI))
    per = (thi - tlo) / (R_HI - R_LO)
    print(f"{name:28s} {per*1e3:7.3f} ms/rep  ({nbytes/per/1e9:6.0f} GB/s eff)")
