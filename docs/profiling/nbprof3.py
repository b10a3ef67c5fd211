"""Race combine variants for the fused perm+WHT, GF(4) real code (chip)."""
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

from ldpcsimulation_tpu.codes import build_code, load_alist
from ldpcsimulation_tpu.decoders.nb_qspa import (
    _signed_combine, _wht_sign_tables)

P = "/root/reference/SystemC/NB-LDPC/codes/GF4/q4.sp.9000.6000.4500.1"
code = build_code(load_alist(P))
q = code.q
B = 512
key = jax.random.key(0)
slots_c = code.m * code.dc_max
h_cn = np.asarray(code.cn_coef).reshape(-1)
fwd_np, _ = _wht_sign_tables(q)
sgn_fwd = jnp.asarray(fwd_np)[jnp.asarray(h_cn)]  # [slots, q, q]
classes = sorted(set(int(h) for h in h_cn if h != 0))
print("classes:", classes, "counts:",
      [(c, int((h_cn == c).sum())) for c in classes])
class_masks = [jnp.asarray((h_cn == c))[:, None, None] for c in classes]

mk_c = lambda k: jax.random.uniform(k, (slots_c, q, B), jnp.float32) + 0.5


def timed(fn, reps=3):
    jax.block_until_ready(fn(jax.random.key(99)))
    ts = []
    for i in range(reps):
        k = jax.random.fold_in(key, i + 1)
        t0 = time.perf_counter()
        jax.block_until_ready(fn(k))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def chain(fn, R):
    @jax.jit
    def run(k):
        x0 = mk_c(k)
        def body(i, x):
            return fn(x) * 0.9 + 0.1
        x = jax.lax.fori_loop(0, R, body, x0)
        return jnp.sum(x[0])
    return run


def v_current(x):
    return _signed_combine(sgn_fwd, x)


def v_einsum(x):
    return jnp.einsum("swc,scb->swb", sgn_fwd, x)


def _static_combine(h, x):
    # y[w] = sum_c fwd_np[h, w, c] * x[c], signs are compile-time +-1
    cols = []
    for w in range(q):
        acc = None
        for c in range(q):
            s = float(fwd_np[h, w, c])
            t = x[:, c] if s > 0 else -x[:, c]
            acc = t if acc is None else acc + t
        cols.append(acc)
    return jnp.stack(cols, axis=1)


def v_class_select(x):
    out = _static_combine(classes[0], x)
    for c, m in zip(classes[1:], class_masks[1:]):
        out = jnp.where(m, _static_combine(c, x), out)
    return out


def v_dot(x):
    # dot_general with batch dim = slots
    return jax.lax.dot_general(
        sgn_fwd, x, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


for name, fn in [
    ("broadcast-unroll (current)", v_current),
    ("einsum swc,scb", v_einsum),
    ("static-class + select", v_class_select),
    ("dot_general batched", v_dot),
]:
    tlo = timed(chain(fn, 4))
    thi = timed(chain(fn, 24))
    per = (thi - tlo) / 20
    print(f"{name:28s} {per*1e3:7.3f} ms/rep", flush=True)

# correctness cross-check
x = mk_c(jax.random.key(7))
r0 = v_current(x)
for name, fn in [("einsum", v_einsum), ("class", v_class_select),
                 ("dot", v_dot)]:
    d = float(jnp.max(jnp.abs(fn(x) - r0)))
    print(f"max|{name} - current| = {d:.2e}")
