"""Scratch TPU micro-benchmark: dense MXU vs generic gather graph ops on the
real 802.3an H (NGDBFhw + SM-NGDBF).  Not part of the package — measurement
artifact for PERF.md."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from ldpcsimulation_tpu.codes import build_code, load_alist
from ldpcsimulation_tpu.decoders.dense_ops import DenseGraph
from ldpcsimulation_tpu.decoders.gdbf import decode_gdbf, preset
from ldpcsimulation_tpu.decoders.ngdbf_hw import NGDBFHwConfig, decode_ngdbf_hw


def timed(fn, key, reps=6):
    # vary inputs (fold_in) to defeat tunnel result caching; sync by scalar
    ts = []
    for i in range(reps):
        k = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        out = fn(k)
        _ = int(out)  # force full sync through the tunnel
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    print("device:", jax.devices()[0])
    code = build_code(
        load_alist("/root/reference/C_implementations/codes/802_3/802_3_H.alist")
    )
    dg = DenseGraph.from_code(code)
    B = 1024
    T = 100
    sigma = 0.18

    key = jax.random.key(0)

    @jax.jit
    def frames(k):
        y = 1.0 + sigma * jax.random.normal(k, (B, code.n), jnp.float32)
        return y

    hw_cfg = NGDBFHwConfig(num_iterations=T, max_phases=1,
                           ring_len=max(2648, code.n + 600))

    def hw_generic(k):
        y = frames(k)
        r = decode_ngdbf_hw(code, y, sigma, hw_cfg, key=k)
        return jnp.sum(r.iterations)

    def hw_dense(k):
        y = frames(k)
        r = decode_ngdbf_hw(code, y, sigma, hw_cfg, key=k, dense=dg)
        return jnp.sum(r.iterations)

    g_cfg = preset("SMNGDBF", num_iterations=T, theta=-0.6, alpha=0.75)

    def g_generic(k):
        y = frames(k)
        r = decode_gdbf(code, y, sigma, g_cfg, key=k)
        return jnp.sum(r.iterations)

    def g_dense(k):
        y = frames(k)
        r = decode_gdbf(code, y, sigma, g_cfg, key=k, dense=dg)
        return jnp.sum(r.iterations)

    for name, fn in [
        ("ngdbfhw generic", hw_generic),
        ("ngdbfhw dense", hw_dense),
        ("smngdbf generic", g_generic),
        ("smngdbf dense", g_dense),
    ]:
        t = timed(jax.jit(fn), key)
        bits = B * code.n * 0.8413
        print(
            f"{name:18s} {t*1e3:8.1f} ms/batch  "
            f"{bits / t / 1e6:8.1f} Mbit/s info (T={T} cap)"
        )


if __name__ == "__main__":
    main()
