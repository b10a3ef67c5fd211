"""TPU: NB stream throughput on the real GF(4)/GF(8) codes + int_scan probe."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

from ldpcsimulation_tpu.channel.awgn import snr_to_n0
from ldpcsimulation_tpu.codes import build_code, load_alist
from ldpcsimulation_tpu.harness.stream import (
    build_channel_pool_nb,
    make_stream_call,
    nb_qspa_stream,
    stream_init,
)

p = argparse.ArgumentParser()
p.add_argument("--which", default="gf4")
p.add_argument("--lanes", type=int, default=512)
p.add_argument("--refill", type=int, default=1)
p.add_argument("--rounds", type=int, default=48)
p.add_argument("--T", type=int, default=20)
p.add_argument("--avg", type=float, default=6.0)
p.add_argument("--repeats", type=int, default=4)
args = p.parse_args()

if args.which == "int16":
    # flagship int_scan probe: fixed T=10 min-sum QC f16, int vs float scan
    from ldpcsimulation_tpu.channel.awgn import awgn, snr_to_sigma
    from ldpcsimulation_tpu.codes.library import load_named_qc
    from ldpcsimulation_tpu.decoders.minsum_qc import decode_minsum_qc

    qc = load_named_qc("qc_1008_504")
    sigma = float(snr_to_sigma(2.0, 0.5))
    b, rounds = 32768, 16

    for int_scan in (False, True):
        @jax.jit
        def mega(key, flag=int_scan):
            def body(i, acc):
                kr = jax.random.fold_in(key, i)
                y = awgn(kr, jnp.ones((b, qc.n), jnp.float32), sigma)
                r = decode_minsum_qc(
                    qc, y, 10, storage_dtype=jnp.float16, int_scan=flag
                )
                return acc + jnp.sum(r.hard != 1).astype(jnp.float32)
            return jax.lax.fori_loop(0, rounds, body, jnp.float32(0))

        key = jax.random.key(0)
        e0 = float(mega(key))
        ts = []
        for i in range(args.repeats):
            t0 = time.perf_counter()
            e = float(mega(jax.random.fold_in(key, i + 1)))
            ts.append(time.perf_counter() - t0)
        mbps = b * rounds * 504 / min(ts) / 1e6
        print(f"RESULT int_scan={int_scan}: min {min(ts)*1e3:.0f} ms, "
              f"{mbps:.1f} Mbit/s (errs {e:.0f})", flush=True)
    sys.exit(0)

PATHS = {
    "gf4": ("/root/reference/SystemC/NB-LDPC/codes/GF4/q4.sp.9000.6000.4500.1", 2.2),
    "gf8": ("/root/reference/SystemC/NB-LDPC/codes/GF8/q8.sp.6000.4000.3000.1", 2.4),
}
path, snr = PATHS[args.which]
code = build_code(load_alist(path))
q = code.q
m_bits = q.bit_length() - 1
rate = (code.n - code.m) / code.n
k_info = (code.n - code.m) * m_bits
n0 = float(snr_to_n0(snr, rate))
sigma = float((n0 / 2.0) ** 0.5)

F = args.lanes + int(args.lanes * args.rounds * args.refill / args.avg)
width = code.n * m_bits
print(f"# {args.which} lanes={args.lanes} K={args.refill} "
      f"rounds={args.rounds} pool={F} ({F*width*2/1e6:.0f} MB f16)",
      flush=True)

dec = nb_qspa_stream(code, n0, q, storage_dtype=jnp.float16)
root = jax.random.key(0)
state = stream_init(dec, args.lanes, width, jnp.float16)
call = make_stream_call(dec, code.n, args.T, args.rounds, args.refill,
                        max_weight=width)


@jax.jit
def pool_fn(base):
    return build_channel_pool_nb(
        dec, root, base, F, code.n, q, sigma, pool_dtype=jnp.float16
    )


base = 0
pool, unc, sat0 = pool_fn(jnp.int32(base))
state, acc, _ = call(state, pool, unc, sat0, jnp.int32(base))
a = jax.device_get(acc)
base += int(a["consumed"])
print(f"# warm: frames={int(a['frames'])} "
      f"avg_it={int(a['iter_sum'])/max(int(a['frames']),1):.2f} "
      f"ser={int(a['errs2'])/(max(int(a['frames']),1)*code.n):.4g}",
      flush=True)
best = 0.0
for i in range(args.repeats):
    t0 = time.perf_counter()
    pool, unc, sat0 = pool_fn(jnp.int32(base))
    state, acc, _ = call(state, pool, unc, sat0, jnp.int32(base))
    a = jax.device_get(acc)
    dt = time.perf_counter() - t0
    base += int(a["consumed"])
    mbps = int(a["frames"]) * k_info / dt / 1e6
    best = max(best, mbps)
    print(f"#   call {i}: {dt*1e3:.0f} ms, {int(a['frames'])} frames, "
          f"{mbps:.1f} Mbit/s", flush=True)
print(f"RESULT {args.which} lanes={args.lanes} K={args.refill}: "
      f"best {best:.1f} Mbit/s", flush=True)
