"""TPU tuning run for the streaming refill harness (not part of the suite).

Measures retired-frames info throughput for min-sum/BP QC ET on
(1008,504) @ 2 dB across (lanes, refill_every) — pool build included in
the measured time (it IS the channel generation of the pipeline).
"""

import argparse
import os
import statistics  # noqa: F401
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

from ldpcsimulation_tpu.channel.awgn import llr_from_channel, snr_to_n0, snr_to_sigma
from ldpcsimulation_tpu.codes.library import load_named_qc
from ldpcsimulation_tpu.harness.stream import (
    build_channel_pool,
    bp_qc_stream,
    make_stream_call,
    minsum_qc_stream,
    stream_init,
)

p = argparse.ArgumentParser()
p.add_argument("--dec", default="minsum")
p.add_argument("--lanes", type=int, default=8192)
p.add_argument("--refill", type=int, default=1)
p.add_argument("--rounds", type=int, default=64)
p.add_argument("--T", type=int, default=30)
p.add_argument("--avg", type=float, default=10.0)
p.add_argument("--f16pool", action="store_true")
p.add_argument("--repeats", type=int, default=5)
args = p.parse_args()

qc = load_named_qc("qc_1008_504")
k_info = qc.n - qc.m
snr, rate = 2.0, 0.5
sigma = float(snr_to_sigma(snr, rate))
n0 = float(snr_to_n0(snr, rate))

if args.dec == "minsum":
    dec = minsum_qc_stream(qc, storage_dtype=jnp.float16)
    pre = None
else:
    dec = bp_qc_stream(qc, storage_dtype=jnp.float16)
    pre = lambda y: llr_from_channel(y, n0)  # noqa: E731

iters_per_call = args.rounds * args.refill
F = args.lanes + int(args.lanes * iters_per_call / args.avg)
print(f"# lanes={args.lanes} K={args.refill} rounds={args.rounds} "
      f"T={args.T} pool={F} ({F*qc.n*4/1e6:.0f} MB)")

root = jax.random.key(0)
pdt = jnp.float16 if args.f16pool else jnp.float32
state = stream_init(dec, args.lanes, qc.n, pdt)
call = make_stream_call(dec, qc.n, args.T, args.rounds, args.refill)


@jax.jit
def pool_fn(base):
    return build_channel_pool(dec, root, base, F, qc.n, sigma, pre,
                              pool_dtype=pdt if args.f16pool else None)


base = 0
# warm/compile
pool, unc, sat0 = pool_fn(jnp.int32(base))
state, acc, _ = call(state, pool, unc, sat0, jnp.int32(base))
a = jax.device_get(acc)
base += int(a["consumed"])
print(f"# warm: frames={int(a['frames'])} consumed={int(a['consumed'])} "
      f"avg_it={int(a['iter_sum'])/max(int(a['frames']),1):.2f}")

ts, fr = [], []
for i in range(args.repeats):
    t0 = time.perf_counter()
    pool, unc, sat0 = pool_fn(jnp.int32(base))
    state, acc, _ = call(state, pool, unc, sat0, jnp.int32(base))
    a = jax.device_get(acc)
    dt = time.perf_counter() - t0
    base += int(a["consumed"])
    ts.append(dt)
    fr.append(int(a["frames"]))
    print(f"#   call {i}: {dt*1e3:.0f} ms, {a['frames']} frames, "
          f"ber={int(a['bit_errs'])/(int(a['frames'])*qc.n):.4g}")

med_i = sorted(range(len(ts)), key=lambda i: ts[i])[len(ts) // 2]
mbps_med = fr[med_i] * k_info / ts[med_i] / 1e6
best = max(f * k_info / t / 1e6 for f, t in zip(fr, ts))
print(f"RESULT {args.dec} lanes={args.lanes} K={args.refill}: "
      f"median {mbps_med:.1f} Mbit/s (best {best:.1f})")
