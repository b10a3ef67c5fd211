"""Benchmark: decoded info bits/s/chip, min-sum T=10 on the (1008, 504) code.

This is the BASELINE metric configuration (BASELINE.md): the full pipeline —
codeword batch, BPSK, AWGN at 2 dB Eb/N0, 10 fixed min-sum iterations,
hard-decision error counting — on one chip.  The reference publishes no
throughput numbers (it never times anything), so vs_baseline is measured
against the north-star target of 5e8 bits/s on v5e-16, i.e. 3.125e7
bits/s/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--iterations", type=int, default=10)
    p.add_argument("--snr-db", type=float, default=2.0)
    p.add_argument("--repeats", type=int, default=10)
    p.add_argument("--kernel", choices=["auto", "pallas", "xla"], default="auto")
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args()

    from ldpcsimulation_tpu.channel.awgn import awgn, snr_to_sigma
    from ldpcsimulation_tpu.codes.library import load_named_qc
    from ldpcsimulation_tpu.decoders.minsum_qc import decode_minsum_qc

    # QC (1008,504) + gather-free decoder with f16 message storage / f32
    # arithmetic: BER statistically identical to full-f32 (see
    # decoders/minsum_qc.py), ~2.4x the generic gather-based path.
    qc = load_named_qc("qc_1008_504")
    k = qc.n - qc.m  # 504 info bits per frame
    sigma = float(snr_to_sigma(args.snr_db, k / qc.n))
    b = args.batch

    @jax.jit
    def step(key):
        y = awgn(key, jnp.ones((b, qc.n), jnp.float32), sigma)
        res = decode_minsum_qc(
            qc, y, num_iterations=args.iterations, storage_dtype=jnp.float16
        )
        # force the full decode: per-frame error counts vs the all-zero cw
        return jnp.sum(res.hard != 1, axis=1)

    key = jax.random.key(0)
    # warmup / compile
    jax.block_until_ready(step(key))
    jax.block_until_ready(step(jax.random.fold_in(key, 1)))

    t0 = time.perf_counter()
    for i in range(args.repeats):
        out = step(jax.random.fold_in(key, 2 + i))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    frames_per_s = b * args.repeats / dt
    bits_per_s = frames_per_s * k
    target_per_chip = 5e8 / 16.0  # north-star: 5e8 bits/s on v5e-16
    if args.verbose:
        print(
            f"# device={jax.devices()[0]}, {frames_per_s:.0f} frames/s, "
            f"{dt / args.repeats * 1e3:.2f} ms/batch of {b}",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "metric": (
                    "decoded info bits/s/chip, min-sum T="
                    f"{args.iterations} on (1008,504) @ {args.snr_db} dB"
                ),
                "value": round(bits_per_s, 1),
                "unit": "bits/s",
                "vs_baseline": round(bits_per_s / target_per_chip, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
