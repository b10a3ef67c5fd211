"""Mesh-parallel Monte-Carlo driver: many operating points, many devices.

Drives :func:`.mesh.make_counters_step` until every SNR point satisfies the
reference stopping rule (errors >= A and word errors >= B, evaluated on the
psum-reduced global counters), building one :class:`..harness.MCStats` per
point.  This is the whole-sweep replacement for the reference's
one-process-per-operating-point bash fan-out: a single program, a single
device mesh, collectives instead of shared log files.

Converged points keep decoding until the last point finishes (their lanes
add statistical precision rather than idling — the mesh shape is static).
"""

from __future__ import annotations

import time
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..channel.awgn import snr_to_sigma
from ..codes.code import Code
from ..harness.montecarlo import MCStats, StopRule, default_min_word_errors
from .mesh import make_counters_step, make_grid_step

__all__ = [
    "simulate_distributed",
    "simulate_grid",
    "measure_scaling_efficiency",
]


def _accumulate(s: MCStats, out: dict, i: int, batch_global: int,
                bits_global: int) -> None:
    """Fold slot ``i`` of one step's psum-reduced counters into ``s``."""
    s.errors += int(out["errors"][i])
    s.uncoded_errors += int(out["uncoded_errors"][i])
    s.word_errors += int(out["word_errors"][i])
    # frame/bit totals are deterministic per step (int32-overflow-safe
    # accumulation happens here on the host, in Python ints)
    s.total_words += batch_global
    s.total_bits += bits_global
    s.total_iterations += int(out["iteration_sum"][i])
    s.satisfied_words += int(out["satisfied_words"][i])
    # hist[0] of the on-device error-weight histogram counts error-free
    # frames; the MCStats histogram indexes weight w-1
    s.error_weight_hist += np.asarray(out["error_weight_hist"][i][1:],
                                      np.int64)
    s.iteration_hist += np.asarray(out["iteration_hist"][i], np.int64)
    if "smoothing_used" in out:
        s.extra["smoothing_used"] = s.extra.get("smoothing_used", 0) + int(
            out["smoothing_used"][i]
        )


def simulate_grid(
    code: Code,
    decode_fn: Callable,
    points: Sequence[dict],
    mesh,
    max_iterations: int,
    rate: Optional[float] = None,
    stop: Optional[StopRule] = None,
    batch_per_device: int = 512,
    seed: int = 0,
    preprocess: Optional[Callable] = None,
    param_names: Sequence[str] = (),
    max_rounds: int = 100000,
    verbose: bool = False,
    codewords=None,
) -> List[MCStats]:
    """Run an arbitrary operating-point grid through one compiled step.

    This is the whole-grid replacement for the reference's
    one-process-per-parameter-combination bash fan-out
    (``mngdbf_example_PEGReg504x1008.sh:44-59`` — ~1300 concurrent
    processes): the full cartesian grid is scheduled in chunks of S points
    (S = the mesh operating-point axis size) over ONE jitted step whose
    per-slot sigma and decoder scalars are traced inputs — no recompile
    between chunks, adaptive per-point stopping, psum-reduced statistics.

    points: dicts with key "snr" plus every name in ``param_names``.
    decode_fn(y [b,N], sigma, key, point) with ``point`` a dict of traced
    scalars; preprocess(y, point) if given.

    Scheduling: each round fills the S mesh slots with the unfinished
    points (cycling — a point may occupy several slots, which simply adds
    statistical precision; slot RNG streams are decorrelated by the mesh
    coordinate fold).  Points leave the rotation when the stop rule passes
    on their accumulated counters.  Returns one MCStats per input point
    (wall_seconds is the shared grid time).
    """
    rate = code.rate if rate is None else rate
    stop = stop or StopRule(min_word_errors=default_min_word_errors(code.n))
    if max_iterations <= 0:
        raise ValueError("max_iterations must bound the decoder's T")
    param_names = tuple(param_names)
    for p in points:
        missing = {"snr", *param_names} - set(p)
        if missing:
            raise ValueError(f"grid point {p} missing {sorted(missing)}")
    step = make_grid_step(
        code,
        decode_fn,
        mesh,
        batch_per_device=batch_per_device,
        max_iterations=max_iterations,
        param_names=param_names,
        preprocess=preprocess,
        codewords=codewords,
    )
    n_slots = mesh.shape["snr"]
    sigma_of = [float(snr_to_sigma(p["snr"], rate)) for p in points]
    stats = [MCStats(n=code.n) for _ in points]
    for s in stats:
        s.iteration_hist = np.zeros(max_iterations + 1, np.int64)

    root = jax.random.key(seed)
    bits = jnp.zeros((n_slots, step.batch_global, code.n), jnp.uint8)
    pending = list(range(len(points)))
    t0 = time.perf_counter()
    for round_idx in range(max_rounds):
        if not pending:
            break
        # fill the S slots by cycling the unfinished points
        slots = [pending[i % len(pending)] for i in range(n_slots)]
        sigmas = np.asarray([sigma_of[i] for i in slots], np.float32)
        params = {
            nm: np.asarray([float(points[i][nm]) for i in slots], np.float32)
            for nm in param_names
        }
        out = jax.device_get(
            step(jax.random.fold_in(root, round_idx), bits, sigmas, params,
                 round_idx)
        )
        for slot, pi in enumerate(slots):
            _accumulate(stats[pi], out, slot, step.batch_global,
                        step.bits_global)
        pending = [
            i for i in pending
            if not stop.done(stats[i].errors, stats[i].word_errors,
                             stats[i].total_words)
        ]
        if verbose:
            print(
                f"round {round_idx}: {len(points) - len(pending)}/"
                f"{len(points)} points done"
            )
    dt = time.perf_counter() - t0
    for s in stats:
        s.wall_seconds = dt
    return stats


def simulate_distributed(
    code: Code,
    decode_fn: Callable,
    snrs_db: Sequence[float],
    mesh,
    rate: Optional[float] = None,
    stop: Optional[StopRule] = None,
    batch_per_device: int = 512,
    max_iterations: int = 0,
    seed: int = 0,
    preprocess: Optional[Callable] = None,
    max_batches: int = 100000,
    verbose: bool = False,
    codewords=None,
) -> List[MCStats]:
    """Run all SNR points of a sweep concurrently on the mesh.

    decode_fn(samples [b, N], sigma, key) -> DecodeResult-like.
    len(snrs_db) must equal the mesh "snr" axis size.  Returns one MCStats
    per SNR point (wall_seconds is the shared sweep time).  ``codewords``:
    optional [L, N] bit fixture, cycled across global frame positions like
    the single-device harness (device-resident gather, not per-round H2D).
    """
    rate = code.rate if rate is None else rate
    stop = stop or StopRule(min_word_errors=default_min_word_errors(code.n))
    sigmas = [float(snr_to_sigma(s, rate)) for s in snrs_db]
    if max_iterations <= 0:
        raise ValueError("max_iterations must bound the decoder's T")
    step = make_counters_step(
        code,
        decode_fn,
        mesh,
        sigmas=sigmas,
        batch_per_device=batch_per_device,
        max_iterations=max_iterations,
        preprocess=preprocess,
        codewords=codewords,
    )
    n_snr = len(sigmas)
    stats = [MCStats(n=code.n) for _ in range(n_snr)]
    for s in stats:
        s.iteration_hist = np.zeros(max_iterations + 1, np.int64)

    root = jax.random.key(seed)
    bits = jnp.zeros((n_snr, step.batch_global, code.n), jnp.uint8)
    t0 = time.perf_counter()
    for batch_idx in range(max_batches):
        done = [
            stop.done(s.errors, s.word_errors, s.total_words) for s in stats
        ]
        if all(done):
            break
        out = jax.device_get(
            step(jax.random.fold_in(root, batch_idx), bits, batch_idx)
        )
        for i, s in enumerate(stats):
            _accumulate(s, out, i, step.batch_global, step.bits_global)
        if verbose:
            line = " ".join(
                f"{snrs_db[i]}dB:{stats[i].ber:.3g}" for i in range(n_snr)
            )
            print(f"batch {batch_idx}: BER {line}")
    dt = time.perf_counter() - t0
    for s in stats:
        s.wall_seconds = dt
    return stats


def measure_scaling_efficiency(
    code: Code,
    decode_fn: Callable,
    snr_db: float,
    device_counts: Sequence[int],
    batch_per_device: int = 512,
    max_iterations: int = 10,
    rate: Optional[float] = None,
    repeats: int = 5,
) -> dict:
    """Throughput (info bits/s) vs device count — the scaling benchmark the
    reference never had (its parallelism was independent OS processes).

    Returns {devices: bits_per_second}; efficiency at n = (T_n / n) / T_1.
    """
    from .mesh import make_mesh

    rate = code.rate if rate is None else rate
    sigma = float(snr_to_sigma(snr_db, rate))
    k = code.k
    results = {}
    for nd in device_counts:
        mesh = make_mesh(n_snr=1, devices=jax.devices()[:nd])
        step = make_counters_step(
            code,
            decode_fn,
            mesh,
            sigmas=[sigma],
            batch_per_device=batch_per_device,
            max_iterations=max_iterations,
        )
        bits = jnp.zeros((1, step.batch_global, code.n), jnp.uint8)
        key = jax.random.key(0)
        jax.block_until_ready(step(key, bits))
        t0 = time.perf_counter()
        out = None
        for i in range(repeats):
            out = step(jax.random.fold_in(key, i), bits)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / repeats
        results[nd] = step.batch_global * k / dt
    return results
