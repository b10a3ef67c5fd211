"""Streaming refill harness for the GDBF/NGDBF bit-flip family.

The batched ``decode_gdbf`` early-termination loop pays the straggler tax
worst of all decoders: the family's iteration caps are the largest in the
reference's operating points (T=100 for SM-NGDBF on PEGReg, T=300-700 for
the DVB-S2 script, ``max_phases``·T for redecode — ``scripts/
ngdbf_example_*.sh``), while converged frames finish in tens of
iterations.  This module extends :mod:`.stream`'s persistent-lane scheme
(retire converged/capped lanes into on-device counters, refill from a
per-frame-keyed channel pool) to decoders with per-iteration RNG.

**Noise keying is per frame, not per batch.**  Frame ``gid``'s
perturbation at its local step ``s`` is a pure function of
``(noise_root, gid, s)`` — ``fold_in`` twice, then exactly the batched
body's transforms (``noise_scale``, variance-matched uniform, first-order
shaping).  This keeps every frame replayable from coordinates alone (the
contract that replaces the reference's GSL state files,
``newstat.cpp:783-791``) and makes per-frame trajectories independent of
lane scheduling.  The batched harness keeps its per-(batch, step) keying
— its C-parity tests pin that — and the two keyings are statistically
identical (iid draws either way).

Bit-exactness is testable against the batched decoder anyway:
:func:`frame_perturbation_sequence` / :func:`frame_stoch_uniforms`
generate a frame's exact stream-keyed sequences for ``decode_gdbf``'s
``perturbations``/``stoch_uniforms`` injection hooks, and
tests/test_stream_gdbf.py asserts per-frame (iterations, errors, phases)
equality across every preset family, refill cadences, and call
boundaries.

Reference semantics preserved exactly (see :mod:`..decoders.gdbf` for the
file:line map): syndrome checked at iteration start defines the reported
count (``decodeGDBF.cpp:300-306``); a frame satisfied at injection
reports 0 iterations; capped frames report ``max_phases·T`` with
``satisfied=False`` even if their final flip fixed them (the check that
would notice never runs); output smoothing substitutes ``sign(Σd)`` only
for frames that end unsatisfied (``:358-367``); redecode phases reset
``d/θ/dsum/mu`` from the channel decisions with fresh noise
(``RNGDBF.cpp:280-308``) while ``noise_prev`` carries across phases as in
the reference's shaping state.
"""

from __future__ import annotations

import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..codes.code import Code
from ..codes.qc import QCCode
from ..decoders.base import syndrome_from_hard
from ..decoders.dense_ops import (
    DenseGraph,
    dense_syndrome_bipolar,
    dense_syndrome_sum_per_vn,
)
from ..decoders.gdbf import GDBFConfig, _syndrome_sum_per_vn, flip_decisions
from ..decoders.qc_ops import qc_syndrome_bipolar, qc_syndrome_sum_per_vn
from . import stream as _stream
from .montecarlo import MCStats, StopRule, default_min_word_errors

__all__ = [
    "gdbf_stream_init",
    "make_gdbf_stream_call",
    "build_channel_pool_gdbf",
    "simulate_stream_gdbf",
    "frame_perturbation_sequence",
    "frame_stoch_uniforms",
]


def _r_of(y_t):
    """Channel hard decisions from (possibly quantized) samples: the
    reference takes sgn BEFORE quantization (decodeGDBF.cpp:259-267);
    signbit recovers the pre-quantization sign of signed zeros exactly
    (see decode_gdbf)."""
    return jnp.where(jnp.signbit(y_t), -1, 1).astype(jnp.int32)


def gdbf_stream_init(
    code: Code, cfg: GDBFConfig, lanes: int, dtype=jnp.float32
):
    """All-idle initial lane state (first boundary fills every lane).

    ``dtype`` is the POOL row dtype (f16 pools halve refill traffic; the
    carried ych is upcast exactly at each iterate)."""
    n = code.n
    total_steps = cfg.max_phases * cfg.num_iterations
    st = dict(
        ych=jnp.zeros((n, lanes), dtype),
        d=jnp.ones((n, lanes), jnp.int32),
        thetas=jnp.zeros((n, lanes), jnp.float32),
        mu=jnp.zeros((lanes,), jnp.int32),
        steps=jnp.zeros((lanes,), jnp.int32),
        its=jnp.full((lanes,), total_steps, jnp.int32),
        phases=jnp.full((lanes,), cfg.max_phases, jnp.int32),
        done=jnp.ones((lanes,), bool),
        idle=jnp.ones((lanes,), bool),
        unc=jnp.zeros((lanes,), jnp.int32),
        gid=jnp.full((lanes,), -1, jnp.int32),
        smooth_used=jnp.zeros((lanes,), jnp.int32),
    )
    if cfg.output_smoothing:
        st["dsum"] = jnp.zeros((n, lanes), jnp.int32)
    if cfg.add_noise and cfg.noise_shaping:
        st["noise_prev"] = jnp.zeros((n, lanes), jnp.float32)
    return st


def build_channel_pool_gdbf(
    code: Code,
    root,
    base: int,
    pool_frames: int,
    sigma: float,
    preprocess=None,
    pool_dtype=None,
    qc: Optional[QCCode] = None,
    dense: Optional[DenseGraph] = None,
):
    """[F, N] decoder-input rows for global frame ids base..base+F-1.

    Same (root, gid) contract as :func:`.stream.build_channel_pool`
    (all-zero codeword, ``y = 1 + sigma·normal``); ``preprocess`` is the
    GDBF variant's saturate/quantize chain (tools/sweep.py).  ``sat0`` is
    the iteration-0 syndrome of the CHANNEL decisions (signbit form —
    quantizers emit signed zeros), so a satisfied-at-injection frame
    retires with 0 iterations and the channel decisions, exactly as the
    reference's start-of-loop check reports it."""
    gids = base + jnp.arange(pool_frames)
    keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(root, gids)
    noise = jax.vmap(
        lambda kk: jax.random.normal(kk, (code.n,), jnp.float32)
    )(keys)
    y = 1.0 + sigma * noise
    unc = jnp.sum(y <= 0, axis=1, dtype=jnp.int32)
    rows = preprocess(y) if preprocess is not None else y
    if pool_dtype is not None:
        rows = rows.astype(pool_dtype)
    d0 = _r_of(rows.astype(jnp.float32).T)  # [N, F]
    if qc is not None:
        syn = qc_syndrome_bipolar(qc, d0)
    elif dense is not None:
        syn = dense_syndrome_bipolar(dense, d0)
    else:
        syn = syndrome_from_hard(code, d0)
    sat0 = jnp.all(syn > 0, axis=0)
    return rows, unc, sat0


def make_gdbf_stream_call(
    code: Code,
    rounds: int,
    refill_every: int = 1,
    qc: Optional[QCCode] = None,
    dense: Optional[DenseGraph] = None,
    record: bool = False,
    rec_cap: int = 0,
    mesh=None,
    data_axis: str = "data",
):
    """Build the jitted persistent-state call for the GDBF family.

    call(state, pool, pool_unc, pool_sat0, base, noise_root, sigma, cfg,
         ptr0=0) -> (state', acc, rec); ``state`` is donated.
    ``noise_root`` keys the per-(frame, step) perturbation/uniform draws
    (a separate key from the channel pool's so channel and decoder noise
    streams stay independent, as in the batched harness's kch/kdec split).

    ``sigma`` and ``cfg`` are CALL-TIME arguments, exactly like the
    batched ``decode_gdbf``: the config's flag set and loop bounds are
    pytree metadata (they select the compiled program), while its five
    operating-point scalars and sigma are traced — one compiled program
    serves an entire (SNR × parameter) sweep grid.

    acc adds to :func:`.stream.make_stream_call`'s counters the family's
    extras: ``smooth_sum`` (reference ``smoothingUsed``) and
    ``phase_hist`` [max_phases+1] (RNGDBF.cpp:434-437; attempted phases
    per retired frame).

    ``mesh``: shard lanes/pool over the mesh's ``data_axis`` exactly as
    :func:`.stream.make_stream_call` does — per-device gid windows keep
    the per-(frame, step) noise keying globally unique and replayable.
    """
    if qc is not None and (qc.n != code.n or qc.m != code.m):
        raise ValueError("qc structure does not match code dimensions")
    if dense is not None and (dense.n != code.n or dense.m != code.m):
        raise ValueError("dense graph does not match code dimensions")
    n = code.n
    K = refill_every
    dtype = jnp.float32

    def derived(sigma, cfg):
        """Runtime context: (cfg, T, total_steps, noise_sigma, w, theta0,
        mu0) from the call-time sigma/cfg (meta static, scalars traced)."""
        T = cfg.num_iterations
        total_steps = cfg.max_phases * T
        noise_sigma = jnp.asarray(sigma * cfg.noise_scale, dtype)
        if cfg.weight_syndromes and cfg.legacy_weight:
            w = (
                cfg.alpha * cfg.weight_ymax / code.vn_deg.astype(dtype)
            )[:, None]
        else:
            w = jnp.asarray(
                cfg.alpha if cfg.weight_syndromes else 1.0, dtype
            )
        theta0 = jnp.asarray(cfg.theta, dtype)
        mu0 = jnp.int32(0 if cfg.sequential else 1)
        return cfg, T, total_steps, noise_sigma, w, theta0, mu0

    def syndrome(d):
        if qc is not None:
            return qc_syndrome_bipolar(qc, d)
        if dense is not None:
            return dense_syndrome_bipolar(dense, d)
        return syndrome_from_hard(code, d)

    def syn_sum_vn_of(syn):
        if qc is not None:
            return qc_syndrome_sum_per_vn(qc, syn.astype(dtype))
        if dense is not None:
            return dense_syndrome_sum_per_vn(dense, syn)
        return _syndrome_sum_per_vn(code, syn)

    def lane_keys(noise_root, gid, steps):
        ks = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
            noise_root, gid
        )
        return jax.vmap(jax.random.fold_in)(ks, steps)

    def report_d(st, cfg):
        """Decisions as reported at retire: smoothing substitutes
        sign(Σd) for frames that end unsatisfied (decodeGDBF.cpp:358-367);
        0 iterations -> channel decisions (d untouched since injection)."""
        d = st["d"]
        if cfg.output_smoothing:
            d_sm = jnp.where(st["dsum"] > 0, 1, -1).astype(jnp.int32)
            d = jnp.where(st["done"][None, :], d, d_sm)
        return d

    def iterate(st, noise_root, C):
        cfg, T, total_steps, noise_sigma, w, theta0, mu0 = C
        d, thetas, mu = st["d"], st["thetas"], st["mu"]
        steps, its, phases = st["steps"], st["its"], st["phases"]
        smooth_used = st["smooth_used"]
        act = ~st["done"] & (steps < total_steps) & ~st["idle"]
        y_t = st["ych"].astype(dtype)
        phase = steps // T
        it = steps % T

        # --- phase start: reset per-phase state (covers the just-refilled
        # lane at steps==0 and redecode boundaries, RNGDBF.cpp:280-308;
        # noise_prev deliberately NOT reset — it carries across phases)
        is_ps = act & (it == 0)
        r = _r_of(y_t)
        d = jnp.where(is_ps[None, :], r, d)
        thetas = jnp.where(is_ps[None, :], theta0, thetas)
        mu = jnp.where(is_ps, mu0, mu)
        if cfg.output_smoothing:
            dsum = jnp.where(is_ps[None, :], 0, st["dsum"])
            # phases completed fully without satisfying (smoothingUsed)
            smooth_used = smooth_used + (is_ps & (phase > 0)).astype(
                jnp.int32
            )

        # --- syndrome check at iteration start (decodeGDBF.cpp:300-306)
        syn = syndrome(d)
        satisfied = jnp.all(syn > 0, axis=0)
        newly = act & satisfied
        its = jnp.where(newly, steps, its)
        phases = jnp.where(newly, phase + 1, phases)
        if cfg.output_smoothing:
            smooth_used = smooth_used + (
                newly & (it > T - cfg.window_size)
            ).astype(jnp.int32)
        done = st["done"] | newly
        act = act & ~satisfied

        # --- mode switching: f1 before flips (stale syndrome)
        syn_sum = jnp.sum(syn, axis=0).astype(dtype)
        if cfg.mode_switching:
            f1 = jnp.sum(d.astype(dtype) * y_t, axis=0) + syn_sum

        # --- perturbation: per-(frame, local step) keying
        pert = jnp.zeros((1, 1), dtype)
        if cfg.add_noise:
            ks = lane_keys(noise_root, st["gid"], steps)
            if cfg.uniform_noise:
                u = jax.vmap(
                    lambda kk: jax.random.uniform(kk, (n,), dtype)
                )(ks).T
                sample = (
                    jnp.sqrt(3.0).astype(dtype)
                    * noise_sigma
                    * 2.0
                    * (u - 0.5)
                )
            else:
                sample = (
                    noise_sigma
                    * jax.vmap(
                        lambda kk: jax.random.normal(kk, (n,), dtype)
                    )(ks).T
                )
            if cfg.noise_shaping:
                noise_prev = st["noise_prev"]
                pert = sample - noise_prev
                noise_prev = jnp.where(act[None, :], sample, noise_prev)
            else:
                pert = sample

        # --- flip metric + decisions (shared block with decode_gdbf)
        e = d.astype(dtype) * y_t + w * syn_sum_vn_of(syn) + pert
        if cfg.quantize_probabilities:
            ks = lane_keys(noise_root, st["gid"], steps)
            kf = jax.vmap(lambda kk: jax.random.fold_in(kk, 7))(ks)
            rnum = jax.vmap(
                lambda kk: jax.random.uniform(kk, (n,), dtype)
            )(kf).T
        else:
            rnum = None
        flip, flip_for_adapt = flip_decisions(
            cfg, e, thetas, mu, noise_sigma, rnum
        )
        d = jnp.where(act[None, :] & flip, -d, d)
        if cfg.threshold_adaptation:
            thetas = jnp.where(
                act[None, :] & ~flip_for_adapt, thetas * cfg.lam, thetas
            )
        if cfg.mode_switching:
            f2 = jnp.sum(d.astype(dtype) * y_t, axis=0) + syn_sum
            drop = act & (it > cfg.t_switch) & (f1 >= f2)
            mu = jnp.where(drop, 0, mu)
        if cfg.output_smoothing:
            in_window = it > T - cfg.window_size
            dsum = jnp.where(act[None, :] & in_window, dsum + d, dsum)

        out = dict(
            st,
            d=d,
            thetas=thetas,
            mu=mu,
            steps=steps + act.astype(jnp.int32),
            its=its,
            phases=phases,
            done=done,
            smooth_used=smooth_used,
        )
        if cfg.output_smoothing:
            out["dsum"] = dsum
        if cfg.add_noise and cfg.noise_shaping:
            out["noise_prev"] = noise_prev
        return out

    def boundary(st, ptr, acc, rec, rc, pool, pool_unc, pool_sat0, base,
                 C):
        cfg, _T, total_steps, *_ = C
        retire = (st["done"] | (st["steps"] >= total_steps)) & ~st["idle"]
        d_rep = report_d(st, cfg)
        errs = jnp.sum(d_rep != 1, axis=0, dtype=jnp.int32)
        # capped frames count one final smoothing use (batched decoder's
        # post-loop accounting for never-satisfied frames)
        su = st["smooth_used"] + (
            (~st["done"]).astype(jnp.int32) if cfg.output_smoothing else 0
        )
        ri = retire.astype(jnp.int32)
        word = (errs > 0).astype(jnp.int32)
        acc = dict(
            acc,
            frames=acc["frames"] + jnp.sum(ri, dtype=jnp.int32),
            bit_errs=acc["bit_errs"] + jnp.sum(errs * ri, dtype=jnp.int32),
            word_errs=acc["word_errs"]
            + jnp.sum(ri * word, dtype=jnp.int32),
            iter_sum=acc["iter_sum"]
            + jnp.sum(st["its"] * ri, dtype=jnp.int32),
            sat=acc["sat"]
            + jnp.sum(ri * st["done"].astype(jnp.int32), dtype=jnp.int32),
            unc_sum=acc["unc_sum"]
            + jnp.sum(st["unc"] * ri, dtype=jnp.int32),
            smooth_sum=acc["smooth_sum"]
            + jnp.sum(su * ri, dtype=jnp.int32),
            iter_hist=acc["iter_hist"]
            .at[jnp.clip(st["its"], 0, total_steps)]
            .add(ri),
            weight_hist=acc["weight_hist"]
            .at[jnp.clip(errs, 0, n)]
            .add(ri * word),
            phase_hist=acc["phase_hist"]
            .at[jnp.clip(st["phases"], 0, cfg.max_phases)]
            .add(ri),
        )
        if record:
            rrank = jnp.cumsum(ri, dtype=jnp.int32) - 1
            pos = rc + rrank
            valid = retire & (pos < rec_cap)
            p = jnp.where(valid, pos, rec_cap)
            rec = dict(
                gid=rec["gid"].at[p].set(st["gid"]),
                iters=rec["iters"].at[p].set(st["its"]),
                errs=rec["errs"].at[p].set(errs),
                phases=rec["phases"].at[p].set(st["phases"]),
                sat=rec["sat"].at[p].set(st["done"]),
            )
            rc = rc + jnp.sum(ri, dtype=jnp.int32)

        # refill retired + idle lanes from the pool, in lane order
        want = retire | st["idle"]
        ranks = jnp.cumsum(want, dtype=jnp.int32) - 1
        can = want & (ranks < pool.shape[0] - ptr)
        local = jnp.where(can, ptr + ranks, 0)
        rows = jnp.take(pool, local, axis=0)  # [B, N]
        ych_new = rows.T
        sat0 = jnp.take(pool_sat0, local)
        cm = can[None, :]
        st_new = dict(
            st,
            ych=jnp.where(cm, ych_new, st["ych"]),
            # satisfied-at-injection frames retire with the channel
            # decisions; others are re-initialized by the next iterate's
            # phase-start reset (steps==0)
            d=jnp.where(cm, _r_of(ych_new.astype(dtype)), st["d"]),
            done=jnp.where(can, sat0, st["done"]) | (want & ~can),
            idle=want & ~can,
            steps=jnp.where(can, 0, st["steps"]),
            its=jnp.where(
                can, jnp.where(sat0, 0, total_steps), st["its"]
            ),
            phases=jnp.where(
                can, jnp.where(sat0, 1, cfg.max_phases), st["phases"]
            ),
            smooth_used=jnp.where(can, 0, st["smooth_used"]),
            unc=jnp.where(can, jnp.take(pool_unc, local), st["unc"]),
            gid=jnp.where(can, base + ptr + ranks, st["gid"]),
        )
        if cfg.output_smoothing:
            st_new["dsum"] = jnp.where(cm, 0, st["dsum"])
        if cfg.add_noise and cfg.noise_shaping:
            st_new["noise_prev"] = jnp.where(cm, 0.0, st["noise_prev"])
        ptr = ptr + jnp.sum(can, dtype=jnp.int32)
        return st_new, ptr, acc, rec, rc

    def _impl(state, pool, pool_unc, pool_sat0, base, ptr0, noise_root,
              sigma, cfg):
        # ptr0 == pool size makes this a DRAIN call (no refills; in-flight
        # lanes retire then idle) — see stream.py's drop-bias note
        from ..decoders.base import vma_like

        ref = state["its"]
        ptr0 = vma_like(jnp.asarray(ptr0, jnp.int32), ref)
        C = derived(sigma, cfg)
        total_steps = C[2]
        acc = dict(
            frames=jnp.int32(0),
            bit_errs=jnp.int32(0),
            word_errs=jnp.int32(0),
            iter_sum=jnp.int32(0),
            sat=jnp.int32(0),
            unc_sum=jnp.int32(0),
            smooth_sum=jnp.int32(0),
            iter_hist=jnp.zeros((total_steps + 1,), jnp.int32),
            weight_hist=jnp.zeros((n + 1,), jnp.int32),
            phase_hist=jnp.zeros((cfg.max_phases + 1,), jnp.int32),
        )
        acc = jax.tree.map(lambda x: vma_like(x, ref), acc)
        rec = (
            dict(
                gid=jnp.full((rec_cap + 1,), -1, jnp.int32),
                iters=jnp.zeros((rec_cap + 1,), jnp.int32),
                errs=jnp.zeros((rec_cap + 1,), jnp.int32),
                phases=jnp.zeros((rec_cap + 1,), jnp.int32),
                sat=jnp.zeros((rec_cap + 1,), bool),
            )
            if record
            else None
        )
        rec = jax.tree.map(lambda x: vma_like(x, ref), rec)

        def round_cond(carry):
            r, st, *_ = carry
            # early exit once every lane is idle — drain calls cost ~T
            # iterations instead of the full rounds*K budget (stream.py)
            return (r < rounds) & ((r == 0) | ~jnp.all(st["idle"]))

        def round_body(carry):
            r, st, ptr, acc, rec, rc = carry
            st, ptr, acc, rec, rc = boundary(
                st, ptr, acc, rec, rc, pool, pool_unc, pool_sat0, base, C
            )
            st = jax.lax.fori_loop(
                0, K, lambda _j, s: iterate(s, noise_root, C), st
            )
            return r + 1, st, ptr, acc, rec, rc

        _r, st, ptr, acc, rec, rc = jax.lax.while_loop(
            round_cond,
            round_body,
            (
                jnp.int32(0), state, ptr0, acc, rec,
                vma_like(jnp.int32(0), ref),
            ),
        )
        acc = dict(acc, consumed=ptr - ptr0, rc=rc)
        return st, acc, rec

    if mesh is None:
        @functools.partial(jax.jit, donate_argnums=(0,))
        def call(state, pool, pool_unc, pool_sat0, base, noise_root,
                 sigma, cfg, ptr0=0):
            return _impl(state, pool, pool_unc, pool_sat0, base, ptr0,
                         noise_root, sigma, cfg)

        return call

    from .stream import _shard_call

    inner = _shard_call(
        _impl, mesh, data_axis, record,
        ("gid", "iters", "errs", "phases", "sat"),
    )

    def call(state, pool, pool_unc, pool_sat0, base, noise_root, sigma,
             cfg, ptr0=0):
        return inner(state, pool, pool_unc, pool_sat0, base, ptr0,
                     noise_root, sigma, cfg)

    return call


# Compiled-call reuse across simulate_stream_gdbf invocations: the heavy
# jitted call is keyed by the graph objects and harness geometry only —
# sigma and the config scalars are call-time traced args, so one entry
# (and one XLA program) serves an entire sweep grid.  Entries hold strong
# references to their code/qc/dense, so the id() keys stay valid.
_CALL_CACHE: dict = {}


def _cached_call(code, rounds, refill_every, qc, dense, mesh=None,
                 data_axis="data"):
    # meshes are keyed by their device/axis content, not identity —
    # callers often construct a fresh (equal) Mesh per invocation
    mkey = None
    if mesh is not None:
        mkey = (
            tuple(d.id for d in mesh.devices.flat),
            tuple(mesh.devices.shape),  # factorization matters, not just ids
            tuple(mesh.axis_names),
        )
    key = (id(code), rounds, refill_every, id(qc), id(dense), mkey,
           data_axis)
    if key not in _CALL_CACHE:
        _CALL_CACHE[key] = (
            make_gdbf_stream_call(
                code, rounds, refill_every, qc=qc, dense=dense,
                mesh=mesh, data_axis=data_axis,
            ),
            (code, qc, dense, mesh),
        )
    return _CALL_CACHE[key][0]


def frame_perturbation_sequence(
    noise_root, gid: int, cfg: GDBFConfig, sigma: float, n: int,
    dtype=jnp.float32,
):
    """[max_phases·T, N] perturbation sequence of frame ``gid`` under the
    stream keying — feed to ``decode_gdbf(..., perturbations=...)`` to
    replay a streamed frame exactly (replay tooling + the per-frame
    equality tests).  Applies the same transforms the stream iterate does
    (scale, variance-matched uniform, first-order shaping against the
    previous sample — valid for the active lifetime of the frame)."""
    total = cfg.max_phases * cfg.num_iterations
    ns = sigma * cfg.noise_scale

    def draw(s):
        k = jax.random.fold_in(jax.random.fold_in(noise_root, gid), s)
        if cfg.uniform_noise:
            u = jax.random.uniform(k, (n,), dtype)
            return jnp.sqrt(3.0).astype(dtype) * ns * 2.0 * (u - 0.5)
        return ns * jax.random.normal(k, (n,), dtype)

    samples = jnp.stack([draw(s) for s in range(total)])
    if cfg.noise_shaping:
        prev = jnp.concatenate(
            [jnp.zeros((1, n), dtype), samples[:-1]], axis=0
        )
        return samples - prev
    return samples


def frame_stoch_uniforms(
    noise_root, gid: int, cfg: GDBFConfig, n: int, dtype=jnp.float32
):
    """[max_phases·T, N] stochastic-flip uniforms of frame ``gid`` under
    the stream keying (``decode_gdbf(..., stoch_uniforms=...)``)."""
    total = cfg.max_phases * cfg.num_iterations

    def draw(s):
        k = jax.random.fold_in(
            jax.random.fold_in(
                jax.random.fold_in(noise_root, gid), s
            ),
            7,
        )
        return jax.random.uniform(k, (n,), dtype)

    return jnp.stack([draw(s) for s in range(total)])


def simulate_stream_gdbf(
    code: Code,
    cfg: GDBFConfig,
    snr_db: float,
    rate: Optional[float] = None,
    stop: Optional[StopRule] = None,
    lanes: int = 4096,
    refill_every: int = 1,
    rounds_per_call: Optional[int] = None,
    pool_frames: Optional[int] = None,
    avg_iters_hint: float = 30.0,
    seed: int = 0,
    preprocess=None,
    pool_dtype=None,
    pool_bytes: Optional[int] = None,
    qc: Optional[QCCode] = None,
    dense: Optional[DenseGraph] = None,
    verbose: bool = False,
    max_calls: int = 100000,
    mesh=None,
    data_axis: str = "data",
) -> MCStats:
    """Monte-Carlo loop for a GDBF config over the streaming driver.

    Same statistics semantics as :func:`.montecarlo.simulate` with
    ``decode_gdbf`` (all-zero codewords), including ``extra``
    smoothing_used / phases counters and the phase histogram, without the
    early-termination straggler tax.  Channel and decoder noise use
    independent root keys split from ``seed`` (the batched harness's
    kch/kdec split at harness level).

    ``mesh``: shard lanes/pool over the mesh's ``data_axis`` — the
    streaming replacement for the reference's per-process NGDBF sweep
    fan-out (see :func:`.stream.simulate_stream` for the window/gid
    semantics).  ``pool_bytes``: channel-pool byte budget
    (:func:`.stream.pool_policy`; default 1 GiB).
    """
    from ..channel.awgn import snr_to_sigma

    rate = code.rate if rate is None else rate
    stop = stop or StopRule(min_word_errors=default_min_word_errors(code.n))
    sigma = float(snr_to_sigma(snr_db, rate))
    root = jax.random.key(seed)
    kch, kdec = jax.random.split(root)
    _default_pool = pool_frames is None
    default_rounds = 64
    if pool_frames is None:
        from .stream import pool_policy

        rounds_per_call, pool_frames = pool_policy(
            lanes, refill_every, rounds_per_call, avg_iters_hint,
            code.n * jnp.dtype(pool_dtype or jnp.float32).itemsize,
            pool_bytes, default_rounds=default_rounds,
        )
    elif rounds_per_call is None:
        rounds_per_call = default_rounds
    iters_per_call = rounds_per_call * refill_every
    total_steps = cfg.max_phases * cfg.num_iterations

    state = gdbf_stream_init(
        code, cfg, lanes, pool_dtype or jnp.float32
    )
    nd = 1
    pool_out = None
    if mesh is not None:
        from .stream import mesh_setup

        nd, pool_frames, state, pool_out = mesh_setup(
            mesh, data_axis, lanes, pool_frames, _default_pool, state
        )
    call = _cached_call(
        code, rounds_per_call, refill_every, qc, dense,
        mesh=mesh, data_axis=data_axis,
    )

    def _pool_impl(base_, root_):
        return build_channel_pool_gdbf(
            code, root_, base_, pool_frames, sigma, preprocess, pool_dtype,
            qc=qc, dense=dense,
        )

    pool_fn = jax.jit(
        _pool_impl,
        **({} if pool_out is None else dict(out_shardings=pool_out)),
    )

    stats = MCStats(n=code.n)
    stats.iteration_hist = np.zeros(total_steps + 1, np.int64)
    phase_hist = np.zeros(cfg.max_phases + 1, np.int64)
    t0 = time.perf_counter()
    base = 0

    def take(a):
        stats.total_words += int(a["frames"])
        stats.total_bits += int(a["frames"]) * code.n
        stats.errors += int(a["bit_errs"])
        stats.word_errors += int(a["word_errs"])
        stats.total_iterations += int(a["iter_sum"])
        stats.satisfied_words += int(a["sat"])
        stats.uncoded_errors += int(a["unc_sum"])
        stats.iteration_hist += np.asarray(a["iter_hist"], np.int64)
        stats.error_weight_hist[: code.n] += np.asarray(
            a["weight_hist"][1:], np.int64
        )
        phase_hist[:] += np.asarray(a["phase_hist"], np.int64)
        if cfg.output_smoothing:
            stats.extra["smoothing_used"] = stats.extra.get(
                "smoothing_used", 0
            ) + int(a["smooth_sum"])

    pool = unc = sat0 = None
    rotation = 0
    for _ci in range(max_calls):
        if stop.done(stats.errors, stats.word_errors, stats.total_words):
            break
        if base > _stream._GID_LIMIT - nd * pool_frames:
            # rotate the CHANNEL gid space before int32 overflow (see
            # stream.simulate_stream; kdec is NOT rotated — in-flight
            # frames draw their decoder noise from it by (gid, step), so
            # rotating it would change them mid-decode)
            rotation += 1
            # fold value >= 2**31 cannot collide with any gid fold
            kch = jax.random.fold_in(
                jax.random.split(jax.random.key(seed))[0],
                2**31 + rotation,
            )
            base = 0
        pool, unc, sat0 = pool_fn(jnp.int32(base), kch)
        state, acc, _rec = call(
            state, pool, unc, sat0, jnp.int32(base), kdec, sigma, cfg
        )
        a = jax.device_get(acc)
        take(a)
        # sharded: full-window advance (see stream.simulate_stream)
        base += pool_frames if mesh is not None else int(a["consumed"])
        if verbose:
            print(stats.incremental_report())
    # drain in-flight lanes (stream.run_drain: dropping them biases FER
    # low — they are enriched in slow/failing frames; at GDBF T=100
    # geometries the skew measured ~9% of FER before the fix)
    if pool is not None:
        from .stream import run_drain

        state = run_drain(
            call, state, (pool, unc, sat0), base, pool_frames // nd,
            take, total_steps, iters_per_call,
            extra=(kdec, sigma, cfg),
        )
    # batched-harness format: index p-1 = frames that attempted p phases
    # (phases >= 1 always; acc slot 0 is structurally empty)
    stats.extra["phase_hist"] = phase_hist[1:]
    stats.wall_seconds = time.perf_counter() - t0
    return stats
