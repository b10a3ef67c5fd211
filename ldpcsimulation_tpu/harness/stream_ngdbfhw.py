"""Streaming refill harness for the fixed-point NGDBFhw decoder.

The batched :func:`..decoders.ngdbf_hw.decode_ngdbf_hw` runs its full
``max_phases × T`` step budget unconditionally (frozen frames are
masked), so the PERF rows pay the cap while frames at the demo operating
point converge in tens of iterations — the same straggler economics the
other stream harnesses remove.  This driver streams the ASIC model:
persistent lanes, per-frame-keyed channel rows AND noise rings, retire/
refill at boundaries.

Two design points make it exact and fast:

* **Shared ring pointer = per-frame ``qpointer0``.**  All lanes read the
  ring through ONE shared position (a carried global step counter modulo
  ``ring_len − N``), so the access stays the cheap contiguous slice the
  batched single-phase path uses (per-lane ``take_along_axis`` measured
  ~40× slower there).  A lane injected when the counter is at ``g0``
  therefore behaves bit-exactly like the reference decoder started with
  ``qpointer0 = g0`` on that frame's own ring — a semantic the reference
  itself produces via its cross-frame pointer persistence
  (``NGDBFhw.cpp:153,356-358``); ``g0`` is recorded per frame, so the
  equality tests replay every streamed frame through the batched decoder
  with ``ring_noise=`` + ``qpointer0=`` injection.
* **Phase transitions consume an update.**  The reference chains
  redecode phases immediately (inner loop breaks, next phase starts), and
  ``qpointer`` advances once per EXECUTED symbol update.  A lane ending a
  phase in this driver resets to the channel decisions and performs the
  new phase's first update in the same iterate — using the lane-constant
  ``syndrome(d_init)`` neighbor sums precomputed at injection — so every
  active lane executes exactly one update per iterate and the shared
  pointer stays in sync with each lane's executed-update count.

Reported statistics keep the reference's parallel-decoder model
(``NGDBFhw.cpp:280-373``): every frame attempts ALL ``max_phases``
phases; ``least_errs``/``least_iters`` across phases are the counters; a
frame whose channel decisions already satisfy retires at injection with
0 iterations (the check at the start of phase 0).
"""

from __future__ import annotations

import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..codes.code import Code
from ..decoders.base import vma_like
from ..decoders.dense_ops import DenseGraph
from ..decoders.ngdbf_hw import NGDBFHwConfig, hw_graph_ops, hw_quantize_int
from . import stream as _stream
from .montecarlo import MCStats, StopRule, default_min_word_errors

__all__ = [
    "hw_stream_init",
    "make_hw_stream_call",
    "build_channel_pool_hw",
    "simulate_stream_ngdbfhw",
]


def hw_stream_init(code: Code, cfg: NGDBFHwConfig, lanes: int):
    """All-idle initial lane state (first boundary fills every lane)."""
    n = code.n
    T = cfg.num_iterations
    return dict(
        yint=jnp.zeros((n, lanes), jnp.int32),
        d=jnp.zeros((n, lanes), jnp.int32),
        d_init=jnp.zeros((n, lanes), jnp.int32),
        ssum_init=jnp.zeros((n, lanes), jnp.int32),
        ring=jnp.zeros((cfg.ring_len, lanes), jnp.int32),
        it=jnp.zeros((lanes,), jnp.int32),
        phase=jnp.zeros((lanes,), jnp.int32),
        least_iters=jnp.full((lanes,), T, jnp.int32),
        least_errs=jnp.full((lanes,), n, jnp.int32),
        exit_sat=jnp.zeros((lanes,), bool),
        qp0=jnp.zeros((lanes,), jnp.int32),
        done=jnp.ones((lanes,), bool),
        idle=jnp.ones((lanes,), bool),
        unc=jnp.zeros((lanes,), jnp.int32),
        gid=jnp.full((lanes,), -1, jnp.int32),
        # per-lane copies of the shared ring counter (all equal WITHIN a
        # device): a replicated scalar would be wrong under a mesh, where
        # each device's round loop can exit early independently
        gstep=jnp.zeros((lanes,), jnp.int32),
    )


def build_channel_pool_hw(code: Code, root, base: int, pool_frames: int,
                          sigma: float, qc=None,
                          dense: Optional[DenseGraph] = None):
    """Raw channel rows [F, N] f32 (all-zero codeword), per-frame uncoded
    errors, and the phase-0 start syndrome flag of the CHANNEL decisions
    (frames satisfied there retire at injection with 0 iterations).  The
    noise RING is per-frame too but generated at the refill boundary
    (it must pair with the lane's injection-time ring offset)."""
    syndrome01, _ = hw_graph_ops(code, qc, dense)
    gids = base + jnp.arange(pool_frames)
    keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(root, gids)
    noise = jax.vmap(
        lambda kk: jax.random.normal(kk, (code.n,), jnp.float32)
    )(keys)
    y = 1.0 + sigma * noise
    unc = jnp.sum(y <= 0, axis=1, dtype=jnp.int32)
    d0 = jnp.where(y.T > 0, 0, 1).astype(jnp.int32)  # {0,1}
    sat0 = jnp.all(syndrome01(d0) == 0, axis=0)
    return y, unc, sat0


def make_hw_stream_call(
    code: Code,
    cfg: NGDBFHwConfig,
    rounds: int,
    refill_every: int = 1,
    qc=None,
    dense: Optional[DenseGraph] = None,
    record: bool = False,
    rec_cap: int = 0,
    mesh=None,
    data_axis: str = "data",
):
    """Build the jitted persistent-state call.

    call(state, pool, pool_unc, pool_sat0, base, noise_root, sigma,
         ptr0=0) -> (state', acc, rec).  ``sigma`` is a call-time traced
    scalar (one compiled program per SNR sweep); the config's structural
    fields (T, NQ, max_phases, ring_len) are baked (they set shapes),
    its operating scalars (w, ymax, noise_scale, theta0) are pytree data
    and could be threaded the same way if a parameter grid needs it.

    ``rec`` adds ``qp0`` (the lane's injection-time ring offset) and
    ``sat`` so the per-frame equality tests can replay each frame
    through ``decode_ngdbf_hw(ring_noise=..., qpointer0=qp0)``.
    """
    n = code.n
    T = cfg.num_iterations
    K = refill_every
    P = cfg.max_phases
    lmax, nl = cfg.lmax, cfg.nl
    theta = cfg.theta_int
    smult = cfg.smult
    ring_mod = cfg.ring_len - n
    if ring_mod <= 0:
        raise ValueError("ring_len must exceed code length")
    syndrome01, satsum = hw_graph_ops(code, qc, dense)

    def _derive(rows_t, sigma):
        """Raw [N, B] samples -> (yint, d_init, ssum_init)."""
        y_clip = jnp.where(
            jnp.abs(rows_t) > cfg.ymax,
            rows_t * (cfg.ymax / jnp.abs(rows_t)),
            rows_t,
        )
        d_init = jnp.where(y_clip > 0, 0, 1).astype(jnp.int32)
        yint = hw_quantize_int(y_clip / (2.0 * cfg.w), nl, lmax)
        # pin int32: under x64 test configs the Python-scalar arithmetic
        # inside the graph ops promotes
        ssum_init = satsum(syndrome01(d_init)).astype(jnp.int32)
        return yint, d_init, ssum_init

    def _rings(noise_root, gid, sigma):
        """Per-gid noise rings [ring_len, B] int32 (NGDBFhw.cpp:239-252),
        keyed from the DECODER root — independent of the channel root
        (the batched harness's kch/kdec split)."""
        ks = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
            noise_root, gid
        )
        qn = sigma * cfg.noise_scale * jax.vmap(
            lambda kk: jax.random.normal(kk, (cfg.ring_len,), jnp.float32)
        )(ks).T
        qmod = (qn - cfg.theta0) / (2.0 * cfg.w) - 1.0
        qmod = jnp.clip(qmod, -lmax, lmax)
        return hw_quantize_int(qmod, nl, lmax)

    def iterate(st):
        act = ~st["done"] & ~st["idle"]
        d, it, phase = st["d"], st["it"], st["phase"]
        least_iters, least_errs = st["least_iters"], st["least_errs"]
        exit_sat = st["exit_sat"]

        # --- phase end?  Cap after T updates (no further syndrome
        # check, NGDBFhw.cpp:290), or satisfied at the iteration-start
        # check (:297-299)
        capped = act & (it >= T)
        syn = syndrome01(d)
        sat_now = jnp.all(syn == 0, axis=0)
        sat_end = act & ~capped & sat_now
        end = capped | sat_end
        p_iters = jnp.where(capped, T, it)

        # least-errors / least-iterations across phases (:365-372);
        # errors vs the all-zero codeword
        errs_now = jnp.sum(d, axis=0, dtype=jnp.int32)
        better = end & (errs_now < least_errs)
        least_errs = jnp.where(better, errs_now, least_errs)
        least_iters = jnp.where(
            end, jnp.minimum(least_iters, p_iters), least_iters
        )
        new_phase = jnp.where(end, phase + 1, phase)
        finished = end & (new_phase >= P)
        # the reference's exit `satisfied` = the FINAL phase broke on its
        # syndrome check (a cap exit reports unsatisfied)
        exit_sat = jnp.where(finished, sat_end, exit_sat)
        done = st["done"] | finished

        # --- one symbol update per active, unfinished lane.  A lane
        # ENDING a phase (but not finished) starts the next phase in
        # this same iterate: d resets to the channel decisions and the
        # flip metric uses the lane-constant syndrome(d_init) sums —
        # keeping executed-update counts aligned with the shared ring
        # pointer.
        trans = end & ~finished
        upd = act & ~finished
        d_used = jnp.where(trans[None, :], st["d_init"], d)
        ssum_used = jnp.where(
            trans[None, :], st["ssum_init"], satsum(syn)
        )
        qvals = jax.lax.dynamic_slice_in_dim(
            st["ring"], st["gstep"][0] % ring_mod, n, axis=0
        )
        e = (1 - 2 * d_used) * st["yint"] + ssum_used * smult + qvals
        flip = e <= theta
        d = jnp.where(upd[None, :] & flip, 1 - d_used,
                      jnp.where(upd[None, :], d_used, d))
        it = jnp.where(trans, 1, jnp.where(upd, it + 1, it))

        return dict(
            st,
            d=d,
            it=it,
            phase=new_phase,
            least_iters=least_iters,
            least_errs=least_errs,
            exit_sat=exit_sat,
            done=done,
            gstep=st["gstep"] + 1,
        )

    def boundary(st, ptr, acc, rec, rc, pool, pool_unc, pool_sat0, base,
                 noise_root, sigma):
        retire = st["done"] & ~st["idle"]
        ri = retire.astype(jnp.int32)
        errs = st["least_errs"]
        word = (errs > 0).astype(jnp.int32)
        acc = dict(
            acc,
            frames=acc["frames"] + jnp.sum(ri, dtype=jnp.int32),
            bit_errs=acc["bit_errs"] + jnp.sum(errs * ri, dtype=jnp.int32),
            word_errs=acc["word_errs"]
            + jnp.sum(ri * word, dtype=jnp.int32),
            iter_sum=acc["iter_sum"]
            + jnp.sum(st["least_iters"] * ri, dtype=jnp.int32),
            sat=acc["sat"]
            + jnp.sum(ri * st["exit_sat"].astype(jnp.int32),
                      dtype=jnp.int32),
            unc_sum=acc["unc_sum"]
            + jnp.sum(st["unc"] * ri, dtype=jnp.int32),
            iter_hist=acc["iter_hist"]
            .at[jnp.clip(st["least_iters"], 0, T)]
            .add(ri),
            weight_hist=acc["weight_hist"]
            .at[jnp.clip(errs, 0, n)]
            .add(ri * word),
        )
        if record:
            rrank = jnp.cumsum(ri, dtype=jnp.int32) - 1
            pos = rc + rrank
            valid = retire & (pos < rec_cap)
            p = jnp.where(valid, pos, rec_cap)
            rec = dict(
                gid=rec["gid"].at[p].set(st["gid"]),
                iters=rec["iters"].at[p].set(st["least_iters"]),
                errs=rec["errs"].at[p].set(errs),
                sat=rec["sat"].at[p].set(st["exit_sat"]),
                qp0=rec["qp0"].at[p].set(st["qp0"]),
            )
            rc = rc + jnp.sum(ri, dtype=jnp.int32)

        # refill retired + idle lanes, in lane order
        want = retire | st["idle"]
        ranks = jnp.cumsum(want, dtype=jnp.int32) - 1
        can = want & (ranks < pool.shape[0] - ptr)
        local = jnp.where(can, ptr + ranks, 0)
        rows_t = jnp.take(pool, local, axis=0).T  # [N, B]
        gid_new = base + ptr + ranks
        yint_n, d_init_n, ssum_n = _derive(rows_t, sigma)
        ring_n = _rings(noise_root, jnp.where(can, gid_new, 0), sigma)
        sat0 = jnp.take(pool_sat0, local)
        unc_new = jnp.take(pool_unc, local)
        cm = can[None, :]
        # satisfied-at-injection: phase 0's start check passes -> retire
        # next boundary with 0 iterations, errors = the channel errors
        # (phase_end of d_init), exit satisfied
        st_new = dict(
            st,
            yint=jnp.where(cm, yint_n, st["yint"]),
            d=jnp.where(cm, d_init_n, st["d"]),
            d_init=jnp.where(cm, d_init_n, st["d_init"]),
            ssum_init=jnp.where(cm, ssum_n, st["ssum_init"]),
            ring=jnp.where(cm, ring_n, st["ring"]),
            it=jnp.where(can, 0, st["it"]),
            phase=jnp.where(can, 0, st["phase"]),
            least_iters=jnp.where(
                can, jnp.where(sat0, 0, T), st["least_iters"]
            ),
            least_errs=jnp.where(
                can, jnp.where(sat0, unc_new, n), st["least_errs"]
            ),
            exit_sat=jnp.where(can, sat0, st["exit_sat"]),
            qp0=jnp.where(can, st["gstep"][0] % ring_mod, st["qp0"]),
            done=jnp.where(can, sat0, st["done"]) | (want & ~can),
            idle=want & ~can,
            unc=jnp.where(can, unc_new, st["unc"]),
            gid=jnp.where(can, gid_new, st["gid"]),
        )
        ptr = ptr + jnp.sum(can, dtype=jnp.int32)
        return st_new, ptr, acc, rec, rc

    def _impl(state, pool, pool_unc, pool_sat0, base, ptr0, noise_root,
              sigma):
        ref = state["it"]
        ptr0 = vma_like(jnp.asarray(ptr0, jnp.int32), ref)
        acc = dict(
            frames=jnp.int32(0),
            bit_errs=jnp.int32(0),
            word_errs=jnp.int32(0),
            iter_sum=jnp.int32(0),
            sat=jnp.int32(0),
            unc_sum=jnp.int32(0),
            iter_hist=jnp.zeros((T + 1,), jnp.int32),
            weight_hist=jnp.zeros((n + 1,), jnp.int32),
        )
        acc = jax.tree.map(lambda x: vma_like(x, ref), acc)
        rec = (
            dict(
                gid=jnp.full((rec_cap + 1,), -1, jnp.int32),
                iters=jnp.zeros((rec_cap + 1,), jnp.int32),
                errs=jnp.zeros((rec_cap + 1,), jnp.int32),
                sat=jnp.zeros((rec_cap + 1,), bool),
                qp0=jnp.zeros((rec_cap + 1,), jnp.int32),
            )
            if record
            else None
        )
        rec = jax.tree.map(lambda x: vma_like(x, ref), rec)

        def round_cond(carry):
            r, st, *_ = carry
            return (r < rounds) & ((r == 0) | ~jnp.all(st["idle"]))

        def round_body(carry):
            r, st, ptr, acc, rec, rc = carry
            st, ptr, acc, rec, rc = boundary(
                st, ptr, acc, rec, rc, pool, pool_unc, pool_sat0, base,
                noise_root, sigma,
            )
            st = jax.lax.fori_loop(0, K, lambda _j, s: iterate(s), st)
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
                 sigma, ptr0=0):
            return _impl(state, pool, pool_unc, pool_sat0, base, ptr0,
                         noise_root, sigma)

        return call

    inner = _stream._shard_call(
        _impl, mesh, data_axis, record,
        ("gid", "iters", "errs", "sat", "qp0"),
    )

    def call(state, pool, pool_unc, pool_sat0, base, noise_root, sigma,
             ptr0=0):
        return inner(state, pool, pool_unc, pool_sat0, base, ptr0,
                     noise_root, sigma)

    return call


# Compiled-call reuse across simulate invocations (sigma is a call-time
# traced arg, so one entry serves an SNR sweep; the config's operating
# scalars are trace-baked here, hence part of the key).  Entries pin
# their graph objects so the id() keys stay valid.
_HW_CALL_CACHE: dict = {}


def _cached_hw_pool(code, qc, dense, pool_frames, pool_sharding=None):
    """Jitted pool builder cached across simulate invocations (base,
    root and sigma are traced args — one compile per geometry)."""
    key = ("pool", id(code), id(qc), id(dense), pool_frames,
           pool_sharding is not None and str(pool_sharding))
    if key not in _HW_CALL_CACHE:
        def pf(base_, root_, sigma_):
            return build_channel_pool_hw(
                code, root_, base_, pool_frames, sigma_, qc=qc,
                dense=dense,
            )

        kw = {} if pool_sharding is None else dict(
            out_shardings=pool_sharding
        )
        _HW_CALL_CACHE[key] = (jax.jit(pf, **kw), (code, qc, dense))
    return _HW_CALL_CACHE[key][0]


def _cached_hw_call(code, cfg, rounds, refill_every, qc, dense,
                    mesh=None, data_axis="data"):
    mkey = None
    if mesh is not None:
        mkey = (
            tuple(d.id for d in mesh.devices.flat),
            tuple(mesh.devices.shape),
            tuple(mesh.axis_names),
        )
    key = (
        id(code), id(qc), id(dense), rounds, refill_every,
        cfg.num_iterations, cfg.nq, cfg.max_phases, cfg.ring_len,
        cfg.w, cfg.ymax, cfg.noise_scale, cfg.theta0, mkey, data_axis,
    )
    if key not in _HW_CALL_CACHE:
        _HW_CALL_CACHE[key] = (
            make_hw_stream_call(
                code, cfg, rounds, refill_every, qc=qc, dense=dense,
                mesh=mesh, data_axis=data_axis,
            ),
            (code, qc, dense, mesh),
        )
    return _HW_CALL_CACHE[key][0]


def simulate_stream_ngdbfhw(
    code: Code,
    cfg: NGDBFHwConfig,
    snr_db: float,
    rate: Optional[float] = None,
    stop: Optional[StopRule] = None,
    lanes: int = 4096,
    refill_every: int = 4,
    rounds_per_call: Optional[int] = None,
    pool_frames: Optional[int] = None,
    avg_iters_hint: float = 40.0,
    seed: int = 0,
    pool_bytes: Optional[int] = None,
    qc=None,
    dense: Optional[DenseGraph] = None,
    verbose: bool = False,
    max_calls: int = 100000,
    mesh=None,
    data_axis: str = "data",
) -> MCStats:
    """Monte-Carlo loop for NGDBFhw over the streaming driver.

    Same counters as the batched harness with ``decode_ngdbf_hw``
    (least-errors/least-iterations across phases, exit-satisfied flag;
    all-zero codewords).  The reference runs a FIXED frame count
    (``NGDBFhw.cpp:193``) — pass ``StopRule.fixed_frames`` for that
    semantic, as tools/sweep.py does.  ``pool_bytes``: channel-pool byte
    budget (:func:`.stream.pool_policy`; default 1 GiB).
    """
    from ..channel.awgn import snr_to_sigma

    rate = code.rate if rate is None else rate
    stop = stop or StopRule(min_word_errors=default_min_word_errors(code.n))
    sigma = float(snr_to_sigma(snr_db, rate))
    root = jax.random.key(seed)
    kch, kdec = jax.random.split(root)
    # a frame's expected executed updates = avg over ALL phases
    _default_pool = pool_frames is None
    default_rounds = 32
    if pool_frames is None:
        rounds_per_call, pool_frames = _stream.pool_policy(
            lanes, refill_every, rounds_per_call, avg_iters_hint,
            code.n * 4, pool_bytes,
            default_rounds=default_rounds,
        )
    elif rounds_per_call is None:
        rounds_per_call = default_rounds
    iters_per_call = rounds_per_call * refill_every
    T = cfg.num_iterations

    state = hw_stream_init(code, cfg, lanes)
    nd = 1
    pool_sharding = None
    if mesh is not None:
        nd, pool_frames, state, pool_sharding = _stream.mesh_setup(
            mesh, data_axis, lanes, pool_frames, _default_pool, state
        )
    call = _cached_hw_call(
        code, cfg, rounds_per_call, refill_every, qc, dense,
        mesh=mesh, data_axis=data_axis,
    )
    _pool = _cached_hw_pool(
        code, qc, dense, pool_frames, pool_sharding
    )

    def pool_fn(base_, root_):
        return _pool(base_, root_, sigma)

    stats = MCStats(n=code.n)
    stats.iteration_hist = np.zeros(T + 1, np.int64)
    t0 = time.perf_counter()
    base = 0
    rotation = 0

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

    pool = unc = sat0 = None
    for _ci in range(max_calls):
        if stop.done(stats.errors, stats.word_errors, stats.total_words):
            break
        if base > _stream._GID_LIMIT - pool_frames:
            # rotate the CHANNEL root before int32 gid overflow; the
            # ring root (kdec) stays fixed, so rotation r reuses
            # rotation 0's decoder-noise rings gid-for-gid against FRESH
            # channel realizations — valid Monte-Carlo (the ring is
            # decoder-internal noise, which the reference itself reuses
            # structurally), and in-flight frames keep their streams
            rotation += 1
            kch = jax.random.fold_in(
                jax.random.split(jax.random.key(seed))[0],
                2**31 + rotation,
            )
            base = 0
        pool, unc, sat0 = pool_fn(jnp.int32(base), kch)
        state, acc, _rec = call(
            state, pool, unc, sat0, jnp.int32(base), kdec, sigma
        )
        a = jax.device_get(acc)
        take(a)
        base += pool_frames if mesh is not None else int(a["consumed"])
        if verbose:
            print(stats.incremental_report())
    if pool is not None:
        state = _stream.run_drain(
            call, state, (pool, unc, sat0), base, pool_frames // nd,
            take, cfg.max_phases * T, iters_per_call,
            extra=(kdec, sigma),
        )
    stats.wall_seconds = time.perf_counter() - t0
    return stats
