"""Row-layered sum-product BP for QC codes.

Layered counterpart of :mod:`.bp_qc`, structured like
:mod:`.minsum_layered`: per base-row layers with immediate posterior
updates and hyperbolic-pair check updates (see :mod:`.bp`) with exact
prefix/suffix exclusion.
No reference counterpart (the reference is flooding-only); this completes
the schedule × algorithm matrix {flooding, layered} × {min-sum, BP}.

Clamping semantics: the ±MAXLLR clamp applies only to the *check-node
input* copy of the extrinsic (the analog of flooding BP's outgoing-message
clamp, ``decodeBP.cpp:399-401``); the posterior is rebuilt from the
UNclamped extrinsic.  Clamping the reconstructed posterior itself bleeds
belief mass on every layer visit and was measured to collapse ~1% of
frames to garbage at 2.5 dB — the tests pin the corrected behavior
(layered strictly at-or-better than flooding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..codes.qc import QCCode
from .base import DecodeResult, run_flooding, sgn_pos
from .bp import MAXLLR, pair_excl_logmags
from .minsum_layered import layered_l0
from .minsum_qc import (
    assert_layered_compatible,
    qc_check_satisfied,
    qc_slot_plan,
)

__all__ = ["decode_bp_layered_qc", "qc_bp_layered_step"]


def qc_bp_layered_step(qc: QCCode, max_llr: float = MAXLLR):
    """The :func:`decode_bp_layered_qc` iteration as a pure function of
    the layered state: ``step((q, L)) -> ((q', L'), total)`` with
    ``total`` the stacked ``[Nb, z, B]`` posterior.  One call = one full
    pass over all Mb layers.  Identical operations (bit-identical
    results) to the closure inside :func:`decode_bp_layered_qc` —
    factored out so the streaming refill harness shares one definition
    with the batch decoder."""
    cn_plan, _ = qc_slot_plan(qc)
    assert_layered_compatible(qc)
    z = qc.z

    def step(qL):
        q, L = qL
        dtype = q[0].dtype
        inf = jnp.asarray(jnp.inf, dtype)
        b = q[0].shape[-1]
        q = list(q)
        L = list(L)
        for bi in range(qc.mb):
            entries = cn_plan[bi]
            dc = len(entries)
            qext = []
            qin = []
            for t, e in enumerate(entries):
                qv = jnp.roll(q[e.bj], -e.shift, axis=0)
                ext = qv - L[bi][t]
                qext.append(ext)
                ci = jnp.clip(ext, -max_llr, max_llr)
                if e.cn_mask is not None:
                    # mask AFTER the clip: u = e^-inf is exactly 0 and
                    # sgn +1 — the true pair-fold neutral
                    ci = jnp.where(jnp.asarray(e.cn_mask)[:, None], inf, ci)
                qin.append(ci)
            us = [jnp.exp(-jnp.abs(v)) for v in qin]
            signs = [sgn_pos(v) for v in qin]
            mags = pair_excl_logmags(us)
            ones = jnp.ones((z, b), dtype)
            pre_s = [ones]
            for t in range(dc - 1):
                pre_s.append(pre_s[-1] * signs[t])
            suf_s = [ones]
            for t in range(dc - 1, 0, -1):
                suf_s.append(suf_s[-1] * signs[t])
            suf_s.reverse()
            new_rows = []
            posts = []
            for t, e in enumerate(entries):
                out = pre_s[t] * suf_s[t] * mags[t]
                if e.cn_mask is not None:
                    cm = jnp.asarray(e.cn_mask)[:, None]
                    out = jnp.where(cm, jnp.zeros_like(out), out)
                    a_t = jnp.roll(
                        jnp.where(cm, jnp.roll(q[e.bj], -e.shift, axis=0),
                                  qext[t] + out),
                        e.shift, axis=0,
                    )
                else:
                    a_t = jnp.roll(qext[t] + out, e.shift, axis=0)
                posts.append(a_t)
                new_rows.append(out)
            t = 0
            while t < dc:
                e = entries[t]
                if t + 1 < dc and entries[t + 1].pair_second:
                    q[e.bj] = (posts[t] - q[e.bj]) + posts[t + 1]
                    t += 2
                else:
                    q[e.bj] = posts[t]
                    t += 1
            L[bi] = jnp.stack(new_rows)
        q = tuple(q)
        return (q, tuple(L)), jnp.stack(q)

    return step


@functools.partial(
    jax.jit,
    static_argnames=("qc", "num_iterations", "early_termination"),
)
def decode_bp_layered_qc(
    qc: QCCode,
    llr: jax.Array,
    num_iterations: int,
    max_llr: float = MAXLLR,
    early_termination: bool = False,
) -> DecodeResult:
    """Batched row-layered sum-product on a QC code.  llr: [B, N].

    Generalized QC structures follow minsum_layered's rules: minus edges
    contribute the phi-neutral (+inf in, magnitude 0 / sign +1) and leave
    their column untouched; multi-edge pairs use the block-parallel
    accumulate ``(a1 - q) + a2``."""
    llr_t = jnp.asarray(llr).T
    n, b = llr_t.shape
    assert n == qc.n
    z = qc.z
    dtype = llr_t.dtype
    # Per-block pytree state (tuples of [z, B] / [dc, z, B] arrays) —
    # same rationale as minsum_layered: interleaved `.at[].set`s on
    # stacked buffers made XLA materialize full-posterior copies per
    # layer.
    q0 = tuple(llr_t.reshape(qc.nb, z, b))
    # vma-typed zeros: the ET while_loop carry must match under shard_map
    l0 = layered_l0(qc, b, dtype, llr_t)
    step = qc_bp_layered_step(qc, max_llr)

    def decide(q):
        return tuple(
            jnp.where(qb > 0, 1, -1).astype(jnp.int32) for qb in q
        )

    d, iters, done = run_flooding(
        (q0, l0),
        lambda st: step(st)[0],
        lambda st: decide(st[0]),
        lambda d: qc_check_satisfied(qc, d),
        num_iterations, early_termination, b,
    )
    return DecodeResult(
        hard=jnp.stack(d).reshape(n, b).T, iterations=iters, satisfied=done
    )
