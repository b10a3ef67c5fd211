"""Pure-Python/NumPy oracle decoders, written directly from the reference
semantics (ragged per-node loops, sequential tie-breaking) as an independent
check on the vectorized JAX implementations.

These mirror the *behavior* documented in SURVEY.md §2.2 (decodeMinSum.cpp,
decodeBP.cpp, decodeGDBF.cpp, decodeDDBMP.cpp) — slot order, sign
conventions, tie-breaks — using plain Python control flow.
"""

import math
from typing import List

import numpy as np

from ldpcsimulation_tpu.codes.alist import Alist


def sgn_pos(x: float) -> float:
    return 1.0 if x >= 0 else -1.0


def sgn_neg(x: float) -> float:
    return 1.0 if x > 0 else -1.0


def _slot_of(a: Alist, v: int, c: int) -> int:
    return a.nlist[v].index(c)


def _cslot_of(a: Alist, v: int, c: int) -> int:
    return a.mlist[c].index(v)


def minsum_decode(a: Alist, y, T: int, variant="plain", alpha=1.0, delta=0.0):
    """Flooding min-sum, single frame. Returns (d, s2c, c2s) after T iters."""
    y = list(map(float, y))
    s2c: List[List[float]] = [[y[v]] * len(a.nlist[v]) for v in range(a.n)]
    c2s: List[List[float]] = [[0.0] * len(a.mlist[c]) for c in range(a.m)]
    d = [0] * a.n
    for _ in range(T):
        # check node update: sign product + two minima, <= tie-break
        for c in range(a.m):
            min1 = math.inf
            min2 = math.inf
            minidx = -1
            prod = 1.0
            for j, v in enumerate(a.mlist[c]):
                msg = s2c[v][_slot_of(a, v, c)]
                prod *= sgn_pos(msg)
                if abs(msg) <= min1:
                    min2 = min1
                    min1 = abs(msg)
                    minidx = j
                elif abs(msg) < min2:
                    min2 = abs(msg)
            for j, v in enumerate(a.mlist[c]):
                msg = s2c[v][_slot_of(a, v, c)]
                mag = min2 if j == minidx else min1
                c2s[c][j] = prod * mag * sgn_pos(msg)
        if variant == "normalized":
            for c in range(a.m):
                for j in range(len(c2s[c])):
                    c2s[c][j] /= alpha
        elif variant == "offset":
            for c in range(a.m):
                for j in range(len(c2s[c])):
                    msg = c2s[c][j]
                    mag = abs(msg) - delta
                    c2s[c][j] = sgn_pos(msg) * mag if mag > 0 else 0.0
        # symbol node update.  Grouping pinned to the framework's:
        # messages left-fold first, channel term last (minsum.vn_update —
        # 1 ulp from the C's y-first fold, statistically invisible; the
        # oracle mirrors the framework so bit-exact tests stay exact)
        for v in range(a.n):
            macc = 0.0
            for s, c in enumerate(a.nlist[v]):
                macc += c2s[c][_cslot_of(a, v, c)]
            total = y[v] + macc
            for s, c in enumerate(a.nlist[v]):
                s2c[v][s] = total - c2s[c][_cslot_of(a, v, c)]
            d[v] = 1 if total > 0 else -1
    return d, s2c, c2s


def bp_decode(a: Alist, llr, T: int, max_llr=20.0):
    """Flooding sum-product (tanh form, true exclusion), single frame."""
    llr = list(map(float, llr))
    s2c: List[List[float]] = [[llr[v]] * len(a.nlist[v]) for v in range(a.n)]
    c2s: List[List[float]] = [[0.0] * len(a.mlist[c]) for c in range(a.m)]
    d = [0] * a.n
    for _ in range(T):
        for c in range(a.m):
            for j in range(len(a.mlist[c])):
                prod = 1.0
                for k, v in enumerate(a.mlist[c]):
                    if k != j:
                        prod *= math.tanh(s2c[v][_slot_of(a, v, c)] / 2.0)
                # log((1+p)/(1-p))
                if prod >= 1.0:
                    out = math.inf
                elif prod <= -1.0:
                    out = -math.inf
                else:
                    out = math.log((1.0 + prod) / (1.0 - prod))
                c2s[c][j] = out
        for v in range(a.n):
            # message-first grouping, channel term last (see the min-sum
            # oracle note)
            macc = 0.0
            for s, c in enumerate(a.nlist[v]):
                macc += c2s[c][_cslot_of(a, v, c)]
            total = llr[v] + macc
            for s, c in enumerate(a.nlist[v]):
                out = total - c2s[c][_cslot_of(a, v, c)]
                if abs(out) > max_llr:
                    out = max_llr * sgn_pos(out)
                s2c[v][s] = out
            d[v] = 1 if total > 0 else -1
    return d, s2c, c2s


def syndrome_ok(a: Alist, d) -> bool:
    for c in range(a.m):
        prod = 1
        for v in a.mlist[c]:
            prod *= d[v]
        if prod < 0:
            return False
    return True


def gdbf_decode(
    a: Alist,
    yq,
    sigma: float,
    T: int,
    theta: float,
    sequential=False,
    mode_switching=False,
    t_switch=0,
    add_noise=False,
    noise_scale=1.0,
    threshold_adaptation=False,
    lam=0.991,
    weight_syndromes=False,
    alpha=2.25,
    output_smoothing=False,
    window_size=64,
    max_phases=1,
    perturbations=None,
    legacy_weight=False,
    weight_ymax=2.5,
):
    """GDBF family, single frame, mirroring decodeGDBF.cpp / RNGDBF.cpp.

    perturbations: [max_phases*T][N] pre-drawn noise (index = phase*T + it).
    Returns dict(d, iterations, satisfied, phases, smoothing_used).
    """
    n, m = a.n, a.m
    yq = list(map(float, yq))
    # sgn taken before quantization in the reference; signed zeros from
    # zero-level quantizers carry that sign (see decode_gdbf)
    r = [-1 if math.copysign(1.0, v) < 0 else 1 for v in yq]
    if weight_syndromes and legacy_weight:
        # RNGDBF.cpp:564-566: per-node w_i = alpha*Ymax/dv_i (old semantics)
        wv = [alpha * weight_ymax / len(a.nlist[v]) for v in range(n)]
    else:
        wv = [alpha if weight_syndromes else 1.0] * n
    total_iterations = 0
    smoothing_used = 0
    satisfied = False
    phases_attempted = 0
    d = list(r)
    for phase in range(max_phases):
        d = list(r)
        dsum = [0] * n
        thetas = [theta] * n
        mu = 0 if sequential else 1
        it = 0
        while it < T:
            syn = []
            satisfied = True
            for c in range(m):
                prod = 1
                for v in a.mlist[c]:
                    prod *= d[v]
                if prod < 0:
                    satisfied = False
                syn.append(prod)
            if satisfied:
                break
            if mode_switching and it > t_switch:
                f1 = sum(d[i] * yq[i] for i in range(n)) + sum(syn)
            if add_noise:
                pert = perturbations[phase * T + it]
            else:
                pert = [0.0] * n
            emin = math.inf
            mindx = -1
            for i in range(n):
                flip = False
                e = d[i] * yq[i] + pert[i]
                for c in a.nlist[i]:
                    e += wv[i] * syn[c]
                if mu == 1 and e < thetas[i]:
                    flip = True
                    d[i] = -d[i]
                if mu == 0 and e < emin:
                    flip = True
                    emin = e
                    mindx = i
                if threshold_adaptation and not flip:
                    thetas[i] *= lam
            if mu == 0 and mindx >= 0:
                d[mindx] = -d[mindx]
            if mode_switching and it > t_switch:
                f2 = sum(d[i] * yq[i] for i in range(n)) + sum(syn)
                if f1 >= f2:
                    mu = 0
            if output_smoothing and it > T - window_size:
                for i in range(n):
                    dsum[i] += d[i]
            it += 1
        if output_smoothing:
            if not satisfied:
                for i in range(n):
                    d[i] = 1 if dsum[i] > 0 else -1
            if it > T - window_size:
                smoothing_used += 1
        total_iterations += it
        phases_attempted = phase + 1
        if satisfied:
            break
    return dict(
        d=d,
        iterations=total_iterations,
        satisfied=satisfied,
        phases=phases_attempted,
        smoothing_used=smoothing_used,
    )


def ddbmp_decode(a: Alist, yq, T: int):
    """DD-BMP single frame (decodeDDBMP.cpp semantics).

    Returns dict(d, iterations, satisfied).
    """
    n, m = a.n, a.m
    yq = list(map(float, yq))
    s2c = [[sgn_pos(yq[v])] * len(a.nlist[v]) for v in range(n)]
    mem = [[yq[v]] * len(a.nlist[v]) for v in range(n)]
    c2s = [[0.0] * len(a.mlist[c]) for c in range(m)]
    d = [1 if v > 0 else -1 for v in yq]
    it = 0
    satisfied = False
    while it < T:
        # CN: sign product excluding self
        for c in range(m):
            prod = 1.0
            for v in a.mlist[c]:
                prod *= sgn_pos(s2c[v][_slot_of(a, v, c)])
            for j, v in enumerate(a.mlist[c]):
                c2s[c][j] = prod * sgn_pos(s2c[v][_slot_of(a, v, c)])
        # VN
        for v in range(n):
            total = yq[v]
            for c in a.nlist[v]:
                total += c2s[c][_cslot_of(a, v, c)]
            dsum = sgn_pos(yq[v])
            for s, c in enumerate(a.nlist[v]):
                msg = c2s[c][_cslot_of(a, v, c)]
                mem[v][s] += total - msg
                s2c[v][s] = sgn_pos(mem[v][s])
                dsum += s2c[v][s]
            d[v] = 1 if dsum > 0 else -1
        # stop check AFTER updates; break with current it
        satisfied = syndrome_ok(a, d)
        if satisfied:
            break
        it += 1
    return dict(d=d, iterations=it, satisfied=satisfied)


def ngdbf_hw_decode(
    a: Alist,
    y,
    sigma: float,
    ring_noise,
    T: int = 600,
    w: float = 0.185,
    ymax: float = 1.625,
    theta0: float = -0.525,
    nq: int = 5,
    max_phases: int = 1,
    true_bits=None,
    qpointer0: int = 0,
):
    """Fixed-point NGDBF single frame (NGDBFhw.cpp semantics).

    ring_noise: raw sigma'*n draws, length ring_len.  Returns dict with
    best-phase d (bits), least_iterations, least_errors, satisfied.
    """
    n, m = a.n, a.m
    lmax = ymax / (2.0 * w)
    nl = 2 ** nq - 1

    def quant_int(x):
        mag = math.floor(abs(x) * nl / (2.0 * lmax))
        sign = 1 if x > 0 else -1
        return sign * (2 * mag + 1)

    theta = quant_int(2.0)  # unpack(pack(quantize(2), +1)); positive input
    smult = math.floor(nl / lmax + 0.5)

    y = [float(v) for v in y]
    yc = [v * (ymax / abs(v)) if abs(v) > ymax else v for v in y]
    r = [1 if v > 0 else -1 for v in yc]
    d_init = [(1 - v) // 2 for v in r]
    yint = [quant_int(v / (2.0 * w)) for v in yc]
    qint = []
    for q in ring_noise:
        qm = (float(q) - theta0) / (2.0 * w) - 1.0
        qm = max(-lmax, min(lmax, qm))
        qint.append(quant_int(qm))
    ring_mod = len(ring_noise) - n
    c = list(true_bits) if true_bits is not None else [0] * n

    qptr = qpointer0
    least_iters = T
    least_errs = n
    best_d = list(d_init)
    satisfied = False
    for _phase in range(max_phases):
        d = list(d_init)
        it = 0
        satisfied = False
        while it < T:
            syn = []
            satisfied = True
            for ci in range(m):
                prod = 1
                for v in a.mlist[ci]:
                    prod *= 1 - 2 * d[v]
                if prod < 0:
                    satisfied = False
                syn.append((1 - prod) // 2)
            if satisfied:
                break
            for i in range(n):
                ssum = 0
                for ci in a.nlist[i]:
                    ssum += 1 - syn[ci]
                e = (1 - 2 * d[i]) * yint[i] + ssum * smult + qint[i + qptr]
                if e <= theta:
                    d[i] = 1 - d[i]
            qptr += 1
            if qptr >= ring_mod:
                qptr = 0
            it += 1
        errs = sum(1 for i in range(n) if d[i] != c[i])
        if errs < least_errs:
            least_errs = errs
            best_d = list(d)
        if it < least_iters:
            least_iters = it
    return dict(
        d=best_d,
        iterations=least_iters,
        least_errors=least_errs,
        satisfied=satisfied,
        final_qpointer=qptr,
    )


def quantize_threshold_table_py(x, ymax, nq):
    """SystemC ldpcsim.h:85-118 quantizer, scalar."""
    delta = 2.0 * ymax / (nq - 1.0)
    k = 0
    for i in range(nq - 1):
        thresh = -ymax * (nq - 2.0) / (nq - 1.0) + i * delta
        if x > thresh:
            k = i + 1
    return -ymax + k * delta


def ngdbf_systemc_decode(
    a: Alist,
    y,
    noise_stream,
    T: int,
    theta: float,
    lam: float,
    alpha: float,
    ymax: float,
    nq: int,
    smoothed: bool = True,
    window: int = 32,
):
    """SystemC NGDBF semantics, single frame (nodes.h/decoder.h)."""
    n, m = a.n, a.m
    qz = lambda v: quantize_threshold_table_py(v, ymax, nq)
    r = [qz(float(v)) for v in y]
    x = [1 if v > 0 else -1 for v in r]
    w = [alpha * ymax / len(a.nlist[i]) for i in range(n)]
    gq = [qz(float(v)) for v in noise_stream]
    local_theta = [theta] * n
    updown = [0] * n
    iters = T
    satisfied = False
    k = 0
    while k < T:
        syn = []
        satisfied = True
        for c in range(m):
            prod = 1
            for v in a.mlist[c]:
                prod *= x[v]
            if prod < 0:
                satisfied = False
            syn.append(prod)
        if satisfied:
            iters = k
            break
        for i in range(n):
            rnd = gq[(n - 1 - i) + k]
            e = x[i] * r[i] + rnd
            for c in a.nlist[i]:
                e += w[i] * syn[c]
            if e < qz(local_theta[i]):
                x[i] = -x[i]
                local_theta[i] /= lam
            else:
                local_theta[i] *= lam
        if smoothed and (k + 1) > (T - window):
            for i in range(n):
                updown[i] += x[i]
        k += 1
    if smoothed and not satisfied:
        x = [1 if updown[i] > 0 else -1 for i in range(n)]
    return dict(d=x, iterations=iters, satisfied=satisfied)


def stochastic_ngdbf_decode(
    a: Alist,
    yq,
    sigma: float,
    T: int,
    theta: float,
    noise_scale: float = 1.0,
    alpha: float = 2.25,
    weight_syndromes: bool = True,
    uniforms=None,
):
    """Stochastic NGDBF (decodeGDBF.cpp quantizeProbabilities branch,
    :562-597): flip probability Phi((theta-E)/sigma') snapped to the 8
    hardware levels (strict < scan, first min wins), Bernoulli flips.

    uniforms: [T][N] pre-drawn uniform(0,1).  Single frame.
    """
    n, m = a.n, a.m
    pr_levels = [0, 0.0625, 0.125, 0.25, 0.34375, 0.4106, 0.68359, 1]
    yq = list(map(float, yq))
    d = [1 if v > 0 else -1 for v in yq]
    w = alpha if weight_syndromes else 1.0
    noise_sigma = sigma * noise_scale
    it = 0
    satisfied = False

    def normal_cdf(x):
        return 0.5 * math.erfc(-x / math.sqrt(2.0))

    while it < T:
        syn = []
        satisfied = True
        for c in range(m):
            prod = 1
            for v in a.mlist[c]:
                prod *= d[v]
            if prod < 0:
                satisfied = False
            syn.append(prod)
        if satisfied:
            break
        for i in range(n):
            e = d[i] * yq[i]
            for c in a.nlist[i]:
                e += w * syn[c]
            pcdf = normal_cdf((-e + theta) / noise_sigma)
            min_dist = 1.0
            min_idx = 0
            for j, lv in enumerate(pr_levels):
                t2 = (lv - pcdf) ** 2
                if t2 < min_dist:
                    min_dist = t2
                    min_idx = j
            if uniforms[it][i] < pr_levels[min_idx]:
                d[i] = -d[i]
        it += 1
    return dict(d=d, iterations=it, satisfied=satisfied)
