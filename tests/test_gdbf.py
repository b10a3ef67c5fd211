"""GDBF/NGDBF family decoder vs the ragged oracle and statistical checks."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpcsimulation_tpu.channel import awgn, saturate, snr_to_sigma
from ldpcsimulation_tpu.codes import build_code, make_regular_code, peg
from ldpcsimulation_tpu.decoders.gdbf import (
    GDBFConfig,
    PRESETS,
    decode_gdbf,
    preset,
)
from tests import oracle


@pytest.fixture(scope="module")
def gcode():
    a = peg(48, 24, 3, seed=11)
    return a, build_code(a)


def _channel(rng, b, n, sigma):
    x = np.ones((b, n))
    noise = rng.normal(0.0, 1.0, size=(b, n))
    return x * (1.0 + sigma * noise)


def _run_pair(a, code, y, sigma, cfg: GDBFConfig, perturbations=None):
    """Run JAX decoder and oracle on the same frames; compare everything."""
    b = y.shape[0]
    pert_jax = None
    if perturbations is not None:
        # [steps, B, N] -> [steps, N, B]
        pert_jax = jnp.asarray(np.swapaxes(perturbations, 1, 2))
    res = decode_gdbf(
        code, jnp.asarray(y), sigma, cfg,
        key=jax.random.key(0), perturbations=pert_jax,
    )
    hard = np.asarray(res.hard)
    iters = np.asarray(res.iterations)
    sats = np.asarray(res.satisfied)
    phases = np.asarray(res.phases)
    smooth = np.asarray(res.smoothing_used)
    for f in range(b):
        ref = oracle.gdbf_decode(
            a,
            y[f],
            sigma,
            cfg.num_iterations,
            cfg.theta,
            sequential=cfg.sequential,
            mode_switching=cfg.mode_switching,
            t_switch=cfg.t_switch,
            add_noise=cfg.add_noise,
            noise_scale=cfg.noise_scale,
            threshold_adaptation=cfg.threshold_adaptation,
            lam=cfg.lam,
            weight_syndromes=cfg.weight_syndromes,
            alpha=cfg.alpha,
            output_smoothing=cfg.output_smoothing,
            window_size=cfg.window_size,
            max_phases=cfg.max_phases,
            legacy_weight=cfg.legacy_weight,
            weight_ymax=cfg.weight_ymax,
            perturbations=None
            if perturbations is None
            else [list(p) for p in perturbations[:, f, :]],
        )
        np.testing.assert_array_equal(hard[f], ref["d"], err_msg=f"frame {f}")
        assert iters[f] == ref["iterations"], f"frame {f} iters"
        assert bool(sats[f]) == ref["satisfied"], f"frame {f} satisfied"
        assert phases[f] == ref["phases"], f"frame {f} phases"
        assert smooth[f] == ref["smoothing_used"], f"frame {f} smoothing"


SIGMA = float(snr_to_sigma(4.0, 0.5))


@pytest.mark.parametrize(
    "name", ["GDBF", "SGDBF", "MGDBF", "ATGDBF", "SATGDBF", "SMGDBF"]
)
def test_deterministic_variants_match_oracle(gcode, rng, name):
    a, code = gcode
    y = _channel(rng, 6, a.n, SIGMA)
    cfg = preset(name, num_iterations=12, theta=-0.6, window_size=8)
    _run_pair(a, code, y, SIGMA, cfg)


def test_noisy_variant_matches_oracle_with_injected_noise(gcode, rng):
    """SMNGDBF with an injected perturbation sequence must match exactly."""
    a, code = gcode
    b = 4
    y = _channel(rng, b, a.n, SIGMA)
    y = np.clip(y, -2.5, 2.5)  # saturateSamples
    cfg = preset(
        "SMNGDBF",
        num_iterations=10,
        theta=-0.9,
        noise_scale=0.9,
        lam=0.98,
        alpha=1.5,
        window_size=6,
    )
    steps = cfg.max_phases * cfg.num_iterations
    pert = rng.normal(
        0.0, SIGMA * cfg.noise_scale, size=(steps, b, a.n)
    )
    _run_pair(a, code, y, SIGMA, cfg, perturbations=pert)


def test_redecode_matches_oracle_with_injected_noise(gcode, rng):
    a, code = gcode
    b = 4
    # noisier channel so redecode phases actually engage
    sigma = float(snr_to_sigma(2.0, 0.5))
    y = np.clip(_channel(rng, b, a.n, sigma), -2.5, 2.5)
    cfg = preset(
        "RSMNGDBF",
        num_iterations=8,
        theta=-0.9,
        noise_scale=0.9,
        lam=0.98,
        alpha=1.5,
        window_size=4,
        max_phases=3,
    )
    steps = cfg.max_phases * cfg.num_iterations
    pert = rng.normal(0.0, sigma * cfg.noise_scale, size=(steps, b, a.n))
    _run_pair(a, code, y, sigma, cfg, perturbations=pert)


def test_gdbf_early_termination_counts(gcode, rng):
    a, code = gcode
    # nearly noiseless: channel hard decisions already satisfy all checks
    y = _channel(rng, 8, a.n, 0.01)
    cfg = GDBFConfig(num_iterations=10, theta=-0.5)
    res = decode_gdbf(code, jnp.asarray(y), 0.01, cfg)
    assert np.asarray(res.iterations).tolist() == [0] * 8
    assert np.asarray(res.satisfied).all()
    assert (np.asarray(res.hard) == 1).all()


def test_smngdbf_decodes_at_moderate_snr():
    """Statistical end-to-end: SM-NGDBF corrects most frames at 4.5 dB."""
    code = make_regular_code(96, 48, 3, seed=0)
    b = 128
    sigma = float(snr_to_sigma(4.5, 0.5))
    key = jax.random.key(9)
    y = awgn(key, jnp.ones((b, code.n)), sigma)
    yq = saturate(y, 2.5)
    cfg = preset(
        "SMNGDBF",
        num_iterations=100,
        theta=-0.9,
        noise_scale=0.95,
        lam=0.99,
        alpha=1.2,
        window_size=16,
    )
    res = decode_gdbf(code, yq, sigma, cfg, key=jax.random.key(10))
    hard = np.asarray(res.hard)
    frame_ok = (hard == 1).all(axis=1)
    uncoded_fer = float((np.asarray(y) < 0).any(axis=1).mean())
    assert frame_ok.mean() > 0.7
    assert frame_ok.mean() > 1.0 - uncoded_fer  # beats no decoding
    # satisfied frames for the all-one codeword must be all-one or a codeword
    assert np.asarray(res.iterations)[frame_ok].mean() < 100


def test_gdbf_reproducible(gcode, rng):
    a, code = gcode
    y = jnp.asarray(_channel(rng, 8, a.n, SIGMA))
    cfg = preset("MNGDBF", num_iterations=20, theta=-0.7, noise_scale=0.8)
    r1 = decode_gdbf(code, y, SIGMA, cfg, key=jax.random.key(3))
    r2 = decode_gdbf(code, y, SIGMA, cfg, key=jax.random.key(3))
    np.testing.assert_array_equal(np.asarray(r1.hard), np.asarray(r2.hard))
    r3 = decode_gdbf(code, y, SIGMA, cfg, key=jax.random.key(4))
    assert (np.asarray(r3.hard) != np.asarray(r1.hard)).any() or not np.asarray(
        r1.satisfied
    ).all()


def test_stochastic_ngdbf_runs(gcode, rng):
    a, code = gcode
    y = jnp.asarray(_channel(rng, 16, a.n, SIGMA))
    cfg = preset(
        "StochasticNGDBF", num_iterations=50, theta=-0.6, noise_scale=1.0,
        alpha=1.0,
    )
    res = decode_gdbf(code, y, SIGMA, cfg, key=jax.random.key(1))
    assert np.isin(np.asarray(res.hard), (-1, 1)).all()
    # at 4 dB most frames should still converge with stochastic flips
    assert np.asarray(res.satisfied).mean() > 0.5


def test_presets_cover_reference_binaries():
    """Every reference GDBF binary has a named preset (Makefile:24-56)."""
    for name in [
        "MGDBF",
        "SGDBF",
        "StochasticNGDBF",
        "MNGDBF",
        "SMNGDBF",
        "SMGDBF",
        "SATGDBF",
        "ATGDBF",
        "RSMNGDBF",
    ]:
        assert name in PRESETS
    cfg = preset("SMNGDBF", num_iterations=300, theta=-0.9)
    assert cfg.add_noise and cfg.threshold_adaptation
    assert cfg.weight_syndromes and cfg.output_smoothing
    assert dataclasses.asdict(cfg)["max_phases"] == 1
    assert preset("RSMNGDBF", 300, -0.9).max_phases == 7


def test_gdbf_qc_graph_ops_bitexact(rng):
    """decode_gdbf with QC graph ops must match the generic path exactly."""
    from ldpcsimulation_tpu.codes.qc import qc_peg

    qc = qc_peg(12, 6, 3, z=8, seed=3)
    code = qc.to_code()
    sigma = float(snr_to_sigma(3.5, 0.5))
    y = np.clip(_channel(rng, 6, qc.n, sigma), -2.5, 2.5)
    cfg = preset("SMNGDBF", num_iterations=15, theta=-0.8, noise_scale=0.9,
                 lam=0.98, alpha=1.5, window_size=6)
    steps = cfg.max_phases * cfg.num_iterations
    pert = rng.normal(0.0, sigma * 0.9, size=(steps, 6, qc.n))
    pj = jnp.asarray(np.swapaxes(pert, 1, 2))
    r1 = decode_gdbf(code, jnp.asarray(y), sigma, cfg,
                     key=jax.random.key(0), perturbations=pj)
    r2 = decode_gdbf(code, jnp.asarray(y), sigma, cfg,
                     key=jax.random.key(0), perturbations=pj, qc=qc)
    np.testing.assert_array_equal(np.asarray(r1.hard), np.asarray(r2.hard))
    np.testing.assert_array_equal(
        np.asarray(r1.iterations), np.asarray(r2.iterations)
    )
    np.testing.assert_array_equal(
        np.asarray(r1.smoothing_used), np.asarray(r2.smoothing_used)
    )


def test_stochastic_ngdbf_matches_oracle_with_injected_uniforms(gcode, rng):
    """Stochastic NGDBF with injected uniform draws must match exactly."""
    a, code = gcode
    b = 4
    sigma = float(snr_to_sigma(4.0, 0.5))
    y = np.clip(_channel(rng, b, a.n, sigma), -2.0, 2.0)
    cfg = preset(
        "StochasticNGDBF", num_iterations=12, theta=-0.6,
        noise_scale=1.0, alpha=1.0,
    )
    uni = rng.uniform(size=(cfg.num_iterations, b, a.n))
    res = decode_gdbf(
        code, jnp.asarray(y), sigma, cfg, key=jax.random.key(0),
        stoch_uniforms=jnp.asarray(np.swapaxes(uni, 1, 2)),
    )
    hard = np.asarray(res.hard)
    iters = np.asarray(res.iterations)
    for f in range(b):
        ref = oracle.stochastic_ngdbf_decode(
            a, y[f], sigma, cfg.num_iterations, cfg.theta,
            noise_scale=cfg.noise_scale, alpha=cfg.alpha,
            uniforms=[list(u) for u in uni[:, f, :]],
        )
        np.testing.assert_array_equal(hard[f], ref["d"], err_msg=f"frame {f}")
        assert iters[f] == ref["iterations"], f"frame {f}"
