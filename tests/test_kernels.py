"""Pallas kernel tests (interpreter mode on CPU; real Mosaic on TPU)."""

import numpy as np
import pytest

from ldpcsimulation_tpu.kernels.channel_pallas import awgn_all_zero_pallas


def _run(seed, b, n, sigma):
    try:
        return np.asarray(awgn_all_zero_pallas(seed, b, n, sigma))
    except Exception as e:  # pragma: no cover - platform-dependent support
        pytest.skip(f"pallas unsupported on this backend: {e}")


def test_awgn_kernel_statistics():
    y = _run(0, 2048, 256, 0.5)
    assert y.shape == (2048, 256)
    assert abs(y.mean() - 1.0) < 0.01
    assert abs(y.std() - 0.5) < 0.01
    # per-tile streams differ and are deterministic
    y2 = _run(0, 2048, 256, 0.5)
    np.testing.assert_array_equal(y, y2)
    y3 = _run(1, 2048, 256, 0.5)
    assert (y != y3).any()


def test_awgn_kernel_tile_independence():
    y = _run(7, 1024, 128, 1.0)
    t0, t1 = y[:256], y[256:512]
    assert not np.allclose(t0, t1)
    # no degenerate constant rows
    assert (y.std(axis=1) > 0.5).all()


def test_minsum_cn_scan_pallas_bitexact(rng):
    """Pallas CN scan == XLA CN update, bit for bit (runs on TPU; the CPU
    interpreter path is exercised if supported, else skipped)."""
    import jax
    import jax.numpy as jnp

    from ldpcsimulation_tpu.codes import make_regular_code
    from ldpcsimulation_tpu.decoders.base import gather_cn
    from ldpcsimulation_tpu.decoders.minsum import minsum_cn_update
    from ldpcsimulation_tpu.kernels.minsum_pallas import minsum_cn_scan_pallas

    code = make_regular_code(96, 48, 3, seed=0)
    v2c = jnp.asarray(
        rng.normal(size=(code.n * code.dv_max, 128)), jnp.float32
    )
    g = gather_cn(code, v2c)
    try:
        out_pl = np.asarray(minsum_cn_scan_pallas(g, code.cn_mask))
    except Exception as e:
        pytest.skip(f"pallas unsupported on this backend: {e}")
    out_xla = np.asarray(minsum_cn_update(code, v2c)).reshape(
        code.m, code.dc_max, 128
    )
    np.testing.assert_array_equal(out_pl, out_xla)


def test_awgn_hybrid_statistics():
    """Hardware-PRNG uniforms + XLA erfinv Gaussian: correct moments,
    deterministic per seed (see channel_pallas.awgn_all_zero_hybrid)."""
    from ldpcsimulation_tpu.kernels.channel_pallas import (
        awgn_all_zero_hybrid,
    )

    try:
        y = np.asarray(awgn_all_zero_hybrid(3, 2048, 256, 0.5))
    except Exception as e:  # pragma: no cover - platform-dependent support
        pytest.skip(f"pallas unsupported on this backend: {e}")
    assert abs(y.mean() - 1.0) < 0.01
    assert abs(y.std() - 0.5) < 0.01
    y2 = np.asarray(awgn_all_zero_hybrid(3, 2048, 256, 0.5))
    np.testing.assert_array_equal(y, y2)


def test_awgn_kernel_seed_tile_decorrelation():
    """Regression: seeding per-tile as seed+program_id made stream (s, i)
    identical to (s+1, i-1); the mixed-seed form must not reproduce a
    neighboring seed's tiles."""
    tile = 256
    y0 = _run(0, 2048, 256, 0.5)
    y1 = _run(1, 2048, 256, 0.5)
    for i in range(7):
        assert not np.array_equal(
            y0[(i + 1) * tile:(i + 2) * tile], y1[i * tile:(i + 1) * tile]
        )
