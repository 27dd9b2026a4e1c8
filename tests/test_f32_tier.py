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


def test_coronagraph_babinet_f32_tier(f32):
    """f32 Babinet Lyot chain within 1e-4 peak-relative of f64.

    The Babinet subtraction E_in - E_back is the cancellation-prone
    stage; this pins how much the f32 tier loses in the dark hole.
    """
    from prysm_tpu.propagation.coronagraph import babinet

    def build(dtype):
        N, fN = 128, 64
        dx = 2.2 / N
        x, y = make_xy_grid(N, diameter=2.2)
        r, _ = cart_to_polar(jnp.asarray(np.asarray(x), dtype),
                             jnp.asarray(np.asarray(y), dtype))
        amp = antialias(circle_sdf(1.0, r), dx)
        lyot = antialias(circle_sdf(0.9, r), dx)
        plan = prepare_executor(dx, (N, N), 0.25, fN, 0.55, 10.0)
        fx = (np.arange(fN) - fN // 2) * 0.25
        fpm = jnp.asarray(
            (np.hypot(*np.meshgrid(fx, fx)) > 2.0).astype(np.float64),
            dtype)
        E = amp.astype(plan.Ex.dtype if hasattr(plan, 'Ex') else complex)
        return np.asarray(
            jnp.abs(babinet(amp + 0j, lyot=lyot, fpm=fpm,
                            executor=plan)) ** 2,
            dtype=np.float64)

    I32 = build(jnp.float32)
    config.precision = None
    I64 = build(jnp.float64)
    peak = I64.max()
    assert np.abs(I32 - I64).max() / peak < 1e-4


def test_detector_chain_f32_tier(f32):
    """Deterministic detector stages (no sampling) agree to f32 rounding."""
    from prysm_tpu.detector import Detector, bindown, tile

    img64 = np.linspace(0, 8e4, 256 * 256).reshape(256, 256)

    def stages(dtype):
        det = Detector(dark_current=2.0, read_noise=0.0, bias=100.0,
                       fwc=6e4, conversion_gain=0.5, bits=14,
                       exposure_time=1e-2)
        im = jnp.asarray(img64, dtype)
        # deterministic sub-chain: electrons -> clip -> gain -> ADC cap
        electrons = im * det.exposure_time \
            + det.dark_current * det.exposure_time
        clipped = jnp.clip(electrons, 0, det.fwc)
        dn = jnp.clip(clipped / det.conversion_gain + det.bias,
                      0, 2 ** det.bits - 1)
        small = bindown(dn, 4, mode='mean')
        big = tile(small, 4)
        return (np.asarray(dn, np.float64), np.asarray(small, np.float64),
                np.asarray(big, np.float64))

    dn32, sm32, bg32 = stages(jnp.float32)
    config.precision = None
    dn64, sm64, bg64 = stages(jnp.float64)
    assert np.abs(dn32 - dn64).max() / dn64.max() < 1e-6
    assert np.abs(sm32 - sm64).max() / sm64.max() < 1e-6
    assert np.abs(bg32 - bg64).max() / bg64.max() < 1e-6


def test_raytrace_chain_f32_tier(f32):
    """f32 doublet trace: landing coordinates within 1e-4 mm of f64.

    Surface intersection Newton iterations are the accuracy-limiting
    stage; this pins the tier for mm-scale systems.
    """
    import prysm_tpu.x.raytracing as rt
    import prysm_tpu.x.materials as mat
    from prysm_tpu.x.raytracing.spencer_and_murty import raytrace

    bk7 = mat.model_glass(1.5168, 64.17, name='BK7ish')
    lens = rt.LensData()
    lens.add(rt.Sphere(1 / 62.0), thickness=6.0, material=bk7)
    lens.add(rt.Sphere(-1 / 45.0), thickness=95.0, material=mat.air)
    sys_ = rt.OpticalSystem(lens, aperture=rt.ApertureSpec.epd(18.0),
                            fields=[0.0], wavelengths=[0.55], stop_index=1)
    surfaces = sys_.to_surfaces()
    P, S = rt.launch(sys_, sys_.field(), 0.55, rt.Sampling.hex(5))
    P = np.asarray(P, np.float64)
    S = np.asarray(S, np.float64)

    def trace(dtype):
        res = raytrace(surfaces, jnp.asarray(P, dtype),
                       jnp.asarray(S, dtype), 0.55)
        return (np.asarray(res.P[-1], np.float64),
                np.asarray(res.OPL.sum(axis=0), np.float64))

    P32, L32 = trace(jnp.float32)
    config.precision = None
    P64, L64 = trace(jnp.float64)
    assert np.abs(P32 - P64).max() < 1e-4       # mm at the image plane
    # OPL is ~100 mm of absolute path: f32 keeps ~1e-5 relative
    assert np.abs(L32 - L64).max() / np.abs(L64).max() < 1e-5


def test_interferogram_stats_f32_tier(f32):
    """pv/rms/Sa at f32 within 1e-5 relative of f64."""
    from prysm_tpu.interferogram import Interferogram

    rng = np.random.default_rng(11)
    z = rng.normal(scale=30.0, size=(128, 128))

    def stats(dtype):
        ig = Interferogram(phase=jnp.asarray(z, dtype), dx=0.1,
                           wavelength=0.6328)
        return np.asarray([float(ig.pv), float(ig.rms), float(ig.Sa)])

    s32 = stats(jnp.float32)
    config.precision = None
    s64 = stats(jnp.float64)
    np.testing.assert_allclose(s32, s64, rtol=1e-5)
