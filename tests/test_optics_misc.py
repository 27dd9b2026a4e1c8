"""thinlens / thinfilm / refractive / objects / degradations / conv vs
reference.  Detector and Bayer depth lives in test_detector_bayer.py."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prysm_tpu import thinlens, thinfilm, refractive, detector, bayer, objects
from prysm_tpu import degradations, convolution
from prysm_tpu.coordinates import make_xy_grid, cart_to_polar

import prysm.thinlens as ref_thinlens
import prysm.thinfilm as ref_thinfilm
import prysm.refractive as ref_refractive
import prysm.detector as ref_detector
import prysm.bayer as ref_bayer
import prysm.objects as ref_objects
import prysm.degradations as ref_degradations
import prysm.convolution as ref_convolution


_THINLENS_CASES = [
    ('object_to_image_dist', (50.0, -200.0)),
    ('image_to_object_dist', (50.0, 70.0)),
    ('object_image_to_efl', (-200.0, 70.0)),
    ('efl_to_power', (100.0,)),
    ('power_to_efl', (0.01,)),
    ('efl_to_fno', (100.0, 25.0)),
    ('fno_to_efl', (4.0, 25.0)),
    ('fno_to_epd', (4.0, 100.0)),
    ('image_dist_epd_to_na', (100.0, 25.0)),
    ('image_dist_epd_to_fno', (100.0, 25.0)),
    ('fno_to_na', (4.0,)),
    ('na_to_fno', (0.125,)),
    ('object_dist_to_mag', (50.0, -500.0)),
    ('mag_to_object_dist', (50.0, -0.1)),
    ('mag_to_image_dist', (50.0, -0.1)),
    ('linear_to_long_mag', (-0.1,)),
    ('mag_to_fno', (-0.1, 4.0)),
    ('mag_to_fno', (-0.5, 2.8, 0.8)),
    ('defocus_to_image_displacement', (0.5, 4.0, 0.55)),
    ('image_displacement_to_defocus', (10.0, 4.0, 0.55)),
    ('image_shift_to_tilt', (5.0, 4.0)),
    ('tilt_to_image_shift', (0.25, 4.0)),
    ('singlet_power', (0.01, -0.005, 3.0, 1.5)),
    ('singlet_efl', (0.01, -0.005, 3.0, 1.5)),
    ('singlet_bfl', (0.01, -0.005, 3.0, 1.5)),
    ('singlet_ffl', (0.01, -0.005, 3.0, 1.5)),
    ('singlet_efl', (0.01, -0.005, 3.0, 1.7, 1.33)),
    ('twolens_power', (100.0, -50.0, 20.0)),
    ('twolens_efl', (100.0, -50.0, 20.0)),
    ('twolens_bfl', (100.0, -50.0, 20.0)),
    ('twolens_ffl', (100.0, -50.0, 20.0)),
    ('twolens_separation', (100.0, -50.0, 120.0)),
]


@pytest.mark.parametrize('name,args', _THINLENS_CASES,
                         ids=[f'{n}{a}' for n, a in _THINLENS_CASES])
def test_thinlens_scalar_relations_match(name, args):
    ours = float(getattr(thinlens, name)(*args))
    theirs = float(getattr(ref_thinlens, name)(*args))
    np.testing.assert_allclose(ours, theirs, rtol=1e-12, err_msg=name)


@pytest.mark.parametrize('pol', ['s', 'p'])
@pytest.mark.parametrize('aoi', [0, 20, 45])
def test_multilayer_stack_rt_matches(pol, aoi):
    indices = np.asarray([1.45, 2.2, 1.45, 2.2])
    thicknesses = np.asarray([0.2, 0.1, 0.2, 0.1])
    r_o, t_o = thinfilm.multilayer_stack_rt(indices, thicknesses, 0.55, pol,
                                            1.52, aoi=aoi)
    r_r, t_r = ref_thinfilm.multilayer_stack_rt(indices, thicknesses, 0.55, pol,
                                                1.52, aoi=aoi)
    np.testing.assert_allclose(np.asarray(r_o), np.asarray(r_r), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(t_o), np.asarray(t_r), rtol=1e-10, atol=1e-12)


def test_multilayer_stack_vectorized_matches():
    # trailing spatial dim
    base = np.asarray([1.45, 2.2])
    thk = np.linspace(0.05, 0.3, 7)
    indices = np.broadcast_to(base[:, None], (2, 7))
    thicknesses = np.stack([thk, thk[::-1]])
    r_o, t_o = thinfilm.multilayer_stack_rt(indices, thicknesses, 0.633, 's', 1.5, aoi=10)
    r_r, t_r = ref_thinfilm.multilayer_stack_rt(indices, thicknesses, 0.633, 's', 1.5, aoi=10)
    np.testing.assert_allclose(np.asarray(r_o), np.asarray(r_r), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(t_o), np.asarray(t_r), rtol=1e-10, atol=1e-12)


def test_multilayer_stack_grad_runs():
    """Stack r/t differentiates w.r.t. thicknesses (new capability)."""
    def R(thk):
        r, _ = thinfilm.multilayer_stack_rt(
            jnp.asarray([1.45, 2.2, 1.45]), thk, 0.55, 's', 1.52)
        return jnp.abs(r) ** 2
    g = jax.grad(lambda thk: R(thk).sum())(jnp.asarray([0.1, 0.2, 0.1]))
    assert np.all(np.isfinite(np.asarray(g)))


def test_fresnel_coefficients_match():
    th0, th1 = 0.3, 0.2
    for name in ('fresnel_rs', 'fresnel_ts', 'fresnel_rp', 'fresnel_tp'):
        ours = float(getattr(thinfilm, name)(1.0, 1.5, th0, th1))
        theirs = float(getattr(ref_thinfilm, name)(1.0, 1.5, th0, th1))
        np.testing.assert_allclose(ours, theirs, rtol=1e-13, err_msg=name)


def test_refractive_matches():
    wvl = np.linspace(0.4, 0.8, 16)
    ours = np.asarray(refractive.cauchy(jnp.asarray(wvl), 1.5, 0.003, 0.0001))
    theirs = np.asarray(ref_refractive.cauchy(wvl, 1.5, 0.003, 0.0001))
    np.testing.assert_allclose(ours, theirs, rtol=1e-13)
    A = [1.03961212, 0.231792344, 1.01046945]
    B = [0.00600069867, 0.0200179144, 103.560653]
    ours = np.asarray(refractive.sellmeier(jnp.asarray(wvl), A, B))
    theirs = np.asarray(ref_refractive.sellmeier(wvl, A, B))
    np.testing.assert_allclose(ours, theirs, rtol=1e-13)



def test_bindown_tile_vdot_adjoint():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 4))
    y = rng.standard_normal((8, 8))
    Ax = np.asarray(detector.tile(jnp.asarray(x), 2, 'sum'))
    # adjoint of tile('sum') is bindown('avg') — both carry the 1/f^2 factor
    Aty = np.asarray(detector.bindown(jnp.asarray(y), 2, 'avg'))
    np.testing.assert_allclose(np.vdot(Ax, y), np.vdot(x, Aty), rtol=1e-12)






def test_objects_match():
    x, y = make_xy_grid(32, diameter=2)
    rx, ry = np.asarray(x), np.asarray(y)
    r, t = cart_to_polar(x, y)
    rr, rt = np.asarray(r), np.asarray(t)
    np.testing.assert_allclose(
        np.asarray(objects.slit(x, y, 0.5, 0.25)),
        np.asarray(ref_objects.slit(rx, ry, 0.5, 0.25)))
    np.testing.assert_allclose(
        np.asarray(objects.pinhole(0.5, r)),
        np.asarray(ref_objects.pinhole(0.5, rr)))
    np.testing.assert_allclose(
        np.asarray(objects.siemensstar(r, t, 20)),
        np.asarray(ref_objects.siemensstar(rr, rt, 20)), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(objects.tiltedsquare(x, y)),
        np.asarray(ref_objects.tiltedsquare(rx, ry)), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(objects.slantededge(x, y)),
        np.asarray(ref_objects.slantededge(rx, ry)), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(objects.pinhole_ft(0.5, r)),
        np.asarray(ref_objects.pinhole_ft(0.5, rr)), rtol=2e-7, atol=2e-8)
    # slit_ft requires 1D frequency vectors (fx[0, 1] indexing after
    # optimize_xy_separable, in both implementations)
    fx1 = rx[0]
    fy1 = ry[:, 0]
    np.testing.assert_allclose(
        np.asarray(objects.slit_ft(0.5, 0.25, jnp.asarray(fx1), jnp.asarray(fy1))),
        np.asarray(ref_objects.slit_ft(0.5, 0.25, fx1, fy1)), rtol=1e-10, atol=1e-12)


def test_degradations_match():
    x, y = make_xy_grid(16, diameter=4)
    fx, fy = np.asarray(x), np.asarray(y)
    r = np.hypot(fx, fy)
    np.testing.assert_allclose(
        np.asarray(degradations.smear_ft(x, y, 0.1, 0.2)),
        np.asarray(ref_degradations.smear_ft(fx, fy, 0.1, 0.2)), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(degradations.jitter_ft(jnp.asarray(r), 0.3)),
        np.asarray(ref_degradations.jitter_ft(r, 0.3)), rtol=1e-12)


def test_conv_matches():
    rng = np.random.default_rng(5)
    obj = rng.random((16, 16))
    psf = rng.random((16, 16))
    ours = np.asarray(convolution.conv(jnp.asarray(obj), jnp.asarray(psf)))
    theirs = np.asarray(ref_convolution.conv(obj, psf))
    np.testing.assert_allclose(ours, theirs, rtol=1e-11, atol=1e-12)


def test_apply_transfer_functions_matches():
    rng = np.random.default_rng(6)
    obj = rng.random((16, 16))
    tfs = [lambda fr: np.exp(-(fr / 10) ** 2)]
    ours = np.asarray(convolution.apply_transfer_functions(jnp.asarray(obj), 0.1, tfs))
    theirs = np.asarray(ref_convolution.apply_transfer_functions(obj, 0.1, tfs))
    np.testing.assert_allclose(ours, theirs, rtol=1e-10, atol=1e-12)
