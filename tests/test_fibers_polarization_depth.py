"""Fiber mode finding and Jones/Mueller polarization: reference port.

Behavior matrix of /root/reference/tests/x/test_fibers.py (9 tests)
and test_polarization.py (9 tests): LP-mode counts against cutoff
theory, dispersion-equation root validity, sign-degenerate mirrors,
the single-mode fast path, Bessel-zero tabulation vs scipy, Jones
component matrices, Jones-to-Mueller conversion, Pauli matrices, and
the polarized propagation decorator across every supported routine.
"""
import numpy as np
import pytest

import jax  # NOQA: F401

import prysm_tpu.x.polarization as pol
from prysm_tpu.x.fibers import (
    _JZERO_MEMO, _besselj_positive_zeros, _ghatak_eq_8_40, find_all_modes)
from prysm_tpu.coordinates import cart_to_polar, make_xy_grid
from prysm_tpu.geometry import circle


def _np(x):
    return np.asarray(x)


# ---------- fibers ------------------------------------------------------------

def _expected_mode_count(ell, V, zero_table):
    """LP_{ell,m} count from cutoff theory.

    LP_{0,1} has no cutoff; LP_{0,m>=2} cuts off at V = j_{1, m-1}.
    LP_{l>=1, m} cuts off at V = j_{l-1, m}.
    """
    if ell == 0:
        return 1 + int((zero_table[1] < V).sum())
    return int((zero_table[ell - 1] < V).sum())


@pytest.fixture(scope='module')
def jn_zeros():
    sps = pytest.importorskip('scipy.special')
    return {n: sps.jn_zeros(n, 60) for n in range(61)}


@pytest.mark.parametrize('V', [3.0, 5.0, 10.0, 15.0, 20.0, 30.0, 40.0])
def test_find_all_modes_count_matches_cutoff_theory(V, jn_zeros):
    """Every LP_{l,m} predicted by cutoff theory must appear."""
    modes = find_all_modes(V)
    for ell, bs in modes.items():
        if ell < 0:
            continue
        expected = _expected_mode_count(ell, V, jn_zeros)
        assert len(bs) == expected, (
            f'V={V} ell={ell}: got {len(bs)} modes, expected {expected}')


@pytest.mark.parametrize('V', [5.0, 10.0, 20.0, 40.0])
def test_find_all_modes_roots_satisfy_equation(V):
    """Every reported b must zero the dispersion equation."""
    tol = 1e-4 if V <= 25 else 1e-2
    modes = find_all_modes(V)
    for ell, bs in modes.items():
        if ell < 0:
            continue
        for b in bs:
            r = float(_ghatak_eq_8_40(b, V, ell))
            assert abs(r) < tol, f'V={V} ell={ell} b={b}: residual {r}'


@pytest.mark.parametrize('V', [3.0, 8.0, 15.0, 25.0])
def test_negative_ell_mirrors_positive(V):
    modes = find_all_modes(V)
    for ell, bs in modes.items():
        if ell <= 0:
            continue
        assert -ell in modes
        np.testing.assert_array_equal(np.asarray(bs),
                                      np.asarray(modes[-ell]))


def test_v_below_first_cutoff_returns_single_mode():
    modes = find_all_modes(2.0)
    assert set(modes.keys()) == {0}
    assert len(modes[0]) == 1


@pytest.mark.parametrize('V', [0.5, 1.0, 2.0, 2.3])
def test_single_mode_fast_path_roots_satisfy_equation(V):
    modes = find_all_modes(V)
    assert set(modes.keys()) == {0}
    assert len(modes[0]) == 1
    assert abs(float(_ghatak_eq_8_40(modes[0][0], V, 0))) < 1e-6


@pytest.mark.parametrize('V', [2.5, 3.0, 3.7])
def test_low_v_two_family_fast_path_roots_satisfy_equation(V):
    """Between the first J_0 and J_1 zeros only LP_01 and LP_11 exist."""
    modes = find_all_modes(V)
    assert set(modes.keys()) == {0, 1, -1}
    assert len(modes[0]) == 1
    assert len(modes[1]) == 1
    np.testing.assert_array_equal(np.asarray(modes[1]),
                                  np.asarray(modes[-1]))
    assert abs(float(_ghatak_eq_8_40(modes[0][0], V, 0))) < 1e-6
    assert abs(float(_ghatak_eq_8_40(modes[1][0], V, 1))) < 1e-6


@pytest.mark.parametrize('V', [0.5, 2.5, 5.0, 10.0, 20.0, 40.0])
def test_count_only_matches_mode_lengths(V):
    modes = find_all_modes(V)
    counts = find_all_modes(V, count_only=True)
    assert counts == {ell: len(bs) for ell, bs in modes.items()}


def test_besselj_zeros_first_zero_large_order(jn_zeros):
    """First zero of high-order J_l is found."""
    for ell in (10, 20, 27, 35):
        zeros = _besselj_positive_zeros(ell, 50.0)
        scipy_zeros = jn_zeros[ell]
        scipy_zeros = scipy_zeros[scipy_zeros < 50.0]
        assert zeros.shape == scipy_zeros.shape
        np.testing.assert_allclose(zeros, scipy_zeros, atol=1e-5,
                                   rtol=1e-5)


def test_besselj_zero_cache_extends_after_empty_result(jn_zeros):
    """A below-cutoff cache entry must not mask later larger requests."""
    _JZERO_MEMO.clear()
    assert len(_besselj_positive_zeros(20, 10.0)) == 0
    zeros = _besselj_positive_zeros(20, 50.0)
    scipy_zeros = jn_zeros[20]
    scipy_zeros = scipy_zeros[scipy_zeros < 50.0]
    assert zeros.shape == scipy_zeros.shape
    np.testing.assert_allclose(zeros, scipy_zeros, atol=1e-5, rtol=1e-5)


# ---------- polarization ------------------------------------------------------

def test_rotation_matrix():
    angle = np.pi / 4
    control = 1 / np.sqrt(2) * np.array([[1, 1], [-1, 1]])
    assert np.allclose(control, _np(pol.jones_rotation_matrix(angle)))


def test_linear_retarder():
    control = np.array([[1, 0], [0, 1j]])  # QWP at 0 deg
    assert np.allclose(control, _np(pol.linear_retarder(np.pi / 2)))


def test_linear_diattenuator():
    control = np.array([[1, 0], [0, 0.5]])
    assert np.allclose(control, _np(pol.linear_diattenuator(0.5)))


def test_half_wave_plate():
    hwp = np.array([[1, 0], [0, -1]])
    assert np.allclose(hwp, _np(pol.half_wave_plate(0)))


def test_quarter_wave_plate():
    qwp = np.array([[1, 0], [0, 1j]])
    assert np.allclose(qwp, _np(pol.quarter_wave_plate()))


def test_linear_polarizer():
    lp = np.array([[1, 0], [0, 0]])
    assert np.allclose(lp, _np(pol.linear_polarizer()))


def test_jones_to_mueller():
    circ_pol = pol.quarter_wave_plate(theta=np.pi / 4)
    mueller_test = _np(pol.jones_to_mueller(circ_pol)) / 2
    mueller_circ = np.array([
        [1, 0, 0, 0],
        [0, 0, 0, -1],
        [0, 0, 1, 0],
        [0, 1, 0, 0],
    ]) / 2
    assert np.allclose(mueller_circ, mueller_test, atol=1e-5)


def test_pauli_spin_matrix():
    p0 = np.array([[1, 0], [0, 1]])
    p1 = np.array([[1, 0], [0, -1]])
    p2 = np.array([[0, 1], [1, 0]])
    p3 = np.array([[0, -1j], [1j, 0]])
    cmp = [_np(pol.pauli_spin_matrix(j)) for j in range(4)]
    assert np.allclose((p0, p1, p2, p3), cmp)


def test_make_propagation_polarized():
    xi, eta = make_xy_grid(256, diameter=10)
    r, t = cart_to_polar(xi, eta)
    A = _np(circle(5, r)).astype(float)
    wave = 1
    samples = A.shape[0]
    dx = 5 / samples

    # the Jones-matrix equivalent of the scalar aperture
    J = np.zeros([*A.shape, 2, 2])
    J[..., 0, 0] = A
    J[..., 1, 1] = A

    pol.add_jones_propagation()

    from prysm_tpu.propagation import (
        angular_spectrum, focus, focus_dft, prepare_executor, unfocus,
        unfocus_dft)

    A_psf = _np(focus(A, Q=2))
    J_psf = _np(focus(J, Q=2))

    A_pupil = _np(unfocus(A_psf, Q=1))
    J_pupil = _np(unfocus(J_psf, Q=1))

    A_prop = _np(angular_spectrum(A_pupil, wvl=wave, dx=dx, z=5e1, Q=1))
    J_prop = _np(angular_spectrum(J_pupil, wvl=wave, dx=dx, z=5e1, Q=1))

    mdft = prepare_executor(pupil_dx=dx, pupil_samples=samples,
                            focal_dx=1000e-3, focal_samples=256,
                            wavelength=wave, efl=50)
    A_psf_fixed = _np(focus_dft(A, mdft))
    J_psf_fixed = _np(focus_dft(J, mdft))
    A_pupil_fixed = _np(unfocus_dft(A_psf_fixed, mdft))
    J_pupil_fixed = _np(unfocus_dft(J_psf_fixed, mdft))

    slc = (..., 0, 0)
    assert np.allclose(A_psf, J_psf[slc])
    assert np.allclose(A_pupil, J_pupil[slc])
    assert np.allclose(A_prop, J_prop[slc])
    assert np.allclose(A_psf_fixed, J_psf_fixed[slc])
    assert np.allclose(A_pupil_fixed, J_pupil_fixed[slc])
