"""Thin-lens conversion relations, in depth (reference test_thinlens.py).

Every relation is checked against its closed-form first-order-optics
formula, and inverse pairs are checked to round-trip.
"""
import numpy as np
import pytest

from prysm_tpu import thinlens


@pytest.mark.parametrize('objdist', [1.25, 2, 3, -1, -2])
def test_magnification_matches_thin_lens_formula(objdist):
    efl = 1
    assert float(thinlens.object_dist_to_mag(efl, objdist)) == pytest.approx(
        efl / (efl - objdist))


@pytest.mark.parametrize('mag', [0, 1, 2, 3, 3.05])
def test_linear_to_long_mag(mag):
    assert float(thinlens.linear_to_long_mag(mag)) == mag ** 2


@pytest.mark.parametrize('mag', [0, 1, -2, 3.05])
@pytest.mark.parametrize('inf_fno', [1, 1.25, 2])
def test_mag_to_fno_matches_working_fno_formula(mag, inf_fno):
    pupil_mag = 0.5
    got = float(thinlens.mag_to_fno(mag, inf_fno, pupil_mag))
    assert got == pytest.approx((1 + abs(mag) / pupil_mag) * inf_fno)


@pytest.mark.parametrize('fno', [1, 1.4, 2, 2.8, 4, 5.6, 8, 11, 16, 22])
def test_fno_to_na_and_back_invert(fno):
    na = thinlens.fno_to_na(fno)
    assert float(thinlens.na_to_fno(na)) == pytest.approx(fno, rel=0.05,
                                                          abs=0.01)


def test_object_to_image_distance_unity_case():
    # symmetric 1:1 conjugates: image distance = -object distance
    assert float(thinlens.object_to_image_dist(1, -2)) == pytest.approx(2)


def test_object_image_to_efl_inverts_object_to_image_dist():
    efl = 50
    obj = np.array([-75.0, -100.0, -200.0])
    img = np.asarray(thinlens.object_to_image_dist(efl, obj))
    np.testing.assert_allclose(
        np.asarray(thinlens.object_image_to_efl(obj, img)), efl, rtol=1e-10)


def test_power_and_efl_invert():
    efl = np.array([50.0, 100.0, -200.0])
    power = np.asarray(thinlens.efl_to_power(efl, 1.33))
    np.testing.assert_allclose(
        np.asarray(thinlens.power_to_efl(power, 1.33)), efl, rtol=1e-12)


def test_efl_fno_epd_conversions():
    efl, epd = -100, 25
    fno = float(thinlens.efl_to_fno(efl, epd))
    assert fno == 4
    assert float(thinlens.fno_to_efl(fno, epd)) == abs(efl)
    assert float(thinlens.fno_to_epd(fno, efl)) == epd


def test_image_distance_epd_to_fno_matches_na_conversion():
    fno = thinlens.image_dist_epd_to_fno(10, 5)
    na = thinlens.image_dist_epd_to_na(10, 5)
    assert float(fno) == pytest.approx(float(thinlens.na_to_fno(na)))


def test_image_distance_epd_to_na_returns_numerical_aperture():
    got = float(thinlens.image_dist_epd_to_na(10, 5))
    assert got == pytest.approx(np.sin(np.arctan2(2.5, 10)))


def test_image_displacement_to_defocus_both_unit_modes():
    displacement = np.array([-50.0, 0.0, 5.0, 50.0])
    fno, wvl = 4, 0.55
    in_waves = np.asarray(
        thinlens.image_displacement_to_defocus(displacement, fno, wvl))
    in_um = np.asarray(
        thinlens.image_displacement_to_defocus(displacement, fno))
    np.testing.assert_allclose(in_waves,
                               displacement / (8 * fno ** 2 * wvl))
    np.testing.assert_allclose(in_um, displacement / (8 * fno ** 2))


def test_defocus_to_image_displacement_both_unit_modes():
    defocus = np.array([-2.0, 0.0005, 2.0])
    fno, wvl = 4, 0.55
    in_waves = np.asarray(
        thinlens.defocus_to_image_displacement(defocus, fno, wvl))
    in_um = np.asarray(thinlens.defocus_to_image_displacement(defocus, fno))
    np.testing.assert_allclose(in_waves, 8 * fno ** 2 * wvl * defocus)
    np.testing.assert_allclose(in_um, 8 * fno ** 2 * defocus)


@pytest.mark.parametrize('mag', [-2, -1, -0.5, 0.5, 2])
def test_mag_to_object_dist_inverts(mag):
    efl = 10
    obj = thinlens.mag_to_object_dist(efl, mag)
    assert float(thinlens.object_dist_to_mag(efl, obj)) == pytest.approx(mag)


@pytest.mark.parametrize('mag', [-2, -1, -0.5, 0.5, 2])
def test_mag_to_image_dist_matches_conjugate_equation(mag):
    efl = 10
    obj = thinlens.mag_to_object_dist(efl, mag)
    img = thinlens.mag_to_image_dist(efl, mag)
    assert float(img) == pytest.approx(
        float(thinlens.object_to_image_dist(efl, -obj)))


def test_twolens_efl_in_contact():
    assert float(thinlens.twolens_efl(2.0, 2.0, 0)) == pytest.approx(1.0)


def test_twolens_bfl_matches_efl_in_contact():
    assert float(thinlens.twolens_bfl(2.0, 2.0, 0)) == pytest.approx(1.0)


def test_twolens_bfl_first_order_formula():
    efl1, efl2, t = 100, 100, 20
    efl = float(thinlens.twolens_efl(efl1, efl2, t))
    assert float(thinlens.twolens_bfl(efl1, efl2, t)) == pytest.approx(
        efl * (1 - t / efl1))


def test_twolens_ffl_first_order_formula():
    efl1, efl2, t = 100, 50, 10
    efl = float(thinlens.twolens_efl(efl1, efl2, t))
    assert float(thinlens.twolens_ffl(efl1, efl2, t)) == pytest.approx(
        -efl * (1 - t / efl2))


def test_twolens_power_and_separation_invert():
    efl1, efl2, t = 75, 125, 12
    efl = float(thinlens.twolens_efl(efl1, efl2, t))
    assert float(thinlens.twolens_power(efl1, efl2, t)) == pytest.approx(
        1 / efl)
    assert float(thinlens.twolens_separation(efl1, efl2, efl)) \
        == pytest.approx(t)


def test_singlet_efl_known_value():
    c = 1 / 200
    assert float(thinlens.singlet_efl(c, -c, 0, 1.55)) == pytest.approx(
        181.8181818181818)


def test_singlet_power_matches_efl():
    c1, c2 = 1 / 100, -1 / 100
    power = float(thinlens.singlet_power(c1, c2, 8, 1.5))
    efl = float(thinlens.singlet_efl(c1, c2, 8, 1.5))
    assert efl == pytest.approx(1 / power)


def test_singlet_efl_uses_ambient_index():
    c = 1 / 100
    n_ambient = 1.33
    got = float(thinlens.singlet_efl(c, -c, 0, 1.5, n_ambient))
    expected_power = 2 * (1.5 - n_ambient) * c
    assert got == pytest.approx(n_ambient / expected_power)


def test_singlet_bfl_ffl_match_abcd_formula():
    c1, c2, t, n = 1 / 100, -1 / 50, 8, 1.5
    phi1 = (n - 1) * c1
    phi2 = (1 - n) * c2
    efl = float(thinlens.singlet_efl(c1, c2, t, n))
    assert float(thinlens.singlet_bfl(c1, c2, t, n)) == pytest.approx(
        efl * (1 - t / n * phi1))
    assert float(thinlens.singlet_ffl(c1, c2, t, n)) == pytest.approx(
        -efl * (1 - t / n * phi2))
