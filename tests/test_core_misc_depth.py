"""Convolution, degradations, objects, util, wavelengths, config depth.

Behavior matrix of /root/reference/tests/test_convolution.py (7
tests), test_degradations.py (5), test_objects.py (7), test_util.py
(4), test_wavelengths.py (2), and config/test_config.py (3 families):
delta-PSF identity, transfer-function frequency plumbing, analytic
smear/jitter, target synthesis rails, summary statistics, laser-line
constants, and precision configuration.
"""
from functools import partial

import numpy as np
import pytest

import jax  # NOQA: F401

from prysm_tpu import (
    convolution, coordinates, degradations, fttools, objects, util,
    wavelengths)
from prysm_tpu.conf import config


def _np(x):
    return np.asarray(x)


# ---------- convolution -------------------------------------------------------

def test_conv_with_centered_delta_psf_is_identity():
    obj = np.arange(25, dtype=float).reshape(5, 5)
    psf = np.zeros_like(obj)
    psf[2, 2] = 1
    out = convolution.conv(obj, psf)
    np.testing.assert_allclose(_np(out), obj, atol=1e-12)


def test_apply_transfer_functions_uses_callable_frequency_arguments():
    obj = np.arange(16, dtype=float).reshape(4, 4)

    def zero_lowpass(fx, fy, fr):
        assert fx.shape == (1, obj.shape[1])
        assert fy.shape == (obj.shape[0], 1)
        assert fr.shape == obj.shape
        return np.zeros_like(fr)

    out = convolution.apply_transfer_functions(obj, 1, [zero_lowpass])
    np.testing.assert_allclose(_np(out), 0, atol=1e-12)


def test_apply_transfer_functions_with_shift_preserves_identity_tf():
    obj = np.arange(16, dtype=float).reshape(4, 4)
    out = convolution.apply_transfer_functions(obj, 1, [np.ones_like(obj)],
                                               shift=True)
    np.testing.assert_allclose(_np(out), obj, atol=1e-12)


def test_apply_transfer_functions_without_shift_preserves_identity_tf():
    obj = np.arange(16, dtype=float).reshape(4, 4)
    out = convolution.apply_transfer_functions(obj, 1, [np.ones_like(obj)])
    np.testing.assert_allclose(_np(out), obj, atol=1e-12)


def test_convolution_preserves_complex_input_dtype():
    obj = np.arange(25).reshape(5, 5) * (1 + 1j)
    psf = np.zeros_like(obj)
    psf[2, 2] = 1
    out = convolution.conv(obj, psf)
    assert np.iscomplexobj(_np(out))
    np.testing.assert_allclose(_np(out), obj, atol=1e-12)


def test_apply_transfer_functions_rejects_callable_with_no_recognized_params():
    obj = np.arange(16, dtype=float).reshape(4, 4)

    def not_a_transfer_function(wavelength):
        return np.ones_like(obj)

    with pytest.raises(ValueError):
        convolution.apply_transfer_functions(obj, 1,
                                             [not_a_transfer_function])


def test_apply_transfer_functions_composes_smear_and_jitter():
    sm = partial(degradations.smear_ft, width=1, height=1)
    ji = partial(degradations.jitter_ft, scale=1)
    obj = np.ones((8, 8), dtype=float)
    out = convolution.apply_transfer_functions(obj, 1, [sm, ji])
    assert out.shape == obj.shape
    assert np.isfinite(_np(out)).all()


# ---------- degradations ------------------------------------------------------

def test_smear_ft_width_only_matches_sinc_x():
    fx = np.asarray([-0.5, 0, 0.5])
    fy = np.asarray([-0.25, 0, 0.25])
    out = degradations.smear_ft(fx, fy, width=2, height=0)
    np.testing.assert_allclose(_np(out), np.sinc(fx * 2))


def test_smear_ft_height_only_matches_sinc_y():
    fx = np.asarray([-0.5, 0, 0.5])
    fy = np.asarray([-0.25, 0, 0.25])
    out = degradations.smear_ft(fx, fy, width=0, height=4)
    np.testing.assert_allclose(_np(out), np.sinc(fy * 4))


def test_smear_ft_requires_nonzero_extent():
    with pytest.raises(ValueError,
                       match='one of width or height must be nonzero'):
        degradations.smear_ft(np.asarray([0]), np.asarray([0]), 0, 0)


def test_jitter_ft_zero_scale_is_unity():
    fr = np.asarray([0, 0.25, 0.5, 1])
    out = degradations.jitter_ft(fr, scale=0)
    np.testing.assert_allclose(_np(out), np.ones_like(fr))


def test_misspelled_module_remains_a_compatibility_alias():
    from prysm_tpu import degredations
    assert degredations.smear_ft is degradations.smear_ft


# ---------- objects -----------------------------------------------------------

@pytest.fixture
def xy():
    return coordinates.make_xy_grid(33, diameter=2)


@pytest.fixture
def rt(xy):
    return coordinates.cart_to_polar(*xy)


def test_slit_widths_select_expected_axes(xy):
    x, y = xy
    vertical = _np(objects.slit(x, y, width_x=0.25, width_y=None))
    horizontal = _np(objects.slit(x, y, width_x=None, width_y=0.25))
    crossed = _np(objects.slit(x, y, width_x=0.25, width_y=0.25))
    assert vertical[:, 16].all()
    assert not vertical[16, :].all()
    assert horizontal[16, :].all()
    np.testing.assert_array_equal(crossed, vertical | horizontal)


def test_slit_ft_matches_rasterization():
    N = 256
    dx = 1 / 64
    x, y = coordinates.make_xy_grid(N, dx=dx)
    fx = _np(fttools.forward_ft_unit(dx, N))
    fy = _np(fttools.forward_ft_unit(dx, N))

    for wx, wy in ((0.5, None), (None, 0.5), (0.5, 1.0)):
        mask = _np(objects.slit(x, y, wx, wy))
        # effective rasterized widths; edge rows/cols avoid the crossing
        wx_eff = mask[0, :].sum() * dx if wx is not None else None
        wy_eff = mask[:, 0].sum() * dx if wy is not None else None

        F = np.fft.fftshift(np.fft.fft2(np.fft.ifftshift(mask)))
        F = (F / F[N // 2, N // 2]).real
        an = _np(objects.slit_ft(wx_eff, wy_eff, fx, fy))
        # analytic sinc vs discrete Dirichlet; compare the central band
        sl = slice(N // 2 - N // 4, N // 2 + N // 4)
        np.testing.assert_allclose(an[sl, sl], F[sl, sl], atol=5e-3)


def test_slit_ft_zero_and_none_equivalent():
    fx = _np(fttools.forward_ft_unit(1 / 32, 32))
    fy = _np(fttools.forward_ft_unit(1 / 32, 32))
    np.testing.assert_array_equal(_np(objects.slit_ft(2, 0, fx, fy)),
                                  _np(objects.slit_ft(2, None, fx, fy)))


def test_pinhole_masks_by_radius(rt):
    r, _ = rt
    mask = _np(objects.pinhole(0.25, r))
    assert mask[16, 16]
    assert not mask[0, 0]


def test_pinhole_ft_has_unit_dc(rt):
    r, _ = rt
    ft = objects.pinhole_ft(1, r)
    assert float(ft[16, 16]) == pytest.approx(0.5)


def test_siemensstar_background_and_invalid_background(rt):
    r, t = rt
    white = objects.siemensstar(r, t, 16, oradius=0.4, background='white')
    black = objects.siemensstar(r, t, 16, oradius=0.4, background='black')
    assert float(white[0, 0]) == pytest.approx(0.95)
    assert float(black[0, 0]) == pytest.approx(0.05)
    with pytest.raises(ValueError, match='invalid background'):
        objects.siemensstar(r, t, 16, background='gray')


def test_tiltedsquare_background_sets_inside_and_outside(xy):
    x, y = xy
    white_bg = objects.tiltedsquare(x, y, radius=0.25, contrast=0.8,
                                    background='white')
    black_bg = objects.tiltedsquare(x, y, radius=0.25, contrast=0.8,
                                    background='black')
    assert float(white_bg[16, 16]) == pytest.approx(0.1)
    assert float(white_bg[0, 0]) == pytest.approx(0.9)
    assert float(black_bg[16, 16]) == pytest.approx(0.9)
    assert float(black_bg[0, 0]) == pytest.approx(0.1)


def test_slantededge_crossed_changes_quadrants(xy):
    x, y = xy
    single = _np(objects.slantededge(x, y, angle=0, crossed=False))
    crossed = _np(objects.slantededge(x, y, angle=0, crossed=True))
    assert single[16, 24] < single[16, 8]
    assert crossed[8, 24] < crossed[8, 8]
    assert crossed[24, 8] < crossed[8, 8]


# ---------- util --------------------------------------------------------------

def test_rms_is_zero_for_single_value_array():
    arr = np.ones((32, 32))
    assert float(util.rms(arr)) == pytest.approx(1)


def test_ecdf_binary_distribution():
    x = np.asarray([0, 0, 0, 1, 1, 1])
    xs, ys = util.ecdf(x)
    assert np.allclose(np.unique(_np(xs)), np.asarray([0, 1]))


def test_sort_xy():
    x = np.linspace(10, 0, 10)
    y = np.linspace(1, 10, 10)
    xx, yy = util.sort_xy(x, y)
    assert tuple(xx) == tuple(reversed(x))
    assert tuple(yy) == tuple(reversed(y))


def test_Sa_gives_correct_value():
    ary = np.array([1, 2, 3, 4, 5])
    assert float(util.Sa(ary)) == pytest.approx(1.2)


# ---------- wavelengths -------------------------------------------------------

def test_laser_wavelength_constants_are_microns():
    assert wavelengths.HeNe == 0.6328
    assert wavelengths.NdYAG == 1.064
    assert wavelengths.CO2 == 10.6


def test_wavelength_families_are_ordered_long_to_short():
    assert (wavelengths.CO2 > wavelengths.NdYAP > wavelengths.NdYAG
            > wavelengths.InGaAs)
    assert wavelengths.Ruby > wavelengths.HeNe > wavelengths.Cu
    assert (wavelengths.XeF > wavelengths.XeCl > wavelengths.KrF
            > wavelengths.KrCl > wavelengths.ArF)


# ---------- config ------------------------------------------------------------

PRECISIONS = {16: np.float16, 32: np.float32, 64: np.float64}
PRECISIONS_COMPLEX = {16: np.complex64, 32: np.complex64,
                      64: np.complex128}


@pytest.fixture(autouse=True)
def restore_precision():
    old = config._explicit
    try:
        yield
    finally:
        config._explicit = old


@pytest.mark.parametrize('precision', [16, np.int64(32), 64])
def test_set_precision_from_bit_depth(precision):
    config.precision = precision
    assert config.precision == PRECISIONS[int(precision)]
    assert config.precision_complex == PRECISIONS_COMPLEX[int(precision)]


@pytest.mark.parametrize('precision, expected, expected_complex', [
    (np.float16, np.float16, np.complex64),
    (np.dtype('float32'), np.float32, np.complex64),
    ('float64', np.float64, np.complex128),
    (float, np.float64, np.complex128),
])
def test_set_precision_from_dtype_like(precision, expected,
                                       expected_complex):
    config.precision = precision
    assert config.precision == expected
    assert config.precision_complex == expected_complex


def test_rejects_bad_precision():
    with pytest.raises(ValueError):
        config.precision = 1
