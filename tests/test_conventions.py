"""FFT-alignment conventions vs the reference: the allclose-killers.

SURVEY §7 hard part #1: fftrange centering, the asymmetric pad split,
crop_center as the exact pad adjoint, ortho normalization, and executor
grid geometry are where bit-parity dies first.  These tests sweep odd /
even / non-square sizes and non-integer Q against reference prysm.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from prysm_tpu import fttools
from prysm_tpu.coordinates import make_xy_grid, cart_to_polar
from prysm_tpu.propagation import fft as prop_fft
from prysm_tpu.propagation import dft as prop_dft

import prysm.fttools as ref_fttools
import prysm.coordinates as ref_coordinates
import prysm.propagation.fft as ref_prop_fft
import prysm.propagation.dft as ref_prop_dft


@pytest.mark.parametrize('n', [1, 2, 3, 8, 9, 16, 17, 255, 256, 257])
def test_fftrange_matches(n):
    np.testing.assert_array_equal(np.asarray(fttools.fftrange(n)),
                                  np.asarray(ref_fttools.fftrange(n)))


@pytest.mark.parametrize('n', [1, 2, 3, 5, 7, 11, 13, 100, 101, 4097])
def test_next_fast_len_contract(n):
    """Ours returns the next 5-smooth size (XLA's fast radices), a
    deliberate divergence from the reference's scipy 7-smooth answer."""
    out = fttools.next_fast_len(n)
    assert out >= n
    assert out <= max(ref_fttools.next_fast_len(n),
                      1 << (n - 1).bit_length())
    k = out
    for p in (2, 3, 5):
        while k % p == 0:
            k //= p
    assert k == 1 or out <= 2  # 5-smooth (n<=2 passes through)


@pytest.mark.parametrize('n', [8, 9, 64, 65])
@pytest.mark.parametrize('shift', [True, False])
def test_forward_ft_unit_matches(n, shift):
    np.testing.assert_allclose(
        np.asarray(fttools.forward_ft_unit(0.37, n, shift=shift)),
        np.asarray(ref_fttools.forward_ft_unit(0.37, n, shift=shift)),
        rtol=1e-15)


@pytest.mark.parametrize('shape', [(8, 8), (9, 9), (8, 12), (9, 13),
                                   (7, 8), (1, 5)])
@pytest.mark.parametrize('Q', [1, 1.5, 2, 2.37, 3])
def test_pad2d_matches_all_parities(shape, Q):
    rng = np.random.default_rng(1)
    a = rng.normal(size=shape)
    ours = np.asarray(fttools.pad2d(jnp.asarray(a), Q=Q))
    ref = np.asarray(ref_fttools.pad2d(a, Q=Q))
    assert ours.shape == ref.shape
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize('shape,out', [((8, 8), (4, 4)), ((9, 9), (4, 4)),
                                       ((9, 9), (5, 5)), ((8, 12), (5, 7)),
                                       ((10, 7), (3, 6)), ((5, 5), (5, 5))])
def test_crop_center_matches_all_parities(shape, out):
    rng = np.random.default_rng(2)
    a = rng.normal(size=shape)
    np.testing.assert_array_equal(
        np.asarray(fttools.crop_center(jnp.asarray(a), out)),
        np.asarray(ref_fttools.crop_center(a, out)))


@pytest.mark.parametrize('shape,Q', [((8, 8), 2), ((9, 9), 2),
                                     ((8, 12), 1.5), ((9, 13), 2.6)])
def test_pad_crop_adjoint_identity(shape, Q):
    """<pad(x), y> == <x, crop(y)>: the pad/crop pair is exactly adjoint."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=shape)
    padded_shape = np.asarray(ref_fttools.pad2d(x, Q=Q)).shape
    y = rng.normal(size=padded_shape)
    lhs = np.vdot(np.asarray(fttools.pad2d(jnp.asarray(x), Q=Q)), y)
    rhs = np.vdot(x, np.asarray(fttools.crop_center(jnp.asarray(y), shape)))
    assert lhs == pytest.approx(rhs, rel=1e-13)


@pytest.mark.parametrize('mode', ['constant', 'edge', 'reflect'])
def test_pad2d_modes_match(mode):
    rng = np.random.default_rng(4)
    a = rng.normal(size=(7, 9))
    np.testing.assert_array_equal(
        np.asarray(fttools.pad2d(jnp.asarray(a), Q=2, mode=mode)),
        np.asarray(ref_fttools.pad2d(a, Q=2, mode=mode)))


def test_pad2d_out_shape_and_value():
    a = np.ones((6, 6))
    ours = np.asarray(fttools.pad2d(jnp.asarray(a), out_shape=(11, 13),
                                    value=5.0))
    ref = np.asarray(ref_fttools.pad2d(a, out_shape=(11, 13), value=5.0))
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize('n,Q', [(64, 2), (65, 2), (64, 1.37), (63, 3),
                                 (64, 7 / 3)])
def test_focus_matches_noninteger_Q(n, Q):
    rng = np.random.default_rng(5)
    E = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
    ours = np.asarray(prop_fft.focus(jnp.asarray(E), Q=Q))
    ref = np.asarray(ref_prop_fft.focus(E, Q=Q))
    np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize('n,Q', [(33, 2), (64, 1.5)])
def test_unfocus_matches_odd_and_fractional(n, Q):
    rng = np.random.default_rng(6)
    E = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
    np.testing.assert_allclose(
        np.asarray(prop_fft.unfocus(jnp.asarray(E), Q=Q)),
        np.asarray(ref_prop_fft.unfocus(E, Q=Q)),
        rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize('pupil_samples,focal_samples', [
    ((64, 64), (32, 32)),
    ((65, 65), (33, 33)),
    ((64, 48), (40, 56)),
    ((63, 64), (31, 48)),
])
def test_mdft_executor_matches_nonsquare_and_odd(pupil_samples,
                                                 focal_samples):
    rng = np.random.default_rng(7)
    E = (rng.normal(size=pupil_samples)
         + 1j * rng.normal(size=pupil_samples))
    args = (0.01, pupil_samples, 0.4, focal_samples, 0.55, 10.0)
    ours = prop_dft.prepare_executor(*args)
    ref = ref_prop_dft.prepare_executor(*args)
    np.testing.assert_allclose(np.asarray(ours(E)), np.asarray(ref(E)),
                               rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize('shift', [(0.0, 0.0), (1.7, -2.3)])
def test_mdft_executor_matches_with_shift(shift):
    rng = np.random.default_rng(8)
    E = rng.normal(size=(48, 48)) + 1j * rng.normal(size=(48, 48))
    args = (0.01, (48, 48), 0.4, (24, 24), 0.55, 10.0)
    ours = prop_dft.prepare_executor(*args, focal_shift=shift)
    ref = ref_prop_dft.prepare_executor(*args, focal_shift=shift)
    np.testing.assert_allclose(np.asarray(ours(E)), np.asarray(ref(E)),
                               rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize('kind', ['mdft', 'czt'])
def test_executor_adjoint_identity_odd_grid(kind):
    """<A x, y> == <x, A* y> on an odd, non-square grid."""
    rng = np.random.default_rng(9)
    ps, fs = (33, 47), (21, 27)
    x = rng.normal(size=ps) + 1j * rng.normal(size=ps)
    y = rng.normal(size=fs) + 1j * rng.normal(size=fs)
    ex = prop_dft.prepare_executor(0.01, ps, 0.4, fs, 0.55, 10.0, kind=kind)
    lhs = np.vdot(np.asarray(ex(jnp.asarray(x))), y)
    rhs = np.vdot(x, np.asarray(ex.adjoint(jnp.asarray(y))))
    assert lhs == pytest.approx(rhs, rel=1e-10)


@pytest.mark.parametrize('zoom', [0.5, 2.0, 1.37])
def test_fourier_resample_matches(zoom):
    x, y = make_xy_grid(64, diameter=2.0)
    r, _ = cart_to_polar(x, y)
    f = np.asarray(np.exp(-r ** 2))
    np.testing.assert_allclose(
        np.asarray(fttools.fourier_resample(jnp.asarray(f), zoom)),
        np.asarray(ref_fttools.fourier_resample(f, zoom)),
        rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize('n', [32, 33])
def test_make_xy_grid_conventions(n):
    for kwargs in ({'diameter': 2.2}, {'dx': 0.37}, {'diameter': 1.0,
                                                     'grid': True}):
        ours = make_xy_grid(n, **kwargs)
        ref = ref_coordinates.make_xy_grid(n, **kwargs)
        for o, r in zip(np.atleast_1d(ours), np.atleast_1d(ref)):
            np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                       rtol=1e-15)
