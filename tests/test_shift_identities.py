"""The checkerboard shift-fold identities vs their naive shift forms.

r5 replaced fftshift/ifftshift gather copies around FFTs with
(-1)^n sign multiplies (exact for even sizes).  The propagation suite
already proves focus/unfocus against reference prysm; these tests pin
the identities directly — including the odd-size fallbacks the
reference comparisons don't reach — so a future edit cannot silently
break a branch.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from prysm_tpu.propagation.fft import (
    focus, unfocus, focus_adjoint, unfocus_adjoint,
    _norm_ortho_fft2, _norm_ortho_ifft2, _maybe_pad,
)
from prysm_tpu.fttools import crop_center
from prysm_tpu.otf import mtf_from_psf, encircled_energy

_AX = (-2, -1)


def _naive_focus(E, Q):
    padded = _maybe_pad(E, Q)
    return jnp.fft.fftshift(
        _norm_ortho_fft2(jnp.fft.ifftshift(padded, axes=_AX)), axes=_AX)


def _naive_unfocus(E, Q):
    padded = _maybe_pad(E, Q)
    return jnp.fft.fftshift(
        _norm_ortho_ifft2(jnp.fft.ifftshift(padded, axes=_AX)), axes=_AX)


def _rand_complex(shape, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=shape) + 1j * rng.normal(size=shape))


@pytest.mark.parametrize('N', [16, 64])
@pytest.mark.parametrize('Q', [1, 2, 3])
def test_focus_matches_naive_shift_sandwich(N, Q):
    E = _rand_complex((N, N))
    np.testing.assert_allclose(np.asarray(focus(E, Q)),
                               np.asarray(_naive_focus(E, Q)),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize('N', [16, 64])
@pytest.mark.parametrize('Q', [1, 2])
def test_unfocus_matches_naive_shift_sandwich(N, Q):
    E = _rand_complex((N, N), seed=1)
    np.testing.assert_allclose(np.asarray(unfocus(E, Q)),
                               np.asarray(_naive_unfocus(E, Q)),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize('N', [15, 17])
def test_focus_odd_sizes_fall_back_to_shifts(N):
    """Odd dims cannot checkerboard; the gather path must still run."""
    E = _rand_complex((N, N), seed=2)
    np.testing.assert_allclose(np.asarray(focus(E, 1)),
                               np.asarray(_naive_focus(E, 1)),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(unfocus(E, 1)),
                               np.asarray(_naive_unfocus(E, 1)),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize('N, Q', [(16, 2), (32, 2), (16, 3)])
def test_pruned_adjoints_match_naive(N, Q):
    """The sign-folded pruned adjoints equal ifft+crop / fft+crop."""
    M = N * Q
    X = _rand_complex((M, M), seed=3)
    naive_fa = crop_center(jnp.fft.fftshift(
        _norm_ortho_ifft2(jnp.fft.ifftshift(X, axes=_AX)), axes=_AX), (N, N))
    np.testing.assert_allclose(np.asarray(focus_adjoint(X, Q)),
                               np.asarray(naive_fa), rtol=1e-11, atol=1e-11)
    naive_ua = crop_center(jnp.fft.fftshift(
        _norm_ortho_fft2(jnp.fft.ifftshift(X, axes=_AX)), axes=_AX), (N, N))
    np.testing.assert_allclose(np.asarray(unfocus_adjoint(X, Q)),
                               np.asarray(naive_ua), rtol=1e-11, atol=1e-11)


def test_batched_leading_axes_survive_the_fold():
    """The identities hold with wavelength-style leading batch dims."""
    E = _rand_complex((3, 16, 16), seed=4)
    np.testing.assert_allclose(np.asarray(focus(E, 2)),
                               np.asarray(_naive_focus(E, 2)),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(focus(E, 1)),
                               np.asarray(_naive_focus(E, 1)),
                               rtol=1e-12, atol=1e-12)


def test_mtf_rfft_matches_complex_transform_path():
    """The magnitude rfft path (no input shift) == the complex path."""
    rng = np.random.default_rng(5)
    psf = jnp.asarray(rng.random((64, 64)))
    fast = mtf_from_psf(psf, 1.0).data                      # rfft branch
    slow = mtf_from_psf(psf, 1.0, return_more=True)[0].data  # complex branch
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                               rtol=1e-10, atol=1e-12)


def test_encircled_energy_rfft_matches_full_plane():
    """Half-plane EE == the full-plane Baliga-Cohn core, scalar + list."""
    rng = np.random.default_rng(6)
    psf = jnp.asarray(rng.random((64, 64)))
    fast_scalar = float(encircled_energy(psf, 1.0, 5.0))
    slow_scalar, _ = encircled_energy(psf, 1.0, 5.0, return_more=True)
    assert fast_scalar == pytest.approx(float(slow_scalar), rel=1e-10)
    radii = [3.0, 5.0, 9.0]
    fast = np.asarray(encircled_energy(psf, 1.0, radii))
    slow, _ = encircled_energy(psf, 1.0, radii, return_more=True)
    np.testing.assert_allclose(fast, np.asarray(slow), rtol=1e-10)
