"""Executor equivalence + adjoint inner products on the real chip.

The CPU suite proves FFT == MDFT == CZT == FFTDFT and <Ax,y> == <x,A*y>
in f64; this module re-proves both properties in the f32 the chip
actually runs, with tier bounds from tests/test_f32_tier.py.  All
complex quantities stay on device; only f32 scalars are fetched.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prysm_tpu.fttools import crop_center
from prysm_tpu.propagation import prepare_executor
from prysm_tpu.propagation.fft import focus, focus_adjoint, unfocus, unfocus_adjoint
from prysm_tpu.propagation.angular_spectrum import (
    angular_spectrum, angular_spectrum_adjoint)

from conftest import cvdot

pytestmark = pytest.mark.tpu

N = 128
DX = 0.015625      # binary-exact so FFTDFT's 1/integer check is exact
WVL, EFL = 0.5, 10.0
FDX = 0.5          # alpha = DX*FDX/(WVL*EFL) = 1/640, exactly


def _rand_pair(shape, seed):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.normal(size=shape), dtype=jnp.float32),
            jnp.asarray(rng.normal(size=shape), dtype=jnp.float32))


def _rel_cplx_diff(jit_fn, *args):
    """max |a - b| / max |b| for a jitted fn returning two complex arrays."""
    d, s = jit_fn(*args)
    return float(d) / float(s)


@pytest.mark.parametrize('kind', ['mdft', 'czt', 'fftdft'])
def test_executor_matches_fft_on_compatible_grid(kind):
    """Each plan reproduces |FFT focus| on the matched Q=2 grid, up to
    the ortho-vs-optical normalization (the CPU twin's comparison,
    tests/test_propagation.py::test_fft_equals_mdft_on_compatible_grid,
    at the f32 tier)."""
    Q = 2
    fN = N * Q
    fdx = EFL * WVL / (DX * fN)
    plan = prepare_executor(DX, (N, N), fdx, fN, WVL, EFL, kind=kind,
                            dtype=np.complex64)
    a_re, a_im = _rand_pair((N, N), 7)

    @jax.jit
    def diff(a_re, a_im):
        a = jax.lax.complex(a_re, a_im)
        m1 = jnp.abs(focus(a, Q=Q))
        m2 = jnp.abs(plan(a))
        scale = jnp.max(m1) / jnp.max(m2)
        d = jnp.max(jnp.abs(m1 - m2 * scale))
        return d, jnp.max(m1)

    # f32 DFT over 128^2 terms: 1e-4 relative tier
    assert _rel_cplx_diff(diff, a_re, a_im) < 1e-4


@pytest.mark.parametrize('kind', ['mdft', 'czt', 'fftdft'])
def test_executor_adjoint_vdot_on_chip(kind):
    """<Ax, y> == <x, A*y> at f32 for each arbitrary-sampling plan."""
    plan = prepare_executor(DX, (N, N), FDX, 96, WVL, EFL, kind=kind,
                            dtype=np.complex64)
    x_re, x_im = _rand_pair((N, N), 1)
    y_re, y_im = _rand_pair((96, 96), 2)

    @jax.jit
    def both(x_re, x_im, y_re, y_im):
        x = jax.lax.complex(x_re, x_im)
        y = jax.lax.complex(y_re, y_im)
        Ax = plan(x)
        Aty = plan.adjoint(y)
        lhs_re, lhs_im = cvdot(Ax.real, Ax.imag, y.real, y.imag)
        rhs_re, rhs_im = cvdot(x.real, x.imag, Aty.real, Aty.imag)
        mag = jnp.sqrt(lhs_re ** 2 + lhs_im ** 2)
        return lhs_re - rhs_re, lhs_im - rhs_im, mag

    dre, dim, mag = both(x_re, x_im, y_re, y_im)
    rel = float(jnp.hypot(dre, dim)) / float(mag)
    assert rel < 1e-4


@pytest.mark.parametrize('op, op_adj, Q', [
    (focus, focus_adjoint, 2),
    (focus, focus_adjoint, 3),
    (unfocus, unfocus_adjoint, 2),
])
def test_fft_focus_adjoint_vdot_on_chip(op, op_adj, Q):
    x_re, x_im = _rand_pair((N, N), 3)
    y_re, y_im = _rand_pair((N * Q, N * Q), 4)

    @jax.jit
    def both(x_re, x_im, y_re, y_im):
        x = jax.lax.complex(x_re, x_im)
        y = jax.lax.complex(y_re, y_im)
        Ax = op(x, Q)
        Aty = op_adj(y, Q)
        lhs_re, lhs_im = cvdot(Ax.real, Ax.imag, y.real, y.imag)
        rhs_re, rhs_im = cvdot(x.real, x.imag, Aty.real, Aty.imag)
        mag = jnp.sqrt(lhs_re ** 2 + lhs_im ** 2)
        return lhs_re - rhs_re, lhs_im - rhs_im, mag

    dre, dim, mag = both(x_re, x_im, y_re, y_im)
    assert float(jnp.hypot(dre, dim)) / float(mag) < 1e-4


def test_angular_spectrum_adjoint_vdot_on_chip():
    # Q=2 pads: the operator maps N^2 -> (2N)^2, so y lives on the
    # padded grid and the adjoint carries it back to N^2
    x_re, x_im = _rand_pair((N, N), 5)
    y_re, y_im = _rand_pair((2 * N, 2 * N), 6)
    z = 50.0  # mm

    @jax.jit
    def both(x_re, x_im, y_re, y_im):
        x = jax.lax.complex(x_re, x_im)
        y = jax.lax.complex(y_re, y_im)
        Ax = angular_spectrum(x, WVL, DX, z, Q=2)
        Aty = angular_spectrum_adjoint(y, WVL, DX, z, Q=2)
        lhs_re, lhs_im = cvdot(Ax.real, Ax.imag, y.real, y.imag)
        rhs_re, rhs_im = cvdot(x.real, x.imag, Aty.real, Aty.imag)
        mag = jnp.sqrt(lhs_re ** 2 + lhs_im ** 2)
        return lhs_re - rhs_re, lhs_im - rhs_im, mag

    dre, dim, mag = both(x_re, x_im, y_re, y_im)
    assert float(jnp.hypot(dre, dim)) / float(mag) < 1e-4


def test_angular_spectrum_roundtrip_on_chip(pupil256):
    """Propagating +z then -z recovers the field (unitary TF) at f32."""
    *_, amp, dx = pupil256

    n = amp.shape[0]

    @jax.jit
    def roundtrip(amp):
        E = jax.lax.complex(amp, jnp.zeros_like(amp))
        # Q pads without cropping on the way out: crop the center back
        E2 = angular_spectrum(E, WVL, dx, 25.0, Q=2)
        E3 = angular_spectrum(E2, WVL, dx, -25.0, Q=1)
        E3 = crop_center(E3, (n, n))
        d = jnp.max(jnp.abs(E3 - E))
        s = jnp.max(jnp.abs(E))
        return d, s

    d, s = roundtrip(amp)
    assert float(d) / float(s) < 1e-3


def test_focus_unfocus_roundtrip_on_chip(pupil256):
    *_, amp, dx = pupil256

    n = amp.shape[0]

    @jax.jit
    def roundtrip(amp):
        E = jax.lax.complex(amp, jnp.zeros_like(amp))
        back = crop_center(unfocus(focus(E, Q=2), Q=1), (n, n))
        d = jnp.max(jnp.abs(back - E))
        s = jnp.max(jnp.abs(E))
        return d, s

    d, s = roundtrip(amp)
    assert float(d) / float(s) < 1e-5


def test_mdft_matches_czt_and_fftdft_off_unit_cell():
    """The three arbitrary-sampling algorithms agree on one (shifted) grid."""
    plans = {k: prepare_executor(DX, (N, N), FDX, 96, WVL, EFL, kind=k,
                                 focal_shift=(0.2, 0.2), dtype=np.complex64)
             for k in ('mdft', 'czt')}
    a_re, a_im = _rand_pair((N, N), 8)

    @jax.jit
    def diff(a_re, a_im):
        a = jax.lax.complex(a_re, a_im)
        F1 = plans['mdft'](a)
        F2 = plans['czt'](a)
        return jnp.max(jnp.abs(F1 - F2)), jnp.max(jnp.abs(F1))

    d, s = diff(a_re, a_im)
    assert float(d) / float(s) < 1e-4
