"""Pallas kernels vs their jnp twins, on the hardware they target.

The CPU suite runs the Pallas kernels in interpret mode; here the real
Mosaic-compiled kernels run on the chip and must agree with the jnp
reference paths at f32.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prysm_tpu.coordinates import make_xy_grid, cart_to_polar
from prysm_tpu.polynomials import zernike_nm_seq, sum_of_2d_modes
from prysm_tpu.ops.zernike import zernike_sum_pallas
from prysm_tpu.detector import Detector

pytestmark = pytest.mark.tpu

NMS = [(2, 0), (2, 2), (2, -2), (3, 1), (3, -1), (4, 0)]


@pytest.fixture(scope='module')
def polar_grid():
    x, y = make_xy_grid(256, diameter=2.0)
    r, t = cart_to_polar(x, y)
    jax.block_until_ready(t)
    return r, t


def test_zernike_sum_pallas_matches_jnp_on_chip(polar_grid):
    r, t = polar_grid
    coefs = jnp.asarray([20.0, -10.0, 8.0, 5.0, -4.0, 3.0],
                        dtype=jnp.float32)

    @jax.jit
    def diff(coefs, r, t):
        zp = zernike_sum_pallas(coefs, NMS, r, t)
        zj = sum_of_2d_modes(zernike_nm_seq(NMS, r, t), coefs)
        return jnp.max(jnp.abs(zp - zj)), jnp.max(jnp.abs(zj))

    d, s = diff(coefs, r, t)
    assert float(d) / float(s) < 1e-5


def test_zernike_sum_pallas_coef_grad_on_chip(polar_grid):
    r, t = polar_grid
    coefs = jnp.asarray([20.0, -10.0, 8.0, 5.0, -4.0, 3.0],
                        dtype=jnp.float32)

    @jax.jit
    def grads(coefs, r, t):
        gp = jax.grad(
            lambda c: jnp.sum(zernike_sum_pallas(c, NMS, r, t) ** 2))(coefs)
        gj = jax.grad(
            lambda c: jnp.sum(
                sum_of_2d_modes(zernike_nm_seq(NMS, r, t), c) ** 2))(coefs)
        return jnp.max(jnp.abs(gp - gj)), jnp.max(jnp.abs(gj))

    d, s = grads(coefs, r, t)
    assert float(d) / float(s) < 1e-4


def test_detector_auto_dispatch_uses_fused_kernel_on_chip():
    """Photon-rich scenes route expose() to the fused Pallas PRNG path."""
    det = Detector(dark_current=2.0, read_noise=5.0, bias=100.0,
                   fwc=6e4, conversion_gain=0.5, bits=14,
                   exposure_time=1e-2)
    aerial = jnp.full((256, 256), 3e5, dtype=jnp.float32)
    out = det.expose(aerial, seed=7)
    jax.block_until_ready(out)
    assert det.last_expose_path == 'fused'
    a = np.asarray(out, dtype=np.float64)
    assert np.isfinite(a).all()


def test_detector_fused_noise_statistics_on_chip():
    """Fused-kernel exposure has the physical mean and variance.

    mean DN ~ (photons + dark)/gain + bias; var of electrons ~ Poisson
    (lambda) + read^2, scaled by 1/gain^2 in DN.
    """
    det = Detector(dark_current=0.0, read_noise=5.0, bias=100.0,
                   fwc=1e9, conversion_gain=1.0, bits=24,
                   exposure_time=1.0)
    lam = 1e4
    aerial = jnp.full((512, 512), lam, dtype=jnp.float32)
    out = det.expose_fused(aerial, seed=3)
    a = np.asarray(out, dtype=np.float64)
    mean, var = a.mean(), a.var()
    expect_mean = lam + 100.0
    expect_var = lam + 5.0 ** 2
    assert mean == pytest.approx(expect_mean, rel=2e-3)
    assert var == pytest.approx(expect_var, rel=5e-2)


def test_detector_fused_matches_random_path_statistics_on_chip():
    """Fused Pallas PRNG and jax.random paths draw the same distribution."""
    det = Detector(dark_current=1.0, read_noise=3.0, bias=50.0,
                   fwc=1e9, conversion_gain=2.0, bits=24,
                   exposure_time=1.0)
    aerial = jnp.full((512, 512), 2e3, dtype=jnp.float32)
    f = np.asarray(det.expose(aerial, seed=5, method='fused'),
                   dtype=np.float64)
    r = np.asarray(det.expose(aerial, seed=5, method='random'),
                   dtype=np.float64)
    assert f.mean() == pytest.approx(r.mean(), rel=1e-3)
    assert f.std() == pytest.approx(r.std(), rel=2e-2)
