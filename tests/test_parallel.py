"""Multi-chip sharding: sharded and unsharded broadband steps must agree."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prysm_tpu.coordinates import make_xy_grid, cart_to_polar
from prysm_tpu.geometry import circle_sdf, antialias
from prysm_tpu.polynomials import zernike_nm_seq
from prysm_tpu.parallel import (
    make_mesh, plan_mdft_spectral, shard_broadband_step,
)
from prysm_tpu.parallel.sharding import broadband_psf


requires_8_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason='needs 8 (virtual) devices')


def _setup(N=32, W=4, fN=40):
    x, y = make_xy_grid(N, diameter=2.2)
    dx = float(x[0, 1] - x[0, 0])
    r, t = cart_to_polar(x, y)
    amp = antialias(circle_sdf(1.0, r), dx)
    nms = [(2, 0), (2, 2), (3, 1)]
    modes = zernike_nm_seq(nms, r, t)
    wavelengths = jnp.linspace(0.5, 0.6, W)
    weights = jnp.ones(W) / W
    plan = plan_mdft_spectral(dx, (N, N), 0.4, fN, np.asarray(wavelengths), 10.0)
    coefs = jnp.asarray([5.0, -3.0, 2.0])
    return coefs, amp, modes, wavelengths, weights, plan


def test_spectral_mdft_matches_per_wavelength():
    """The stacked spectral plan equals per-wavelength single plans."""
    from prysm_tpu.propagation import prepare_executor
    coefs, amp, modes, wavelengths, weights, plan = _setup()
    fields = jnp.broadcast_to(amp, (len(wavelengths), *amp.shape)).astype(plan.Ex.dtype)
    stacked = np.asarray(plan(fields))
    for i, wvl in enumerate(np.asarray(wavelengths)):
        single = prepare_executor(plan.pupil_dx, amp.shape, plan.focal_dx,
                                  stacked.shape[-1], float(wvl), 10.0)
        np.testing.assert_allclose(stacked[i], np.asarray(single(amp + 0j)),
                                   rtol=1e-10, atol=1e-12)


@requires_8_devices
def test_sharded_step_matches_unsharded():
    coefs, amp, modes, wavelengths, weights, plan = _setup()
    I_meas = broadband_psf(coefs * 0.5, amp, modes, wavelengths, weights, plan)

    def loss_unsharded(c):
        I = broadband_psf(c, amp, modes, wavelengths, weights, plan)
        return jnp.sum((I - I_meas) ** 2)

    l_ref, g_ref = jax.value_and_grad(loss_unsharded)(coefs)

    mesh = make_mesh({'wl': 2, 'ty': 4})
    step = shard_broadband_step(mesh, plan, amp, modes, wavelengths, weights, I_meas)
    l_sh, g_sh = step(coefs)

    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref), rtol=1e-9)


@requires_8_devices
def test_sharded_step_wl_only_mesh():
    coefs, amp, modes, wavelengths, weights, plan = _setup(W=8)
    I_meas = broadband_psf(coefs, amp, modes, wavelengths, weights, plan)
    mesh = make_mesh({'wl': 8, 'ty': 1})
    step = shard_broadband_step(mesh, plan, amp, modes, wavelengths, weights, I_meas)
    l_sh, g_sh = step(coefs)
    np.testing.assert_allclose(float(l_sh), 0.0, atol=1e-18)
    np.testing.assert_allclose(np.asarray(g_sh), 0.0, atol=1e-12)
