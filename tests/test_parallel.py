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


def test_sharded_multiresolution_matches_serial():
    """Levels sharded over the mesh + psum == the serial level loop."""
    from prysm_tpu.coordinates import make_xy_grid, cart_to_polar
    from prysm_tpu.geometry import circle_sdf, antialias
    from prysm_tpu.propagation import prepare_multiresolution
    from prysm_tpu.propagation.coronagraph import (
        to_fpm_and_back_multiresolution, vortex_phase_mask)
    from prysm_tpu import parallel as par

    N = 32
    wvl, efl = 0.55, 10.0
    dx = 2.2 / N
    x, y = make_xy_grid(N, diameter=2.2)
    r, t = cart_to_polar(x, y)
    amp = antialias(circle_sdf(1.0, r), dx)
    a = jnp.asarray(np.asarray(amp), dtype=jnp.complex128)
    fpm = vortex_phase_mask(2)

    mre = prepare_multiresolution(dx, (N, N), 0.5, 24, wvl, efl,
                                  num_levels=8, scaling=2.0,
                                  fine_samples=24)
    c_serial = to_fpm_and_back_multiresolution(
        a, lambda xf, yf: 1 - fpm(xf, yf), mre)

    plan = par.stack_multiresolution(mre, fpm, babinet=True)
    mesh = par.make_mesh({'lv': 8})
    c_shard = par.shard_multires_roundtrip(mesh, plan)(a)
    np.testing.assert_allclose(np.asarray(c_shard), np.asarray(c_serial),
                               atol=1e-14)

    lyot = jnp.asarray(np.asarray(antialias(circle_sdf(0.9, r), dx)))
    b = par.shard_multires_babinet(mesh, plan, lyot)(a)
    np.testing.assert_allclose(np.asarray(b),
                               np.asarray(lyot * (a - c_serial)),
                               atol=1e-14)
    # gradients flow through the collective
    g = jax.grad(lambda aa: (jnp.abs(
        par.shard_multires_babinet(mesh, plan, lyot)(aa)) ** 2).sum())(a)
    assert bool(jnp.isfinite(g.real).all())
    # indivisible level counts and non-uniform shapes are rejected
    mre5 = prepare_multiresolution(dx, (N, N), 0.5, 24, wvl, efl,
                                   num_levels=5, scaling=2.0,
                                   fine_samples=24)
    with pytest.raises(ValueError, match='divide'):
        par.shard_multires_roundtrip(
            mesh, par.stack_multiresolution(mre5, fpm, babinet=True))
    mre_bad = prepare_multiresolution(dx, (N, N), 0.5, 24, wvl, efl,
                                      num_levels=3, scaling=2.0,
                                      fine_samples=32)
    with pytest.raises(ValueError, match='uniform'):
        par.stack_multiresolution(mre_bad, fpm)


def test_contraction_sharded_mdft_matches_serial():
    """Pupil-row (contraction-axis) sharding + psum == the dense MDFT."""
    from prysm_tpu.coordinates import make_xy_grid, cart_to_polar
    from prysm_tpu.geometry import circle_sdf, antialias
    from prysm_tpu.propagation import prepare_executor
    from prysm_tpu.propagation.dft import focus_dft, unfocus_dft
    from prysm_tpu import parallel as par

    N = 32
    dx = 2.2 / N
    x, y = make_xy_grid(N, diameter=2.2)
    r, t = cart_to_polar(x, y)
    a = jnp.asarray(np.asarray(antialias(circle_sdf(1.0, r), dx)),
                    dtype=jnp.complex128)
    plan = prepare_executor(dx, (N, N), 0.4, 16, 0.55, 10.0)
    mesh = par.make_mesh({'ct': 8})

    f = par.shard_mdft_contraction(mesh, plan)(a)
    np.testing.assert_allclose(np.asarray(f),
                               np.asarray(focus_dft(a, plan)), atol=1e-13)

    mask = jnp.asarray(np.exp(
        1j * np.arctan2(*np.meshgrid(np.arange(16) - 7.5,
                                     np.arange(16) - 7.5))))
    rt = par.shard_mdft_contraction_roundtrip(mesh, plan, focal_factor=mask)
    c = rt(a)
    np.testing.assert_allclose(
        np.asarray(c),
        np.asarray(unfocus_dft(focus_dft(a, plan) * mask, plan)),
        atol=1e-13)
    g = jax.grad(lambda aa: jnp.sum(jnp.abs(rt(aa)) ** 2))(a)
    assert bool(jnp.isfinite(g.real).all())

    plan_odd = prepare_executor(2.2 / 20, (20, 20), 0.4, 16, 0.55, 10.0)
    with pytest.raises(ValueError, match='divide'):
        par.shard_mdft_contraction(mesh, plan_odd)
