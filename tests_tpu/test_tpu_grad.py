"""Differentiation correctness on the real chip at f32.

The CPU suite proves jax.grad == the reference's hand-chained adjoints
in f64; this module proves the f32 hardware gradients are still right:
against central finite differences, against the fused Pallas kernel
path, and as an actually-descending optimization step.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prysm_tpu.coordinates import make_xy_grid, cart_to_polar
from prysm_tpu.geometry import circle_sdf, antialias
from prysm_tpu.polynomials import zernike_nm_seq, sum_of_2d_modes
from prysm_tpu.propagation import Wavefront, prepare_executor

pytestmark = pytest.mark.tpu

NMS = [(2, 0), (2, 2), (3, 1), (4, 0)]


@pytest.fixture(scope='module')
def retrieval():
    """Jitted phase-retrieval loss + grad and the loss alone."""
    N, fN = 256, 64
    x, y = make_xy_grid(N, diameter=2.2)
    dx = 2.2 / N
    r, t = cart_to_polar(x, y)
    amp = antialias(circle_sdf(1.0, r), dx)
    modes = zernike_nm_seq(NMS, r, t)
    plan = prepare_executor(dx, (N, N), 0.4, fN, 0.55, 10.0,
                            dtype=np.complex64)
    coefs = jnp.asarray([20.0, -10.0, 5.0, 3.0], dtype=jnp.float32)

    def fwd(c):
        opd = sum_of_2d_modes(modes, c)
        wf = Wavefront.from_amp_and_phase(amp, opd, 0.55, dx)
        return wf.focus_dft(plan).intensity.data

    I_meas = fwd(coefs * 0.5)

    def loss(c):
        resid = fwd(c) - I_meas
        return jnp.sum(resid * resid)

    vg = jax.jit(jax.value_and_grad(loss))
    jloss = jax.jit(loss)
    l0, g0 = vg(coefs)
    jax.block_until_ready(g0)
    return jloss, vg, coefs, float(l0), np.asarray(g0, dtype=np.float64)


def test_grad_matches_finite_differences_on_chip(retrieval):
    jloss, _, coefs, _, g0 = retrieval
    c0 = np.asarray(coefs, dtype=np.float64)
    h = 1e-2
    for i in range(len(c0)):
        cp = c0.copy(); cp[i] += h
        cm = c0.copy(); cm[i] -= h
        lp = float(jloss(jnp.asarray(cp, jnp.float32)))
        lm = float(jloss(jnp.asarray(cm, jnp.float32)))
        fd = (lp - lm) / (2 * h)
        # f32 forward differences of a ~1e7-scale loss: a few percent
        assert fd == pytest.approx(g0[i], rel=5e-2), f'component {i}'


def test_gradient_step_decreases_loss_on_chip(retrieval):
    jloss, vg, coefs, l0, g0 = retrieval
    gnorm2 = float(np.sum(g0 * g0))
    step = 0.1 * l0 / gnorm2  # conservative first-order step
    c1 = jnp.asarray(np.asarray(coefs, np.float64) - step * g0, jnp.float32)
    l1 = float(jloss(c1))
    assert l1 < l0


def test_fused_zernike_chain_grad_matches_jnp_on_chip():
    """End-to-end loss grads agree between the Pallas synthesis kernel
    and the jnp mode path at the f32 tier."""
    from prysm_tpu.ops.zernike import zernike_sum_pallas

    N = 256
    x, y = make_xy_grid(N, diameter=2.2)
    dx = 2.2 / N
    r, t = cart_to_polar(x, y)
    amp = antialias(circle_sdf(1.0, r), dx)
    modes = zernike_nm_seq(NMS, r, t)
    coefs = jnp.asarray([20.0, -10.0, 5.0, 3.0], dtype=jnp.float32)

    def loss_jnp(c):
        opd = sum_of_2d_modes(modes, c)
        wf = Wavefront.from_amp_and_phase(amp, opd, 0.55, dx)
        return jnp.sum(wf.focus(10.0, Q=2).intensity.data ** 2)

    def loss_pallas(c):
        opd = zernike_sum_pallas(c, NMS, r, t)
        wf = Wavefront.from_amp_and_phase(amp, opd, 0.55, dx)
        return jnp.sum(wf.focus(10.0, Q=2).intensity.data ** 2)

    g1 = np.asarray(jax.jit(jax.grad(loss_jnp))(coefs), dtype=np.float64)
    g2 = np.asarray(jax.jit(jax.grad(loss_pallas))(coefs), dtype=np.float64)
    scale = np.abs(g1).max()
    assert np.abs(g1 - g2).max() / scale < 1e-3


def test_mdft_high_precision_grad_tier_on_chip():
    """The 3-pass 'high' MXU mode stays within 2e-4 of 6-pass 'highest'.

    bench.py's retrieval config runs the MDFT plan at
    matmul_precision='high' (18% faster); this pins the accuracy cost on
    the hardware where the pass count actually matters (CPU ignores it).
    """
    N, fN = 256, 64
    x, y = make_xy_grid(N, diameter=2.2)
    dx = 2.2 / N
    r, t = cart_to_polar(x, y)
    amp = antialias(circle_sdf(1.0, r), dx)
    modes = zernike_nm_seq(NMS, r, t)
    coefs = jnp.asarray([20.0, -10.0, 5.0, 3.0], dtype=jnp.float32)

    def build(prec):
        plan = prepare_executor(dx, (N, N), 0.4, fN, 0.55, 10.0,
                                dtype=np.complex64, matmul_precision=prec)

        def fwd(c):
            opd = sum_of_2d_modes(modes, c)
            wf = Wavefront.from_amp_and_phase(amp, opd, 0.55, dx)
            return wf.focus_dft(plan).intensity.data

        I_meas = fwd(coefs * 0.5)

        def loss(c):
            resid = fwd(c) - I_meas
            return jnp.sum(resid * resid)

        l, g = jax.jit(jax.value_and_grad(loss))(coefs)
        return float(l), np.asarray(g, dtype=np.float64)

    l_hi, g_hi = build('highest')
    l_h3, g_h3 = build('high')
    scale = np.abs(g_hi).max()
    assert np.abs(g_h3 - g_hi).max() / scale < 2e-4
    assert l_h3 == pytest.approx(l_hi, rel=2e-4)


def test_wavefront_intensity_grad_on_chip():
    """d(sum I)/d(opd) of a plane wave is ~0 (stationary phase) and the
    jitted vjp is finite everywhere."""
    N = 128
    x, y = make_xy_grid(N, diameter=2.0)
    dx = 2.0 / N
    r, t = cart_to_polar(x, y)
    amp = antialias(circle_sdf(0.9, r), dx)

    @jax.jit
    def g(opd):
        def f(o):
            wf = Wavefront.from_amp_and_phase(amp, o, 0.55, dx)
            return jnp.sum(wf.focus(10.0, Q=2).intensity.data)
        return jax.grad(f)(opd)

    gv = np.asarray(g(jnp.zeros((N, N), jnp.float32)), dtype=np.float64)
    assert np.isfinite(gv).all()
    # energy conservation makes total intensity phase-stationary
    assert np.abs(gv).max() < 1e-4
