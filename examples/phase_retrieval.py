"""Focus-diverse phase retrieval with gradients through the whole model.

Builds a synthetic pupil with known Zernike aberrations, renders two
defocus-diverse focal-plane images, then recovers the coefficients with
L-BFGS driven by jax.value_and_grad through pupil synthesis + matrix
DFT.  The forward/gradient evaluation jits on any backend; the
optimizer's own small host-side math favors CPU execution (on remote
accelerators every eager op is a round trip).
"""
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
if 'JAX_PLATFORMS' in os.environ:
    # some hosts pre-import jax before env vars are read; re-assert
    import jax as _jax
    _jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])

import numpy as np

import jax
import jax.numpy as jnp

from prysm_tpu.coordinates import make_xy_grid, cart_to_polar
from prysm_tpu.geometry import circle_sdf, antialias
from prysm_tpu.polynomials import zernike_nm_seq, sum_of_2d_modes
from prysm_tpu.propagation import Wavefront, prepare_executor
from prysm_tpu.x import optym


def main(N=256, fN=96, wvl=0.55, efl=10.0, seed=0):
    dx = 2.2 / N
    nms = [(2, 0), (2, 2), (2, -2), (3, 1), (3, -1), (4, 0)]
    plan = prepare_executor(dx, (N, N), 0.3, fN, wvl, efl)

    # everything heavy lives INSIDE the traced function and the plan
    # (complex basis arrays) rides as a jit ARGUMENT — no eager device
    # arrays become closure constants, the portable pattern for every
    # backend (and required on ones that cannot read device constants)
    def forward(coefs, sign, plan):
        x, y = make_xy_grid(N, diameter=2.2)
        r, t = cart_to_polar(x, y)
        amp = antialias(circle_sdf(1.0, r), dx)
        modes = zernike_nm_seq(nms, r, t)
        opd = sum_of_2d_modes(modes, coefs) + sign * (modes[0] * 150.0)
        wf = Wavefront.from_amp_and_phase(amp, opd, wvl, dx)
        return wf.focus_dft(plan).intensity.data

    rng = np.random.default_rng(seed)
    truth = jnp.asarray(30.0 * rng.standard_normal(len(nms)))
    I_plus = jax.jit(forward, static_argnums=1)(truth, +1.0, plan)
    I_minus = jax.jit(forward, static_argnums=1)(truth, -1.0, plan)

    def loss(c, plan, I_p, I_m):
        return (jnp.sum((forward(c, +1.0, plan) - I_p) ** 2)
                + jnp.sum((forward(c, -1.0, plan) - I_m) ** 2))

    fg = jax.jit(jax.value_and_grad(loss))
    opt = optym.PrysmLBFGSB(lambda c: fg(c, plan, I_plus, I_minus),
                            jnp.zeros(len(nms)))
    res = optym.run_until(opt, optym.AnyGovernor([
        optym.MaxIterations(60), optym.GradientTolerance(1e-12)]))
    err = np.abs(np.asarray(opt.x) - np.asarray(truth)).max()
    print(f'truth      : {np.round(np.asarray(truth), 3)}')
    print(f'recovered  : {np.round(np.asarray(opt.x), 3)}')
    print(f'iterations : {res.nit}   max |error| = {err:.2e} nm')
    return err


if __name__ == '__main__':
    main()
