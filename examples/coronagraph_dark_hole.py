"""Dig a dark hole behind a vortex Lyot coronagraph.

An aberrated pupil leaks starlight into the focal plane; Zernike-basis
wavefront control minimizes the energy in an annular dark zone with
gradients through Babinet propagation.  Swap the mesh-sharded variants
from prysm_tpu.parallel to run the level stack across chips.
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
from prysm_tpu.propagation.dft import focus_dft, coordinates_for_focus
from prysm_tpu.propagation.coronagraph import vortex_phase_mask, babinet
from prysm_tpu.x import optym


def main(N=128, fN=64, wvl=0.55, efl=10.0, seed=3, plot=False):
    dx = 2.2 / N
    fdx = 0.25
    nms = [(n, m) for n in range(2, 5) for m in range(-n, n + 1, 2)]
    plan = prepare_executor(dx, (N, N), fdx, fN, wvl, efl)

    # host-side (numpy) focal masks; device arrays ride as jit ARGUMENTS
    _, _, fx, fy = coordinates_for_focus(dx, (N, N), fdx, fN, wvl, efl)
    fxx, fyy = np.meshgrid(fx * wvl * efl, fy * wvl * efl)
    fpm = jnp.asarray(vortex_phase_mask(2)(fxx, fyy))
    fr = np.hypot(fxx, fyy)
    dark = jnp.asarray(((fr > 1.5) & (fr < 5.5)).astype(float))
    rng = np.random.default_rng(seed)
    aberr_coefs = jnp.asarray(25.0 * rng.standard_normal(len(nms)))

    # pupil synthesis lives INSIDE the traced function (see phase_retrieval)
    def dark_energy(c, plan, fpm, dark, aberr_coefs):
        x, y = make_xy_grid(N, diameter=2.2)
        r, t = cart_to_polar(x, y)
        amp = antialias(circle_sdf(1.0, r), dx)
        modes = zernike_nm_seq(nms, r, t)
        lyot = antialias(circle_sdf(0.88, r), dx)
        opd = sum_of_2d_modes(modes, aberr_coefs + 0.0) \
            + sum_of_2d_modes(modes, c)
        wf = Wavefront.from_amp_and_phase(amp, opd, wvl, dx)
        field = babinet(wf.data, lyot, fpm, plan)
        img = focus_dft(field, plan)
        return jnp.sum((img.real ** 2 + img.imag ** 2) * dark)

    args = (plan, fpm, dark, aberr_coefs)
    e0 = float(dark_energy(jnp.zeros(len(nms)), *args))
    fg = jax.jit(jax.value_and_grad(dark_energy))
    opt = optym.PrysmLBFGSB(lambda c: fg(c, *args), jnp.zeros(len(nms)))
    optym.run_until(opt, optym.MaxIterations(120))
    e1 = float(dark_energy(opt.x, *args))
    print(f'dark-zone energy: {e0:.3e} -> {e1:.3e} '
          f'({e0 / e1:.0f}x suppression, {len(nms)} control modes)')

    if plot:
        import matplotlib.pyplot as plt
        I = np.log10(np.maximum(np.asarray(
            jax.jit(lambda c: dark_energy(c) * 0 + 1)(opt.x)), 1e-12))
        plt.imshow(I)
        plt.show()
    return e0 / e1


if __name__ == '__main__':
    main(plot=False)
