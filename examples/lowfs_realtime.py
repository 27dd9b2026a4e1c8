"""Low-order wavefront sensing (LOWFS) at real-time rates.

The reference library's headline deployment is lowfssim — the NASA Roman
Coronagraph low-order wavefront sensor model, advertised at >2 kHz frame
rate (reference README.md:10) and a 900,000x run-rate increase over its
PROPER-based predecessor (reference docs, "GPU and Exascale Computing").
This example builds the same shape of model on the TPU API and measures
the closed-loop sensing rate.

Model: an obscured pupil with a defocus bias (the LOWFS operating point),
a matrix-DFT to a small focal-plane camera, a linear least-squares
reconstructor from the intensity Jacobian at the operating point, and the
estimation step

    c_hat = R @ (I_frame - I_0)

which is how real LOWFS loops run (the Jacobian/reconstructor is computed
once offline; per-frame work is one small matmul after the optical
forward model renders the frame).

main() checks estimator accuracy in the linear regime; __main__ times the
per-frame sensing step (render + estimate, the full loop body) on the
available accelerator and reports frames/s next to the reference's 2 kHz
headline.
"""
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
if 'JAX_PLATFORMS' in os.environ:
    import jax as _jax
    _jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])

import numpy as np

import jax
import jax.numpy as jnp

from prysm_tpu.coordinates import make_xy_grid, cart_to_polar
from prysm_tpu.geometry import annulus_sdf, spider_sdf, subtract, antialias
from prysm_tpu.polynomials import zernike_nm_seq, sum_of_2d_modes
from prysm_tpu.propagation import Wavefront, prepare_executor


# low-order modes the sensor estimates: focus, astigmatisms, comas, spherical
NMS = [(2, 0), (2, 2), (2, -2), (3, 1), (3, -1), (4, 0)]
DEFOCUS_BIAS_NM = 300.0     # LOWFS operates off a deliberate defocus bias


def build(N=256, fN=64, wvl=0.55, efl=10.0):
    """Host-side setup: pupil geometry, focal plan, bias OPD."""
    dx = 2.2 / N
    x, y = make_xy_grid(N, diameter=2.2)
    r, t = cart_to_polar(x, y)
    d = annulus_sdf(0.31, 1.0, r)                     # Roman-like obscuration
    d = subtract(d, spider_sdf(3, 0.05, x, y))
    amp = antialias(d, dx)
    modes = zernike_nm_seq(NMS, r, t)                 # (K, N, N)
    bias = DEFOCUS_BIAS_NM * modes[0]                 # defocus operating point
    plan = prepare_executor(dx, (N, N), 0.25, fN, wvl, efl)
    return dict(amp=amp, modes=modes, bias=bias, plan=plan, wvl=wvl, dx=dx)


def render(coefs, amp, modes, bias, plan, wvl, dx):
    """Focal-plane frame for low-order coefficients (nm) on the bias point."""
    opd = bias + sum_of_2d_modes(modes, coefs)
    wf = Wavefront.from_amp_and_phase(amp, opd, wvl, dx)
    return wf.focus_dft(plan).intensity.data


def reconstructor(setup):
    """Linear least-squares LOWFS reconstructor R: (K, fN*fN).

    Rows of the Jacobian dI/dc at the operating point, pseudo-inverted.
    Computed once, offline — exactly how flight LOWFS tables are built.
    """
    zeros = jnp.zeros(len(NMS), dtype=setup['amp'].dtype)
    fwd = lambda c: render(c, **setup).ravel()
    J = jax.jacfwd(fwd)(zeros)                        # (fN*fN, K)
    R = jnp.linalg.pinv(J)                            # (K, fN*fN)
    I0 = fwd(zeros)
    return R, I0


def sense(frame, R, I0):
    """Per-frame estimation: one small matvec."""
    return R @ (frame.ravel() - I0)


def main(N=256, fN=64, amp_nm=3.0, seed=0):
    """Accuracy check in the linear regime; returns max |error| in nm."""
    setup = build(N=N, fN=fN)
    R, I0 = reconstructor(setup)

    step = jax.jit(lambda c, setup, R, I0:
                   sense(render(c, **setup), R, I0))

    rng = np.random.default_rng(seed)
    worst = 0.0
    for _ in range(5):
        c_true = jnp.asarray(rng.uniform(-amp_nm, amp_nm, len(NMS)),
                             dtype=setup['amp'].dtype)
        c_hat = step(c_true, setup, R, I0)
        worst = max(worst, float(jnp.max(jnp.abs(c_hat - c_true))))
    return worst


if __name__ == '__main__':
    # Honest timing on relay-tunneled accelerators (bench.py lesson 1):
    # block_until_ready does not await execution, so time ONE program
    # chaining K sensing steps (the estimate feeds the next stimulus —
    # exactly a closed sensing loop) ended by a fetch, and take the
    # slope between two K values.
    setup = build()
    R, I0 = reconstructor(setup)
    c = jnp.asarray([1.0, -0.5, 0.3, 0.2, -0.1, 0.4], dtype=setup['amp'].dtype)

    def make_chain(K):
        @jax.jit
        def run(c, R, I0):
            def body(_, ck):
                est = sense(render(ck, **setup), R, I0)
                return ck + 1e-6 * est     # closed-loop feedback
            return jnp.sum(jax.lax.fori_loop(0, K, body, c))
        return run

    def timed(K, reps=3):
        fn = make_chain(K)
        jax.block_until_ready(fn(c, R, I0))  # compile untimed
        best = float('inf')
        for _ in range(reps):
            t0 = time.time()
            v = float(fn(c, R, I0))          # the fetch is the sync
            best = min(best, time.time() - t0)
            assert np.isfinite(v)
        return best

    K1, K2 = 64, 1024
    per_step = (timed(K2) - timed(K1)) / (K2 - K1)
    rate = 1.0 / per_step
    print(f'LOWFS sensing rate: {rate:,.0f} frames/s '
          f'({rate / 2000:.0f}x the reference lowfssim 2 kHz headline)')

    err = main()
    print(f'max estimation error at 3 nm stimulus: {err:.4f} nm')
