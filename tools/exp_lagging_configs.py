"""A/B experiment for the two lagging bench configs (VERDICT r3 item 5).

cfg5 (broadband coronagraph): 6 sequential per-wavelength CZT babinets
vs ONE stacked spectral CZT (fttools.stack_czt_plans).
cfg4 (angular-spectrum chain): transfer functions/lens/amp rebuilt inside
the loop body vs precomputed and passed as arguments.

Run on the TPU; prints slope-method ms/step for each variant.
"""
import sys

import numpy as np

sys.path.insert(0, '.')
from bench import _slope_measure, EFL  # NOQA: E402

import jax  # NOQA: E402
import jax.numpy as jnp  # NOQA: E402


def cfg5_variants():
    from prysm_tpu.coordinates import make_xy_grid
    from prysm_tpu.geometry import circle_sdf, antialias
    from prysm_tpu.propagation import prepare_executor
    from prysm_tpu.bayer import composite_bayer, demosaic_malvar
    from prysm_tpu.detector import Detector
    from prysm_tpu.propagation.fft import focus as _fft_focus
    from prysm_tpu.propagation.coronagraph import babinet as _babinet
    from prysm_tpu.fttools import stack_czt_plans

    N, fN = 512, 256
    dx = 2.2 / N
    wvls = np.linspace(0.50, 0.60, 6)
    focal_dx = 0.25
    fx, fy = np.meshgrid((np.arange(fN) - fN // 2) * focal_dx,
                         (np.arange(fN) - fN // 2) * focal_dx, indexing='xy')
    fpm = jnp.asarray((np.hypot(fx, fy) > 2.5).astype(np.float32))
    plans = tuple(prepare_executor(dx, (N, N), focal_dx, fN, float(w), EFL,
                                   kind='czt') for w in wvls)
    splan = stack_czt_plans(plans)
    det = Detector(dark_current=2.0, read_noise=5.0, bias=100.0, fwc=60e3,
                   conversion_gain=0.5, bits=14, exposure_time=1e-2)

    def tail(planes, key):
        red = planes[4:].sum(axis=0) * 3e9
        grn = planes[2:4].sum(axis=0) * 3e9
        blu = planes[:2].sum(axis=0) * 3e9
        mosaic = composite_bayer(red, grn, grn, blu)
        frame = det.expose(mosaic, seed=0)
        return demosaic_malvar(frame.astype(jnp.float32))

    def run_loop(fpm, plans, key):
        x, y = make_xy_grid(N, diameter=2.2)
        r = jnp.hypot(x, y)
        amp = antialias(circle_sdf(1.0, r), dx)
        lyot = antialias(circle_sdf(0.9, r), dx)
        after = jnp.stack([
            _babinet(amp + 0j, lyot=lyot, fpm=fpm, executor=plan)
            for plan in plans])
        at_focus = _fft_focus(after, Q=1)
        return tail(at_focus.real ** 2 + at_focus.imag ** 2, key)

    def run_stacked(fpm, splan, key):
        x, y = make_xy_grid(N, diameter=2.2)
        r = jnp.hypot(x, y)
        amp = antialias(circle_sdf(1.0, r), dx)
        lyot = antialias(circle_sdf(0.9, r), dx)
        E = jnp.broadcast_to(amp, (len(wvls), N, N)) + 0j
        after = _babinet(E, lyot=lyot, fpm=fpm, executor=splan)
        at_focus = _fft_focus(after, Q=1)
        return tail(at_focus.real ** 2 + at_focus.imag ** 2, key)

    def make(run, pl):
        def make_chain(_K):
            @jax.jit
            def chain(fpm, pl, key, K):
                def body(i, carry):
                    tok, key = carry
                    key = jax.random.fold_in(key, i)
                    frame = run(fpm * (1.0 + 1e-18 * tok), pl, key)
                    return 1e-18 * jnp.sum(frame), key
                tok, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0.0), key))
                return tok
            return chain
        return make_chain, (fpm, pl, jax.random.PRNGKey(0))

    return make(run_loop, plans), make(run_stacked, splan)


def cfg4_variants():
    from prysm_tpu.coordinates import make_xy_grid, cart_to_polar
    from prysm_tpu.geometry import circle_sdf, antialias
    from prysm_tpu.propagation import Wavefront
    from prysm_tpu.propagation.angular_spectrum import (
        angular_spectrum_transfer_function)

    N = 1024
    dx = 10.0 / N
    WVL = 0.55

    def run_inline(tok):
        x, y = make_xy_grid(N, diameter=10.0)
        r, t = cart_to_polar(x, y)
        amp = antialias(circle_sdf(4.0, r), dx) * (1.0 + 1e-18 * tok)
        wf = Wavefront.from_amp_and_phase(amp, None, WVL, dx)
        lens = Wavefront.thin_lens(150.0, WVL, x, y, dx=dx)
        a = wf.free_space(dz=50.0, Q=1)
        c = (a * lens).free_space(dz=100.0, Q=1)
        return c.intensity.data

    def make_inline():
        def make_chain(_K):
            @jax.jit
            def chain(tok, K):
                def body(_, tk):
                    return 1e-18 * jnp.sum(run_inline(tk))
                return jax.lax.fori_loop(0, K, body, tok)
            return chain
        return make_chain, (jnp.float32(1.0),)

    # planned variant: amp, lens, and both transfer functions are
    # precomputed REAL/IMAG pairs passed as arguments (plan reuse)
    x, y = make_xy_grid(N, diameter=10.0)
    r, t = cart_to_polar(x, y)
    amp0 = antialias(circle_sdf(4.0, r), dx)
    lens0 = Wavefront.thin_lens(150.0, WVL, x, y, dx=dx).data
    tf1 = angular_spectrum_transfer_function((N, N), WVL, dx, 50.0)
    tf2 = angular_spectrum_transfer_function((N, N), WVL, dx, 100.0)
    args = tuple(jnp.asarray(v) for v in (
        amp0, lens0.real, lens0.imag, tf1.real, tf1.imag,
        tf2.real, tf2.imag))

    def run_planned(tok, amp0, lr, li, t1r, t1i, t2r, t2i):
        amp = amp0 * (1.0 + 1e-18 * tok)
        wf = Wavefront.from_amp_and_phase(amp, None, WVL, dx)
        lens = jax.lax.complex(lr, li)
        tf1 = jax.lax.complex(t1r, t1i)
        tf2 = jax.lax.complex(t2r, t2i)
        a = wf.free_space(tf=tf1)
        c = Wavefront(a.data * lens, WVL, dx, a.space).free_space(tf=tf2)
        return c.intensity.data

    def make_planned():
        def make_chain(_K):
            @jax.jit
            def chain(tok, amp0, lr, li, t1r, t1i, t2r, t2i, K):
                def body(_, tk):
                    return 1e-18 * jnp.sum(
                        run_planned(tk, amp0, lr, li, t1r, t1i, t2r, t2i))
                return jax.lax.fori_loop(0, K, body, tok)
            return chain
        return make_chain, (jnp.float32(1.0),) + args

    return make_inline(), make_planned()


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else 'both'
    if which in ('cfg5', 'both'):
        (mc_a, args_a), (mc_b, args_b) = cfg5_variants()
        ta = _slope_measure(mc_a, args_a)
        print(f"cfg5 per-wavelength loop: {ta['median_s']*1e3:.4f} ms/frame")
        tb = _slope_measure(mc_b, args_b)
        print(f"cfg5 stacked spectral CZT: {tb['median_s']*1e3:.4f} ms/frame "
              f"({ta['median_s']/tb['median_s']:.2f}x)")
    if which in ('cfg4', 'both'):
        (mc_a, args_a), (mc_b, args_b) = cfg4_variants()
        ta = _slope_measure(mc_a, args_a)
        print(f"cfg4 inline TFs: {ta['median_s']*1e3:.4f} ms/chain")
        tb = _slope_measure(mc_b, args_b)
        print(f"cfg4 planned TFs: {tb['median_s']*1e3:.4f} ms/chain "
              f"({ta['median_s']/tb['median_s']:.2f}x)")


if __name__ == '__main__':
    main()
