"""Measure reference prysm (NumPy, float64) on the five BASELINE configs.

Writes BASELINE_MEASURED.json with one row per config; bench.py divides
its TPU rates by these to produce vs_baseline.  Run on the container CPU:

    python tools/measure_baseline.py [--iters-scale S]

Workloads mirror bench.py exactly (same sizes, same op chains); the
reference side uses prysm's manual adjoints where bench.py uses jax.grad.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, '/root/reference')

import prysm  # NOQA: E402
from prysm.coordinates import make_xy_grid, cart_to_polar  # NOQA: E402
from prysm.geometry import circle  # NOQA: E402
from prysm.polynomials import (  # NOQA: E402
    zernike_nm_seq, sum_of_2d_modes, sum_of_2d_modes_adjoint)
from prysm.propagation import Wavefront  # NOQA: E402
from prysm.otf import mtf_from_psf, encircled_energy  # NOQA: E402
from prysm.segmented import CompositeHexagonalAperture  # NOQA: E402
from prysm.detector import Detector  # NOQA: E402
from prysm.bayer import composite_bayer, demosaic_malvar  # NOQA: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

NMS6 = [(2, 0), (2, 2), (2, -2), (3, 1), (3, -1), (4, 0)]
WVL, EFL = 0.55, 10.0


def _time(fn, iters):
    fn()  # warmup
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def cfg1_flagship():
    """1024^2 FFT PSF+MTF forward + coef-grad backward (manual adjoints)."""
    N = 1024
    x, y = make_xy_grid(N, diameter=2.2)
    dx = float(x[0, 1] - x[0, 0])
    r, t = cart_to_polar(x, y)
    amp = circle(1.0, r)
    modes = np.asarray(zernike_nm_seq(NMS6, r, t))
    coefs = np.asarray([20.0, -10.0, 8.0, 5.0, -4.0, 3.0])
    opd = sum_of_2d_modes(modes, coefs)
    wf = Wavefront.from_amp_and_phase(amp, opd, WVL, dx)
    I_meas = wf.focus(EFL, Q=2).intensity.data

    def step():
        wfp = Wavefront.from_amp_and_phase(
            amp, sum_of_2d_modes(modes, coefs * 0.9), WVL, dx)
        at_focus = wfp.focus(EFL, Q=2)
        I = at_focus.intensity
        mtf_from_psf(I.data, I.dx)
        Ibar = 2.0 * (I.data - I_meas)
        wf_bar = at_focus.intensity_adjoint(Ibar)
        pupil_bar = wf_bar.focus_adjoint(EFL, Q=2)
        opd_bar = wfp.from_amp_and_phase_adjoint_phase(pupil_bar)
        return sum_of_2d_modes_adjoint(modes, opd_bar.data)

    sec = _time(step, 5)
    return {
        'workload': '1024^2 pupil, 6 Zernikes, FFT focus Q=2 -> PSF+MTF, '
                    'L2 PSF loss coef-gradient (fwd+bwd)',
        'reference_ms': round(sec * 1e3, 2),
        'reference_rate': round(1.0 / sec, 3),
        'unit': 'PSFs/s (fwd+bwd)',
    }


def cfg2_mdft_grad():
    """1024^2 -> 256^2 MDFT phase-retrieval gradient step (r1 workload)."""
    N, fN = 1024, 256
    x, y = make_xy_grid(N, diameter=2.2)
    dx = float(x[0, 1] - x[0, 0])
    r, t = cart_to_polar(x, y)
    amp = circle(1.0, r)
    modes = np.asarray(zernike_nm_seq(NMS6, r, t))
    coefs = np.asarray([20.0, -10.0, 8.0, 5.0, -4.0, 3.0])
    wf0 = Wavefront.from_amp_and_phase(
        amp, sum_of_2d_modes(modes, coefs), WVL, dx)
    ex = wf0.prepare_executor(EFL, 0.25, fN)
    I_meas = wf0.focus_dft(ex).intensity.data

    def step():
        wfp = Wavefront.from_amp_and_phase(
            amp, sum_of_2d_modes(modes, coefs * 0.5), WVL, dx)
        at_focus = wfp.focus_dft(ex)
        I = at_focus.intensity
        Ibar = 2.0 * (I.data - I_meas)
        wf_bar = at_focus.intensity_adjoint(Ibar)
        pupil_bar = wf_bar.focus_dft_adjoint(ex)
        opd_bar = wfp.from_amp_and_phase_adjoint_phase(pupil_bar)
        return sum_of_2d_modes_adjoint(modes, opd_bar.data)

    sec = _time(step, 8)
    return {
        'workload': 'phase-retrieval fwd+bwd step: 1024^2 pupil, 6 Zernike '
                    'modes, MDFT to 256^2, intensity L2, coef gradient',
        'reference_ms': round(sec * 1e3, 2),
        'reference_rate': round(1.0 / sec, 3),
        'unit': 'steps/s (fwd+bwd)',
    }


def cfg3_segmented():
    """2-ring hex aperture, per-segment PTT -> 512^2 PSF + encircled energy."""
    N = 512
    x, y = make_xy_grid(N, diameter=2.4)
    dx = float(x[0, 1] - x[0, 0])
    cha = CompositeHexagonalAperture(x, y, 2, 0.4, 0.007)
    cha.prepare_opd_bases(zernike_nm_seq, [(0, 0), (1, -1), (1, 1)])
    nseg = len(cha.segment_ids)
    rng = np.random.default_rng(7)
    coefs = rng.normal(scale=20.0, size=(nseg, 3))

    def step():
        opd = cha.compose_opd(coefs)
        wf = Wavefront.from_amp_and_phase(cha.amp, opd, WVL, dx)
        I = wf.focus(EFL, Q=2).intensity
        return encircled_energy(I.data, I.dx, 10.0)

    sec = _time(step, 8)
    return {
        'workload': '2-ring hex segmented aperture (19 segs, PTT), 512^2 '
                    'FFT PSF Q=2 + encircled energy @ 10 um',
        'reference_ms': round(sec * 1e3, 2),
        'reference_rate': round(1.0 / sec, 3),
        'unit': 'PSFs/s',
    }


def cfg4_angular_spectrum():
    """1024^2 plane-to-plane chain: AS -> thin lens -> AS -> intensity."""
    N = 1024
    x, y = make_xy_grid(N, diameter=10.0)
    dx = float(x[0, 1] - x[0, 0])
    r, t = cart_to_polar(x, y)
    amp = circle(4.0, r)
    wf0 = Wavefront.from_amp_and_phase(amp, None, WVL, dx)
    lens = Wavefront.thin_lens(150.0, WVL, x, y)

    def step():
        a = wf0.free_space(dz=50.0, Q=1)
        b = a * lens
        c = b.free_space(dz=100.0, Q=1)
        return c.intensity.data

    sec = _time(step, 6)
    return {
        'workload': '1024^2 angular-spectrum chain: 50 mm -> thin '
                    'lens f=150 -> 100 mm -> intensity',
        'reference_ms': round(sec * 1e3, 2),
        'reference_rate': round(1.0 / sec, 3),
        'unit': 'chains/s',
    }


def cfg5_coronagraph_chain():
    """6-wavelength Lyot (Babinet) coronagraph -> Bayer detector frame."""
    N, fN = 512, 256
    x, y = make_xy_grid(N, diameter=2.2)
    dx = float(x[0, 1] - x[0, 0])
    r, t = cart_to_polar(x, y)
    amp = circle(1.0, r)
    lyot = circle(0.9, r)
    wvls = np.linspace(0.50, 0.60, 6)
    focal_dx = 0.25
    fx, fy = make_xy_grid(fN, dx=focal_dx)
    fr = np.sqrt(fx * fx + fy * fy)
    fpm = (fr > 2.5).astype(float)  # hard occulter, radius 2.5 um
    executors, wfs = [], []
    for w in wvls:
        wf = Wavefront.from_amp_and_phase(amp, None, float(w), dx)
        wfs.append(wf)
        executors.append(wf.prepare_executor(EFL, focal_dx, fN))
    det = Detector(dark_current=2.0, read_noise=5.0, bias=100.0, fwc=60e3,
                   conversion_gain=0.5, bits=14, exposure_time=1e-2)

    def step():
        planes = []
        for wf, ex in zip(wfs, executors):
            after = wf.babinet(lyot, fpm, ex)
            planes.append(np.abs(after.focus(EFL, Q=1).data) ** 2)
        planes = np.asarray(planes)
        red = planes[4:].sum(axis=0) * 3e9
        grn = planes[2:4].sum(axis=0) * 3e9
        blu = planes[:2].sum(axis=0) * 3e9
        mosaic = composite_bayer(red, grn, grn, blu)
        frame = det.expose(mosaic)
        return demosaic_malvar(frame.astype(float))

    sec = _time(step, 5)
    return {
        'workload': '6-wavelength broadband Lyot (Babinet) coronagraph at '
                    '512^2/256^2 MDFT -> Bayer mosaic -> detector expose -> '
                    'Malvar demosaic',
        'reference_ms': round(sec * 1e3, 2),
        'reference_rate': round(1.0 / sec, 3),
        'unit': 'frames/s',
    }


def cfg6_raytrace():
    """Batched multi-field reference trace: rays x surfaces throughput."""
    sys.path.insert(0, os.path.join(REPO, 'tests'))
    from _ref_stubs import install as _install_ref_stubs
    _install_ref_stubs()
    from prysm.x import raytracing as xrt
    from prysm.x import materials as xmat

    bk7 = xmat.model_glass(1.5168, 64.17, name='BK7ish')
    sf5 = xmat.model_glass(1.6727, 32.2, name='SF5ish')
    lens = xrt.LensData()
    lens.add(xrt.Sphere(1 / 62.0), thickness=6.0, material=bk7)
    lens.add(xrt.Sphere(-1 / 45.0), thickness=3.0, material=sf5)
    lens.add(xrt.Sphere(-1 / 128.0), thickness=95.0, material=xmat.air)
    system = xrt.OpticalSystem(lens, aperture=xrt.ApertureSpec.epd(20.0),
                               fields=[0.0, 1.0, 2.0], wavelengths=[WVL],
                               stop_index=1)
    surfaces = system.to_surfaces()
    bundles = [xrt.launch(system, f, WVL, xrt.Sampling.hex(64))
               for f in system.fields]
    P = np.concatenate([b[0] for b in bundles])
    S = np.concatenate([b[1] for b in bundles])
    n_rs = P.shape[0] * len(surfaces)

    def step():
        return xrt.raytrace(surfaces, P, S, WVL)

    sec = _time(step, 5)
    return {
        'workload': 'doublet, 3 fields x hex(64) merged bundle '
                    f'({P.shape[0]} rays x {len(surfaces)} surfaces)',
        'reference_ms': round(sec * 1e3, 2),
        'reference_rate': round(n_rs / sec / 1e6, 4),
        'unit': 'Mray-surfaces/s',
    }


CONFIGS = {
    'psf_mtf_grad_1024_fft': cfg1_flagship,
    'phase_retrieval_grad_1024_mdft': cfg2_mdft_grad,
    'segmented_hex_psf_ee_512': cfg3_segmented,
    'angular_spectrum_chain_1024': cfg4_angular_spectrum,
    'broadband_coronagraph_bayer_512': cfg5_coronagraph_chain,
    'raytrace_doublet_3f_37k_rays': cfg6_raytrace,
}


def main():
    rows = {}
    for name, fn in CONFIGS.items():
        t0 = time.time()
        rows[name] = fn()
        print(f'{name}: {rows[name]["reference_rate"]} {rows[name]["unit"]}'
              f'  (measured in {time.time()-t0:.1f} s)', file=sys.stderr)
    payload = {
        'reference': 'prysm @ /root/reference, NumPy float64 backend, '
                     'manual adjoint chains',
        'machine': "this container's CPU (same host as the TPU tunnel)",
        'measured': time.strftime('%Y-%m-%d'),
        'configs': rows,
        # legacy key used by r1 bench.py; flagship-compatible alias
        'reference_steps_per_s': rows[
            'phase_retrieval_grad_1024_mdft']['reference_rate'],
    }
    out = os.path.join(REPO, 'BASELINE_MEASURED.json')
    with open(out, 'w') as f:
        json.dump(payload, f, indent=2)
    print(f'wrote {out}', file=sys.stderr)


if __name__ == '__main__':
    main()
