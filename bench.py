"""Benchmark: the five BASELINE configs on one TPU chip.

Prints one JSON line per config, then a final combined line whose parsed
form is the flagship metric (PSFs/s fwd+bwd at 1024^2, BASELINE.json's
north star) carrying all five results, an XLA-cost-model FLOP self-audit,
and a Pallas kernel validation flag.

vs_baseline divides each TPU rate by the matching row of
BASELINE_MEASURED.json (reference prysm, NumPy float64, manual adjoints,
measured on this container's CPU by tools/measure_baseline.py).

axon-relay ground rules baked in (see .claude/skills/verify/SKILL.md):
whole models live inside jit with arrays as jit ARGUMENTS (no eager
complex device constants), every timing is validated by fetching a float
AFTER the clock stops, and a hung relay is detected by a SIGALRM-guarded
probe so a wedged child exits in seconds instead of timing out.
"""
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

NMS6 = [(2, 0), (2, 2), (2, -2), (3, 1), (3, -1), (4, 0)]
WVL, EFL = 0.55, 10.0


# ---------------------------------------------------------------------------
# timing harness
# ---------------------------------------------------------------------------

def _measure(step, args, *, iters, rounds=5):
    """Median/IQR seconds-per-call of an already-compiled jitted step.

    No device->host reads happen here: on the axon relay, a single fetch
    permanently disables execution pipelining for the whole process, so
    timings only block_until_ready and hand the last output back for the
    caller to validate AFTER every config has been timed.
    """
    import jax
    samples = []
    out = None
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(*args)
        jax.block_until_ready(out)
        samples.append((time.perf_counter() - t0) / iters)
    med = float(np.median(samples))
    q1, q3 = np.percentile(samples, [25, 75])
    return {'median_s': med, 'iqr_ms': round(float(q3 - q1) * 1e3, 4)}, out


def _check_finite(name, out):
    """Fetch one leaf and require finiteness (relay failures are async)."""
    import jax
    probe = np.asarray(jax.tree_util.tree_leaves(out)[0], dtype=np.float64)
    if not np.all(np.isfinite(probe)):
        raise RuntimeError(f'{name} produced non-finite output')


def _emit(name, timing, unit, baseline_rate, extra=None):
    rate = 1.0 / timing['median_s']
    row = {
        'metric': name,
        'value': round(rate, 2),
        'unit': unit,
        'vs_baseline': (round(rate / baseline_rate, 2)
                        if baseline_rate else None),
        'median_ms': round(timing['median_s'] * 1e3, 4),
        'iqr_ms': timing['iqr_ms'],
    }
    if extra:
        row.update(extra)
    print(json.dumps(row), flush=True)
    return row


def _baseline_rates():
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               'BASELINE_MEASURED.json')) as f:
            rows = json.load(f).get('configs', {})
        return {k: v.get('reference_rate') for k, v in rows.items()}
    except Exception:
        return {}


# ---------------------------------------------------------------------------
# the five configs
# ---------------------------------------------------------------------------

def cfg1_flagship(jax, jnp):
    """1024^2 FFT PSF+MTF fwd + coef-grad bwd: the north-star metric."""
    from prysm_tpu.coordinates import make_xy_grid, cart_to_polar
    from prysm_tpu.geometry import circle_sdf, antialias
    from prysm_tpu.polynomials import zernike_nm_seq, sum_of_2d_modes
    from prysm_tpu.propagation import Wavefront
    from prysm_tpu.otf import mtf_from_psf

    N = 1024
    dx = 2.2 / N
    coefs = jnp.asarray([20., -10., 8., 5., -4., 3.], dtype=jnp.float32)

    def forward(c):
        x, y = make_xy_grid(N, diameter=2.2)
        r, t = cart_to_polar(x, y)
        amp = antialias(circle_sdf(1.0, r), dx)
        opd = sum_of_2d_modes(zernike_nm_seq(NMS6, r, t), c)
        I = Wavefront.from_amp_and_phase(amp, opd, WVL, dx) \
            .focus(EFL, Q=2).intensity
        return I

    measure = jax.jit(lambda c: forward(c).data)
    I_meas = measure(coefs)
    jax.block_until_ready(I_meas)

    def loss(c, I_meas):
        I = forward(c * 0.9)
        mtf = mtf_from_psf(I.data, I.dx).data
        return jnp.sum((I.data - I_meas) ** 2), mtf

    step = jax.jit(jax.value_and_grad(loss, has_aux=True))
    out = step(coefs, I_meas)
    jax.block_until_ready(out)
    return step, (coefs, I_meas), loss


def cfg2_mdft_grad(jax, jnp):
    """1024^2 -> 256^2 MDFT phase-retrieval grad step (the r1 workload)."""
    from prysm_tpu.coordinates import make_xy_grid, cart_to_polar
    from prysm_tpu.geometry import circle_sdf, antialias
    from prysm_tpu.polynomials import zernike_nm_seq, sum_of_2d_modes
    from prysm_tpu.propagation import Wavefront, prepare_executor
    from prysm_tpu.ops import dispatch as ops_dispatch
    from prysm_tpu.ops.zernike import zernike_sum_pallas
    from prysm_tpu.ops.raster import circle_raster_pallas

    N, fN = 1024, 256
    dx = 2.2 / N
    plan = prepare_executor(dx, (N, N), 0.25, fN, WVL, EFL)
    coefs = jnp.asarray([20., -10., 8., 5., -4., 3.], dtype=jnp.float32)

    def forward(c, plan):
        x, y = make_xy_grid(N, diameter=2.2)
        r, t = cart_to_polar(x, y)
        if ops_dispatch.pallas_enabled():
            amp = circle_raster_pallas(1.0, r, dx)
            opd = zernike_sum_pallas(c, NMS6, r, t, grads='coefs')
        else:
            amp = antialias(circle_sdf(1.0, r), dx)
            opd = sum_of_2d_modes(zernike_nm_seq(NMS6, r, t), c)
        E = Wavefront.from_amp_and_phase(amp, opd, WVL, dx).focus_dft(plan)
        return E.intensity.data

    measure = jax.jit(lambda c, plan: forward(c * 0.5, plan))
    I_meas = measure(coefs, plan)
    jax.block_until_ready(I_meas)

    def loss(c, plan, I_meas):
        return jnp.sum((forward(c, plan) - I_meas) ** 2)

    step = jax.jit(jax.value_and_grad(loss))
    out = step(coefs, plan, I_meas)
    jax.block_until_ready(out)
    return step, (coefs, plan, I_meas), loss


def cfg3_segmented(jax, jnp):
    """2-ring hex segmented aperture PTT -> 512^2 PSF + encircled energy."""
    from prysm_tpu.coordinates import make_xy_grid
    from prysm_tpu.polynomials import zernike_nm_seq
    from prysm_tpu.propagation import Wavefront
    from prysm_tpu.otf import encircled_energy
    from prysm_tpu.segmented import CompositeHexagonalAperture

    N = 512
    # host grids: the composite-aperture planner is host-side geometry,
    # and ANY device->host read (even np.asarray of a device grid, once)
    # permanently de-pipelines every later timing on the relay
    x, y = make_xy_grid(N, diameter=2.4, host=True)
    dx = 2.4 / N
    cha = CompositeHexagonalAperture(x, y, 2, 0.4, 0.007)
    cha.prepare_opd_bases(zernike_nm_seq, [(0, 0), (1, -1), (1, 1)])
    nseg = len(cha.segment_ids)
    import jax.numpy as _jnp
    coefs = _jnp.asarray(np.random.default_rng(7).normal(
        scale=20.0, size=(nseg, 3)).astype(np.float32))
    amp = _jnp.asarray(cha.amp, dtype=_jnp.float32)

    def run(c, amp):
        opd = cha.compose_opd(c)
        I = Wavefront.from_amp_and_phase(amp, opd, WVL, dx) \
            .focus(EFL, Q=2).intensity
        return encircled_energy(I.data, I.dx, 10.0), I.data

    step = jax.jit(run)
    out = step(coefs, amp)
    jax.block_until_ready(out)
    return step, (coefs, amp), run


def cfg4_angular_spectrum(jax, jnp):
    """1024^2 plane-to-plane chain: AS -> thin lens -> AS -> intensity."""
    from prysm_tpu.coordinates import make_xy_grid, cart_to_polar
    from prysm_tpu.geometry import circle_sdf, antialias
    from prysm_tpu.propagation import Wavefront

    N = 1024
    dx = 10.0 / N

    def run(_):
        x, y = make_xy_grid(N, diameter=10.0)
        r, t = cart_to_polar(x, y)
        amp = antialias(circle_sdf(4.0, r), dx)
        wf = Wavefront.from_amp_and_phase(amp, None, WVL, dx)
        lens = Wavefront.thin_lens(150.0, WVL, x, y, dx=dx)
        a = wf.free_space(dz=50.0, Q=1)
        c = (a * lens).free_space(dz=100.0, Q=1)
        return c.intensity.data

    step = jax.jit(run)
    tok = jnp.float32(1.0)   # device scalar: a numpy arg would re-upload
    out = step(tok)
    jax.block_until_ready(out)
    return step, (tok,), run


def cfg5_coronagraph(jax, jnp):
    """6-wavelength Lyot (Babinet) -> Bayer mosaic -> detector -> demosaic."""
    from prysm_tpu.coordinates import make_xy_grid
    from prysm_tpu.geometry import circle_sdf, antialias
    from prysm_tpu.propagation import Wavefront, prepare_executor
    from prysm_tpu.bayer import composite_bayer, demosaic_malvar
    from prysm_tpu.detector import Detector

    N, fN = 512, 256
    dx = 2.2 / N
    wvls = np.linspace(0.50, 0.60, 6)
    focal_dx = 0.25
    fx, fy = np.meshgrid(
        (np.arange(fN) - fN // 2) * focal_dx,
        (np.arange(fN) - fN // 2) * focal_dx, indexing='xy')
    import jax.numpy as _jnp
    fpm = _jnp.asarray((np.hypot(fx, fy) > 2.5).astype(np.float32))
    plans = tuple(
        prepare_executor(dx, (N, N), focal_dx, fN, float(w), EFL)
        for w in wvls)
    det = Detector(dark_current=2.0, read_noise=5.0, bias=100.0, fwc=60e3,
                   conversion_gain=0.5, bits=14, exposure_time=1e-2)

    def run(fpm, plans, key):
        x, y = make_xy_grid(N, diameter=2.2)
        r = jnp.hypot(x, y)
        amp = antialias(circle_sdf(1.0, r), dx)
        lyot = antialias(circle_sdf(0.9, r), dx)
        planes = []
        for w, plan in zip(wvls, plans):
            wf = Wavefront.from_amp_and_phase(amp, None, float(w), dx)
            after = wf.babinet(lyot, fpm, plan)
            planes.append(after.focus(EFL, Q=1).intensity.data)
        planes = jnp.stack(planes)
        red = planes[4:].sum(axis=0) * 3e9
        grn = planes[2:4].sum(axis=0) * 3e9
        blu = planes[:2].sum(axis=0) * 3e9
        mosaic = composite_bayer(red, grn, grn, blu)
        frame = det.expose(mosaic, key=key)
        return demosaic_malvar(frame.astype(jnp.float32))

    step = jax.jit(run)
    key = __import__('jax').random.PRNGKey(0)
    out = step(fpm, plans, key)
    jax.block_until_ready(out)
    return step, (fpm, plans, key), run



def cfg6_raytrace(jax, jnp):
    """Batched multi-field trace: rays x surfaces throughput on device."""
    import prysm_tpu.x.raytracing as rt
    import prysm_tpu.x.materials as mat
    from prysm_tpu.x.raytracing.batch import _host_launches
    from prysm_tpu.x.raytracing.spencer_and_murty import raytrace

    bk7 = mat.model_glass(1.5168, 64.17, name='BK7ish')
    sf5 = mat.model_glass(1.6727, 32.2, name='SF5ish')
    lens = rt.LensData()
    lens.add(rt.Sphere(1 / 62.0), thickness=6.0, material=bk7)
    lens.add(rt.Sphere(-1 / 45.0), thickness=3.0, material=sf5)
    lens.add(rt.Sphere(-1 / 128.0), thickness=95.0, material=mat.air)
    system = rt.OpticalSystem(lens, aperture=rt.ApertureSpec.epd(20.0),
                              fields=[0.0, 1.0, 2.0], wavelengths=[WVL],
                              stop_index=1)
    surfaces = system.to_surfaces()
    P, S = _host_launches(system, list(system.fields), WVL,
                          rt.Sampling.hex(64), None)
    F, N = P.shape[:2]
    import jax.numpy as _jnp
    P = _jnp.asarray(P.reshape(F * N, 3).astype(np.float32))
    S = _jnp.asarray(S.reshape(F * N, 3).astype(np.float32))

    def run(P, S):
        res = raytrace(surfaces, P, S, WVL)
        return res.P, res.status

    step = jax.jit(run)
    out = step(P, S)
    jax.block_until_ready(out)
    run.rays_surfaces = F * N * len(surfaces)
    return step, (P, S), run

# ---------------------------------------------------------------------------
# kernel validation (on whatever backend is live; real TPU under the driver)
# ---------------------------------------------------------------------------

def _validate_kernels(jax, jnp):
    """Compiled-path sanity of the Pallas kernels vs jnp references."""
    from prysm_tpu.ops import dispatch as ops_dispatch
    if not ops_dispatch.pallas_enabled():
        return False
    from prysm_tpu.coordinates import make_xy_grid, cart_to_polar
    from prysm_tpu.geometry import circle_sdf, antialias
    from prysm_tpu.polynomials import zernike_nm_seq, sum_of_2d_modes
    from prysm_tpu.ops.raster import circle_raster_pallas
    from prysm_tpu.ops.zernike import zernike_sum_pallas
    from prysm_tpu.ops.noise import expose_pallas

    N = 256
    dx = 2.0 / N
    x, y = make_xy_grid(N, diameter=2.0)
    r, t = cart_to_polar(x, y)
    c = jnp.asarray([5.0, -3.0, 2.0, 1.0, -1.0, 0.5], jnp.float32)

    @jax.jit
    def both(c, r, t):
        a_p = circle_raster_pallas(0.8, r, dx)
        a_j = antialias(circle_sdf(0.8, r), dx)
        z_p = zernike_sum_pallas(c, NMS6, r, t, grads='coefs')
        z_j = sum_of_2d_modes(zernike_nm_seq(NMS6, r, t), c)
        return (jnp.max(jnp.abs(a_p - a_j)), jnp.max(jnp.abs(z_p - z_j)),
                jnp.max(jnp.abs(z_j)))

    da, dz, zmax = both(c, r, t)
    if float(da) > 1e-5 or float(dz) > 1e-3 * float(zmax):
        raise RuntimeError(
            f'pallas kernels diverge from jnp: raster {float(da)}, '
            f'zernike {float(dz)} (scale {float(zmax)})')

    # detector noise kernel: first/second moments vs the analytic chain
    mean_e = 1000.0
    img = jnp.full((256, 256), mean_e, jnp.float32)
    frames = np.asarray(jax.jit(
        lambda im: expose_pallas(im, 4, 123, 5.0, 100.0, 60e3, 0.5, 14))(img),
        dtype=np.float64)
    want_mean = (mean_e + 100.0) / 0.5
    got_mean = frames.mean()
    want_std = np.sqrt(mean_e + 5.0 ** 2) / 0.5
    got_std = frames.std()
    if abs(got_mean - want_mean) > 0.02 * want_mean \
            or abs(got_std - want_std) > 0.1 * want_std:
        raise RuntimeError(
            f'noise kernel stats off: mean {got_mean} vs {want_mean}, '
            f'std {got_std} vs {want_std}')
    return True


# ---------------------------------------------------------------------------
# main
# ---------------------------------------------------------------------------

def _flops_of(jax, fn, args):
    from prysm_tpu.profiling import compiled_stats
    try:
        return compiled_stats(fn, *args).get('flops')
    except Exception:
        return None


def main():
    import jax
    import jax.numpy as jnp

    base = _baseline_rates()
    results = {}

    plan = [
        ('psf_mtf_grad_1024_fft', cfg1_flagship, 'PSFs/s/chip (fwd+bwd)', 50),
        ('phase_retrieval_grad_1024_mdft', cfg2_mdft_grad,
         'steps/s/chip (fwd+bwd)', 100),
        ('segmented_hex_psf_ee_512', cfg3_segmented, 'PSFs/s/chip', 50),
        ('angular_spectrum_chain_1024', cfg4_angular_spectrum,
         'chains/s/chip', 50),
        ('broadband_coronagraph_bayer_512', cfg5_coronagraph,
         'frames/s/chip', 20),
        ('raytrace_doublet_3f_37k_rays', cfg6_raytrace,
         'Mray-surfaces/s/chip', 20),
    ]

    # Phase 1: build + warm + TIME every config with zero device->host
    # reads (a single fetch disables the relay's execution pipelining and
    # would penalize every config timed after it).
    timings, lasts, fns = {}, {}, {}
    for name, builder, unit, iters in plan:
        step, args, raw_fn = builder(jax, jnp)
        timings[name], lasts[name] = _measure(step, args, iters=iters)
        fns[name] = (raw_fn, args)

    # Phase 2: fetches — validate outputs, kernels, and the FLOP audit.
    flags = {}
    for name, out in lasts.items():
        _check_finite(name, out)
    try:
        flags['kernels_validated'] = _validate_kernels(jax, jnp)
    except Exception as e:  # pragma: no cover
        flags['kernels_validated'] = False
        flags['kernel_validation_error'] = str(e)[:200]

    flagship_flops = _flops_of(jax, *fns['psf_mtf_grad_1024_fft'])
    for name, builder, unit, iters in plan:
        timing = timings[name]
        extra = {}
        rs = getattr(fns[name][0], 'rays_surfaces', None)
        if rs:
            # report mega-(ray x surface) ops per second, not calls/s
            timing = dict(timing)
            timing['median_s'] = timing['median_s'] / (rs / 1e6)
        if name == 'psf_mtf_grad_1024_fft' and flagship_flops:
            extra['xla_cost_model_gflop_per_step'] = round(
                flagship_flops / 1e9, 2)
            extra['xla_cost_model_tflops_per_s'] = round(
                flagship_flops / timing['median_s'] / 1e12, 3)
        results[name] = _emit(name, timing, unit, base.get(name), extra)

    flagship = results['psf_mtf_grad_1024_fft']
    final = {
        'metric': 'psfs_per_s_1024sq_fwd_bwd',
        'value': flagship['value'],
        'unit': flagship['unit'],
        'vs_baseline': flagship['vs_baseline'],
        'platform': jax.devices()[0].platform,
        'configs': {k: {kk: v[kk] for kk in
                        ('value', 'unit', 'vs_baseline', 'median_ms',
                         'iqr_ms')}
                    for k, v in results.items()},
        **flags,
    }
    if flagship_flops:
        final['xla_cost_model_tflops_per_s'] = flagship.get('xla_cost_model_tflops_per_s')
    print(json.dumps(final), flush=True)


# ---------------------------------------------------------------------------
# relay-hang containment
# ---------------------------------------------------------------------------

def _probe_backend(timeout_s=75):
    """Fail fast (exit 3) when the axon relay is wedged.

    A wedged relay hangs the first compile indefinitely; SIGALRM turns
    that into a quick, retryable child exit instead of a 400 s timeout.
    """
    def _boom(signum, frame):
        sys.stderr.write('backend probe timed out; relay is wedged\n')
        os._exit(3)

    signal.signal(signal.SIGALRM, _boom)
    signal.alarm(timeout_s)
    import jax
    if os.environ.get('PRYSM_TPU_BENCH_CPU'):
        # debug escape hatch: sitecustomize pins the axon platform, so the
        # env var alone cannot reach CPU (see verify SKILL.md)
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    v = jax.jit(lambda a: (a * 2 + 1).sum())(jnp.arange(8, dtype=jnp.float32))
    # block, do NOT read: one device->host fetch here would permanently
    # disable the relay's execution pipelining and inflate every timing
    # ~10x (the r1 bench measured 47 us/step; a probe fetch made it 580)
    jax.block_until_ready(v)
    signal.alarm(0)


def _run_with_process_retries(attempts=4):
    """Run the bench in child processes; retry with cooldown on relay flake."""
    for attempt in range(attempts):
        env = dict(os.environ, PRYSM_TPU_BENCH_CHILD='1')
        try:
            proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                                  env=env, capture_output=True, text=True,
                                  timeout=560)
        except subprocess.TimeoutExpired:
            sys.stderr.write(f'bench child attempt {attempt} timed out\n')
            time.sleep(60)
            continue
        out = proc.stdout.strip().splitlines()
        if proc.returncode == 0 and out:
            for line in out:
                print(line)
            return 0
        sys.stderr.write(proc.stderr[-2000:] + '\n')
        cooldown = 90 if proc.returncode == 3 else 30 * (attempt + 1)
        time.sleep(cooldown)
    return 1


if __name__ == '__main__':
    if os.environ.get('PRYSM_TPU_BENCH_CHILD'):
        _probe_backend()
        main()
    else:
        sys.exit(_run_with_process_retries())
