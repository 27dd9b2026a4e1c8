"""Benchmark: phase-retrieval gradient steps/s on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Workload (matches BASELINE_MEASURED.json): 1024^2 pupil, 6 Zernike modes,
matrix-DFT to a 256^2 focal grid, intensity L2 data term, gradient w.r.t.
the mode coefficients.  vs_baseline is the speedup over reference prysm's
NumPy float64 manual-adjoint chain measured on this machine's CPU.

The whole model (mode synthesis included) lives inside one jitted function
and all arrays are jit arguments — the supported pattern on the axon TPU
backend (see .claude/skills/verify/SKILL.md).
"""
import json
import os
import subprocess
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from prysm_tpu.coordinates import make_xy_grid, cart_to_polar
    from prysm_tpu.geometry import circle_sdf, antialias
    from prysm_tpu.polynomials import zernike_nm_seq, sum_of_2d_modes
    from prysm_tpu.propagation import Wavefront, prepare_executor
    from prysm_tpu.ops import dispatch as ops_dispatch
    from prysm_tpu.ops.zernike import zernike_sum_pallas
    from prysm_tpu.ops.raster import circle_raster_pallas

    N = 1024
    fN = 256
    wvl, efl = 0.55, 10.0
    nms = [(2, 0), (2, 2), (2, -2), (3, 1), (3, -1), (4, 0)]

    dx = 2.2 / N
    # host-built plan; coefs ship host -> device as jit arguments.  The grid
    # and pupil synthesis live INSIDE the traced program: zero eager device
    # ops, the supported pattern on the axon backend.
    plan = prepare_executor(dx, (N, N), 0.25, fN, wvl, efl)
    coefs = np.asarray([20.0, -10.0, 8.0, 5.0, -4.0, 3.0], dtype=np.float32)

    def forward(c, plan):
        x, y = make_xy_grid(N, diameter=2.2)
        r, t = cart_to_polar(x, y)
        if ops_dispatch.pallas_enabled():
            # fused Pallas kernels: raster + mode synthesis never touch HBM
            # with intermediates (prysm_tpu/ops; 2.4x the jnp step on v5e)
            amp = circle_raster_pallas(1.0, r, dx)
            # grids are fixed geometry: backward computes coef grads only
            opd = zernike_sum_pallas(c, nms, r, t, grads='coefs')
        else:
            amp = antialias(circle_sdf(1.0, r), dx)
            modes = zernike_nm_seq(nms, r, t)
            opd = sum_of_2d_modes(modes, c)
        E = Wavefront.from_amp_and_phase(amp, opd, wvl, dx).focus_dft(plan)
        return E.intensity.data

    measure = jax.jit(lambda c, plan: forward(c * 0.5, plan))

    # the axon relay has transient windows where compiles return
    # UNIMPLEMENTED; retry with backoff before giving up
    last_err = None
    for attempt in range(2):
        try:
            I_meas = measure(coefs, plan)
            jax.block_until_ready(I_meas)
            break
        except Exception as e:  # pragma: no cover - backend flake path
            last_err = e
            time.sleep(15)
    else:
        raise last_err

    def loss_fn(c, plan, I_meas):
        I = forward(c, plan)
        return jnp.sum((I - I_meas) ** 2)

    step = jax.jit(jax.value_and_grad(loss_fn))

    # warmup / compile -- but do NOT fetch anything yet: a single
    # device->host read permanently disables the axon relay's execution
    # pipelining (dispatches drop from ~30 us to ~1.4 ms round trips)
    l, g = step(coefs, plan, I_meas)
    jax.block_until_ready((l, g))

    n = 100
    best = float('inf')
    for round_ in range(8):
        t0 = time.time()
        for _ in range(n):
            l, g = step(coefs, plan, I_meas)
        jax.block_until_ready((l, g))
        best = min(best, (time.time() - t0) / n)
        if round_ >= 3 and best < 1e-4:
            break  # already at device speed; don't burn relay time
        time.sleep(1)  # relay throughput varies; sample distinct states
    steps_per_s = 1.0 / best

    # validate AFTER timing: fetch the last outputs to prove the program
    # really executed (the relay can fail asynchronously and still
    # "complete" under block_until_ready)
    lval = float(l)
    gval = np.asarray(g)
    if not (np.isfinite(lval) and lval > 0 and np.all(np.isfinite(gval))
            and np.abs(gval).max() > 0):
        raise RuntimeError(
            f'benchmark step produced invalid values: loss={lval}, grad={gval}')

    try:
        with open('BASELINE_MEASURED.json') as f:
            base = json.load(f)['reference_steps_per_s']
    except Exception:
        base = None
    vs = steps_per_s / base if base else None

    print(json.dumps({
        'metric': 'phase_retrieval_grad_steps_per_s_1024sq',
        'value': round(steps_per_s, 2),
        'unit': 'steps/s/chip (fwd+bwd)',
        'vs_baseline': round(vs, 2) if vs is not None else None,
    }))


def _run_with_process_retries(attempts=4):
    """Re-exec the benchmark in child processes until one succeeds.

    The axon TPU relay sporadically hands a process a backend instance
    whose compiles return UNIMPLEMENTED; the condition is per-process, so
    retrying in a fresh process (with a cooldown) rides it out.
    """
    for attempt in range(attempts):
        env = dict(os.environ, PRYSM_TPU_BENCH_CHILD='1')
        try:
            proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                                  env=env, capture_output=True, text=True,
                                  timeout=240)
        except subprocess.TimeoutExpired:
            sys.stderr.write(f'bench child attempt {attempt} hung; retrying\n')
            time.sleep(30)
            continue
        out = proc.stdout.strip().splitlines()
        if proc.returncode == 0 and out:
            print(out[-1])
            return 0
        sys.stderr.write(proc.stderr[-2000:] + '\n')
        time.sleep(30 * (attempt + 1))
    return 1


if __name__ == '__main__':
    if os.environ.get('PRYSM_TPU_BENCH_CHILD'):
        main()
    else:
        sys.exit(_run_with_process_retries())
