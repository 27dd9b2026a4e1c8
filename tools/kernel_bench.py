#!/usr/bin/env python3
"""Per-kernel microbench: Pallas kernel vs its jnp twin, compiled on-chip.

Backs VERDICT item 2 ("no kernel in ops/ is test-only ... BENCH shows the
dispatch deltas"): measures each dispatchable Pallas kernel against the
stock-XLA path at library shapes and prints one JSON line per pair.

Measurement methodology (load-bearing on the axon relay):
``jax.block_until_ready`` does NOT await execution through the relay --
externally-looped timings measure dispatch rate, not compute.  So each
variant is timed as ONE jitted program chaining K data-dependent
applications, terminated by a scalar whose host fetch forces execution;
per-application time is the slope (T(K2) - T(K1)) / (K2 - K1), which
cancels the constant dispatch+fetch overhead (~25 ms here).

Run on the real TPU:  python tools/kernel_bench.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

K_SHORT, K_LONG = 64, 1024


def slope_time(make_chain, *args, reps=3):
    """Seconds per application via the two-K slope, min over reps.

    K_LONG - K_SHORT is sized so the slope signal (hundreds of kernel
    applications) dwarfs the few-ms run-to-run noise of the ~25 ms
    dispatch+fetch intercept.
    """
    def timed(K):
        fn = make_chain(K)
        out = fn(*args)
        jax.block_until_ready(out)  # compile outside the timed region
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(*args))        # the fetch IS the synchronization
            best = min(best, time.perf_counter() - t0)
        return best
    t1, t2 = timed(K_SHORT), timed(K_LONG)
    return max((t2 - t1) / (K_LONG - K_SHORT), 1e-9)


def bench_czt():
    from prysm_tpu.fttools import fftrange, plan_czt
    from prysm_tpu.ops.czt import czt_pallas
    from prysm_tpu.ops import dispatch

    rows = []
    for N, Q in ((512, 2.0), (1024, 2.0)):
        x = np.asarray(fftrange(N, dtype=np.float64))
        fx = np.asarray(fftrange(N, dtype=np.float64)) * (1.0 / (N * Q))
        plan = plan_czt(x, x, fx, fx)
        rng = np.random.default_rng(7)
        ar = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32))
        ai = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32))
        scale = 1.0 / N

        def chain(apply):
            def make(K):
                @jax.jit
                def run(re, im, p):
                    a = jax.lax.complex(re, im)
                    a = jax.lax.fori_loop(
                        0, K, lambda i, acc: apply(p, acc) * scale, a)
                    return jnp.abs(a).sum()
                return run
            return make

        dispatch.set_pallas_mode('off')
        t_jnp = slope_time(chain(lambda p, a: p(a)), ar, ai, plan)
        dispatch.set_pallas_mode('force')
        t_pl = slope_time(chain(czt_pallas), ar, ai, plan)
        dispatch.set_pallas_mode('auto')
        err = float(jax.jit(
            lambda re, im, p: jnp.max(jnp.abs(
                czt_pallas(p, jax.lax.complex(re, im))
                - p(jax.lax.complex(re, im)))))(ar, ai, plan))
        rows.append({"kernel": "czt", "shape": f"{N}->{N}",
                     "jnp_us": round(t_jnp * 1e6, 2),
                     "pallas_us": round(t_pl * 1e6, 2),
                     "speedup": round(t_jnp / t_pl, 3), "max_err": err})
        print(json.dumps(rows[-1]), flush=True)
    return rows


def bench_raster():
    from prysm_tpu import geometry, coordinates
    from prysm_tpu.ops import raster, dispatch

    rows = []

    def chain2(mask_fn):
        # feed an epsilon of the mask back into the grid so applications
        # stay data-dependent
        def make(K):
            @jax.jit
            def run(xx, yy):
                def body(i, carry):
                    xxk, total = carry
                    m = mask_fn(xxk, yy)
                    return xxk + 1e-12 * m, total + m
                _, total = jax.lax.fori_loop(
                    0, K, body, (xx, jnp.zeros_like(xx)))
                return total.sum()
            return run
        return make

    for N in (512, 1024):
        x, y = coordinates.make_xy_grid(N, diameter=2.0)
        x2, y2 = jnp.broadcast_arrays(jnp.asarray(x), jnp.asarray(y))
        dx = float(2.0 / N)

        cases = {
            "raster_hex6": (
                lambda xx, yy: geometry.antialias(
                    geometry.regular_polygon_sdf(6, 0.8, xx, yy), dx),
                lambda xx, yy: raster.regular_polygon_raster_pallas(
                    6, 0.8, xx, yy, dx)),
            "raster_poly24": (
                lambda xx, yy: geometry.antialias(
                    geometry.regular_polygon_sdf(24, 0.8, xx, yy), dx),
                lambda xx, yy: raster.regular_polygon_raster_pallas(
                    24, 0.8, xx, yy, dx)),
            "raster_telescope": (
                lambda xx, yy: geometry.antialias(
                    geometry.subtract(
                        geometry.subtract(
                            geometry.circle_sdf(0.9, jnp.hypot(xx, yy)),
                            geometry.circle_sdf(0.3, jnp.hypot(xx, yy))),
                        geometry.spider_sdf(4, 0.02, xx, yy, rotation=0.0)),
                    dx),
                lambda xx, yy: raster.telescope_pupil_raster_pallas(
                    xx, yy, dx, outer_radius=0.9, inner_radius=0.3,
                    spider_vanes=4, spider_width=0.02)),
        }
        for name, (jnp_fn, pl_fn) in cases.items():
            t_jnp = slope_time(chain2(jnp_fn), x2, y2)
            dispatch.set_pallas_mode('force')
            t_pl = slope_time(chain2(pl_fn), x2, y2)
            dispatch.set_pallas_mode('auto')
            rows.append({"kernel": name, "shape": f"{N}x{N}",
                         "jnp_us": round(t_jnp * 1e6, 2),
                         "pallas_us": round(t_pl * 1e6, 2),
                         "speedup": round(t_jnp / t_pl, 3)})
            print(json.dumps(rows[-1]), flush=True)
    return rows


def main():
    print(json.dumps({"backend": jax.default_backend(),
                      "device": str(jax.devices()[0])}), flush=True)
    bench_czt()
    bench_raster()


if __name__ == '__main__':
    main()
