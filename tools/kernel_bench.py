#!/usr/bin/env python3
"""Per-kernel microbench: Pallas kernel vs its jnp twin, compiled on-chip.

Backs VERDICT item 2 ("no kernel in ops/ is test-only ... BENCH shows the
dispatch deltas"): measures each dispatchable Pallas kernel against the
stock-XLA path at library shapes and prints one JSON line per pair.

Run on the real TPU:  python tools/kernel_bench.py
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=200, warmup=20):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e6  # us


def bench_czt():
    from prysm_tpu.fttools import fftrange, plan_czt
    from prysm_tpu.ops.czt import czt_pallas
    from prysm_tpu.ops import dispatch

    rows = []
    for N, M, Q in ((512, 512, 2.0), (1024, 1024, 2.0), (256, 512, 4.0)):
        x = np.asarray(fftrange(N, dtype=np.float64))
        fx = np.asarray(fftrange(M, dtype=np.float64)) * (1.0 / (N * Q) * N / M)
        plan = plan_czt(x, x, fx, fx)
        rng = np.random.default_rng(7)
        ary = jnp.asarray(rng.standard_normal((N, N))
                          + 1j * rng.standard_normal((N, N)))

        # pass the plan as a jit ARG (device-resident pytree): closing over
        # it would bake host constants and force a relay-hostile fetch
        jit_jnp = jax.jit(lambda a, p: p(a))
        dispatch.set_pallas_mode('off')  # make sure plan() is the jnp path
        t_jnp = timeit(jit_jnp, ary, plan)
        dispatch.set_pallas_mode('force')
        jit_pl = jax.jit(lambda a, p: czt_pallas(p, a))
        t_pl = timeit(jit_pl, ary, plan)
        dispatch.set_pallas_mode('auto')
        # numerics agreement
        err = float(jnp.max(jnp.abs(jit_pl(ary, plan) - jit_jnp(ary, plan))))
        rows.append({"kernel": "czt", "shape": f"{N}->{M}",
                     "jnp_us": round(t_jnp, 2), "pallas_us": round(t_pl, 2),
                     "speedup": round(t_jnp / t_pl, 3), "max_err": err})
    return rows


def bench_raster():
    from prysm_tpu import geometry, coordinates
    from prysm_tpu.ops import raster, dispatch

    rows = []
    for N in (512, 1024):
        x, y = coordinates.make_xy_grid(N, diameter=2.0)
        x2, y2 = jnp.broadcast_arrays(jnp.asarray(x), jnp.asarray(y))
        r = jnp.hypot(x2, y2)
        dx = float(2.0 / N)

        # hex (regular polygon, 6 edges)
        jnp_hex = jax.jit(lambda xx, yy: geometry.antialias(
            geometry.regular_polygon_sdf(6, 0.8, xx, yy), dx))
        dispatch.set_pallas_mode('force')
        pl_hex = jax.jit(lambda xx, yy: raster.regular_polygon_raster_pallas(
            6, 0.8, xx, yy, dx))
        t_jnp = timeit(jnp_hex, x2, y2)
        t_pl = timeit(pl_hex, x2, y2)
        err = float(jnp.max(jnp.abs(pl_hex(x2, y2) - jnp_hex(x2, y2))))
        rows.append({"kernel": "raster_hex6", "shape": f"{N}x{N}",
                     "jnp_us": round(t_jnp, 2), "pallas_us": round(t_pl, 2),
                     "speedup": round(t_jnp / t_pl, 3), "max_err": err})

        # telescope pupil CSG chain
        def jnp_tel(xx, yy, rr):
            d = geometry.circle_sdf(0.9, rr)
            d = geometry.subtract(d, geometry.circle_sdf(0.3, rr))
            spider = geometry.spider_sdf(4, 0.02, xx, yy, rotation=0.0)
            d = geometry.subtract(d, spider)
            return geometry.antialias(d, dx)

        jnp_tel_j = jax.jit(jnp_tel)
        pl_tel = jax.jit(lambda xx, yy: raster.telescope_pupil_raster_pallas(
            xx, yy, dx, outer_radius=0.9, inner_radius=0.3,
            spider_vanes=4, spider_width=0.02))
        t_jnp = timeit(jnp_tel_j, x2, y2, r)
        t_pl = timeit(pl_tel, x2, y2)
        rows.append({"kernel": "raster_telescope", "shape": f"{N}x{N}",
                     "jnp_us": round(t_jnp, 2), "pallas_us": round(t_pl, 2),
                     "speedup": round(t_jnp / t_pl, 3)})
        dispatch.set_pallas_mode('auto')

        # 24-gon: heavier edge loop
        jnp_poly = jax.jit(lambda xx, yy: geometry.antialias(
            geometry.regular_polygon_sdf(24, 0.8, xx, yy), dx))
        dispatch.set_pallas_mode('force')
        pl_poly = jax.jit(lambda xx, yy: raster.regular_polygon_raster_pallas(
            24, 0.8, xx, yy, dx))
        t_jnp = timeit(jnp_poly, x2, y2)
        t_pl = timeit(pl_poly, x2, y2)
        dispatch.set_pallas_mode('auto')
        rows.append({"kernel": "raster_poly24", "shape": f"{N}x{N}",
                     "jnp_us": round(t_jnp, 2), "pallas_us": round(t_pl, 2),
                     "speedup": round(t_jnp / t_pl, 3)})
    return rows


def main():
    print(json.dumps({"backend": jax.default_backend(),
                      "device": str(jax.devices()[0])}))
    for row in bench_czt() + bench_raster():
        print(json.dumps(row))


if __name__ == '__main__':
    main()
