#!/usr/bin/env python3
"""Per-kernel microbench: each surviving Pallas kernel vs its jnp twin.

Methodology (load-bearing on the axon relay): ``jax.block_until_ready``
does NOT await execution through the relay, so externally-looped timings
measure dispatch rate.  Each variant therefore runs as ONE jitted
program chaining K data-dependent applications (lax.fori_loop with
epsilon feedback), ended by a scalar whose host fetch forces execution;
per-application time is the slope (T(K2) - T(K1)) / (K2 - K1).

Round-3 verdicts measured with this harness on the real v5e:

* zernike_sum_pallas      WINS  1.44x (512^2) / 1.76x (1024^2)
* expose_pallas (noise)   WINS  229x at 1024^2 (43 us vs 9.9 ms of
                          jax.random threefry + Poisson rejection)
* fused MDFT matmul       LOST  (XLA's plan won through fwd+bwd)  -> deleted
* CZT chirp fusion        LOST  0.95-0.97x                        -> deleted
* SDF rasterizers         LOST  0.32-0.78x                        -> deleted

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
    """Seconds per application via the two-K slope, min over reps."""
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


def bench_zernike():
    from prysm_tpu.coordinates import make_xy_grid, cart_to_polar
    from prysm_tpu.polynomials import zernike_nm_seq, sum_of_2d_modes
    from prysm_tpu.ops.zernike import zernike_sum_pallas
    from prysm_tpu.ops import dispatch

    NMS = [(2, 0), (2, 2), (2, -2), (3, 1), (3, -1), (4, 0)]
    rows = []
    for N in (512, 1024):
        x, y = make_xy_grid(N, diameter=2.2)
        r, t = cart_to_polar(x, y)
        r, t = jnp.asarray(r), jnp.asarray(t)
        c0 = jnp.asarray([5., -3., 2., 1., -1., 0.5], jnp.float32)

        def chain(synth):
            def make(K):
                @jax.jit
                def run(c, r, t):
                    def body(i, ck):
                        z = synth(ck, r, t)
                        return ck + 1e-12 * z.sum() * jnp.ones_like(ck)
                    return jax.lax.fori_loop(0, K, body, c).sum()
                return run
            return make

        dispatch.set_pallas_mode('off')
        t_jnp = slope_time(chain(
            lambda c, r, t: sum_of_2d_modes(zernike_nm_seq(NMS, r, t), c)),
            c0, r, t)
        dispatch.set_pallas_mode('force')
        t_pl = slope_time(chain(
            lambda c, r, t: zernike_sum_pallas(c, NMS, r, t, grads='coefs')),
            c0, r, t)
        dispatch.set_pallas_mode('auto')
        rows.append({"kernel": "zernike_sum", "shape": f"{N}x{N}",
                     "jnp_us": round(t_jnp * 1e6, 2),
                     "pallas_us": round(t_pl * 1e6, 2),
                     "speedup": round(t_jnp / t_pl, 3)})
        print(json.dumps(rows[-1]), flush=True)
    return rows


def bench_noise():
    from prysm_tpu.detector import Detector

    det = Detector(dark_current=2.0, read_noise=5.0, bias=100.0, fwc=60e3,
                   conversion_gain=0.5, bits=14, exposure_time=1e-2)
    img = jnp.full((1024, 1024), 1.0e5, jnp.float32)
    key = jax.random.PRNGKey(0)

    def mk_jnp(K):
        @jax.jit
        def run(im, key):
            def body(i, carry):
                im, key = carry
                key = jax.random.fold_in(key, i)
                # method='random' forces the jax.random twin: since r4,
                # the default 'auto' routes photon-rich TPU scenes to the
                # fused kernel, which made this branch compare pallas to
                # itself (measured 0.91x in r5 before this fix)
                f = det.expose(im, key=key, method='random').astype(im.dtype)
                return im + 1e-12 * f, key
            im2, _ = jax.lax.fori_loop(0, K, body, (im, key))
            return im2.sum()
        return run

    def mk_pl(K):
        @jax.jit
        def run(im, key):
            def body(i, carry):
                im, key = carry
                f = det.expose_fused(im, seed=0).astype(im.dtype)
                return im + 1e-12 * f, key
            im2, _ = jax.lax.fori_loop(0, K, body, (im, key))
            return im2.sum()
        return run

    # the jax.random path is ~10 ms/frame; a shorter chain keeps its
    # timing affordable while the slope still dwarfs the intercept
    global K_SHORT, K_LONG
    ks = (K_SHORT, K_LONG)
    K_SHORT, K_LONG = 8, 64
    t_jnp = slope_time(mk_jnp, img, key)
    K_SHORT, K_LONG = ks
    t_pl = slope_time(mk_pl, img, key)
    row = {"kernel": "detector_expose", "shape": "1024x1024",
           "jnp_us": round(t_jnp * 1e6, 2),
           "pallas_us": round(t_pl * 1e6, 2),
           "speedup": round(t_jnp / t_pl, 3)}
    print(json.dumps(row), flush=True)
    return [row]


def main():
    print(json.dumps({"backend": jax.default_backend(),
                      "device": str(jax.devices()[0])}), flush=True)
    bench_zernike()
    bench_noise()


if __name__ == '__main__':
    main()
