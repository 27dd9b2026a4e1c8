"""Fused Zernike mode-synthesis Pallas kernel.

Computes ``OPD = sum_k c_k * Z_k(r, t)`` directly on (r, t) tiles without
materializing the ``(K, N, N)`` mode stack that the jnp path
(``zernike_nm_seq`` + ``sum_of_2d_modes``; reference
prysm/polynomials/zernike.py:74-166 and fitting.py:7-38) writes to and reads
back from HBM.  All recurrences run in VMEM on the VPU:

* radial: the Jacobi three-term recurrence P_n^{(0,|m|)}(2r^2-1) with
  host-precomputed (A, B, C) scalars (reference jacobi.py:16-43), one chain
  per unique |m| (the same dedup plan as the reference's seq evaluator);
* angular: cos/sin(|m| t) by the Chebyshev angle-addition recurrence from a
  single cos/sin evaluation — no per-mode transcendentals;
* r^|m| by host-unrolled binary exponentiation.

The custom VJP is exact for all three arguments: coefficient cotangents are
per-tile inner products <Z_k, g>, and the (r, t) cotangents run the
differentiated Jacobi recurrence (reference jacobi.py:88-146) in a second
kernel.
"""
from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import pallas_interpret
from ..polynomials.jacobi import recurrence_abc
from ..polynomials.zernike import zernike_norm

_TILE = 256
_LANE = 128


def _round_up(n, m):
    return ((n + m - 1) // m) * m


@lru_cache(256)
def _static_plan(nms, norm):
    """Host-side evaluation plan.

    Returns (groups, modes) where groups maps |m| -> max jacobi order and
    modes is a tuple of (idx, am, nj, sign_m, weight) with weight the norm
    factor folded per mode.
    """
    groups = {}
    modes = []
    for idx, (n, m) in enumerate(nms):
        am = abs(m)
        nj = (n - am) // 2
        groups[am] = max(groups.get(am, 0), nj)
        w = zernike_norm(n, m) if norm else 1.0
        modes.append((idx, am, nj, 1 if m >= 0 else -1, float(w)))
    return tuple(sorted(groups.items())), tuple(modes)


def _ipow(base, n):
    """base**n by binary exponentiation (static integer n, VPU muls only)."""
    result = None
    cur = base
    while n:
        if n & 1:
            result = cur if result is None else result * cur
        n >>= 1
        if n:
            cur = cur * cur
    return result


def _angular_tables(tt, max_am):
    """cos(k t), sin(k t) for k=1..max_am via angle-addition recurrence."""
    cos = {}
    sin = {}
    if max_am >= 1:
        cos[1] = jnp.cos(tt)
        sin[1] = jnp.sin(tt)
    for k in range(2, max_am + 1):
        cos[k] = cos[k - 1] * cos[1] - sin[k - 1] * sin[1]
        sin[k] = sin[k - 1] * cos[1] + cos[k - 1] * sin[1]
    return cos, sin


def _jacobi_chain(x, am, nmax, with_der=False):
    """P_0..P_nmax^{(0, am)}(x) (and optionally dP/dx), host-unrolled."""
    ones = jnp.ones_like(x)
    zeros = jnp.zeros_like(x) if with_der else None
    Ps = [ones]
    Ds = [zeros] if with_der else None
    if nmax >= 1:
        A0, B0, C0 = recurrence_abc(0, 0, am)
        # n=0 step of the reference recurrence gives P1 directly
        Ps.append((A0 * x + B0) * ones)
        if with_der:
            Ds.append(A0 * ones)
    for n in range(2, nmax + 1):
        A, B, C = recurrence_abc(n - 1, 0, am)
        lin = A * x + B
        Pn = lin * Ps[n - 1] - C * Ps[n - 2]
        Ps.append(Pn)
        if with_der:
            Ds.append(A * Ps[n - 1] + lin * Ds[n - 1] - C * Ds[n - 2])
    return (Ps, Ds) if with_der else Ps


def _fwd_kernel(plan, coef_ref, r_ref, t_ref, out_ref):
    groups, modes = plan
    rr = r_ref[...]
    tt = t_ref[...]
    x = 2 * (rr * rr) - 1
    max_am = max(am for am, _ in groups)
    cos_t, sin_t = _angular_tables(tt, max_am)
    acc = jnp.zeros_like(rr)
    for am, max_nj in groups:
        Ps = _jacobi_chain(x, am, max_nj)
        r_am = _ipow(rr, am) if am > 0 else None
        for idx, mam, nj, sgn, w in modes:
            if mam != am:
                continue
            term = Ps[nj]
            if am > 0:
                az = cos_t[am] if sgn > 0 else sin_t[am]
                term = term * (r_am * az)
            acc = acc + (coef_ref[0, idx] * w) * term
    out_ref[...] = acc


def _bwd_coefs_kernel(plan, Kp, coef_ref, r_ref, t_ref, g_ref, cg_ref):
    """Coefficient cotangents only: no derivative recurrences, no grid
    cotangent tiles (the ``grads='coefs'`` fast path)."""
    groups, modes = plan
    step = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    rr = r_ref[...]
    tt = t_ref[...]
    g = g_ref[...]
    x = 2 * (rr * rr) - 1
    max_am = max(am for am, _ in groups)
    cos_t, sin_t = _angular_tables(tt, max_am)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, Kp), 1)
    contrib = jnp.zeros((1, Kp), dtype=jnp.float32)
    for am, max_nj in groups:
        Ps = _jacobi_chain(x, am, max_nj)
        r_am = _ipow(rr, am) if am > 0 else None
        for idx, mam, nj, sgn, w in modes:
            if mam != am:
                continue
            Z = Ps[nj]
            if am > 0:
                az = cos_t[am] if sgn > 0 else sin_t[am]
                Z = Z * (r_am * az)
            contrib = contrib + jnp.where(col == idx, jnp.sum(g * Z) * w, 0.0)

    @pl.when(step == 0)
    def _():
        cg_ref[...] = contrib

    @pl.when(step != 0)
    def _():
        cg_ref[...] = cg_ref[...] + contrib


def _bwd_kernel(plan, Kp, coef_ref, r_ref, t_ref, g_ref, cg_ref, gr_ref, gt_ref):
    groups, modes = plan
    step = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    rr = r_ref[...]
    tt = t_ref[...]
    g = g_ref[...]
    x = 2 * (rr * rr) - 1
    max_am = max(am for am, _ in groups)
    cos_t, sin_t = _angular_tables(tt, max_am)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, Kp), 1)
    contrib = jnp.zeros((1, Kp), dtype=jnp.float32)
    gr = jnp.zeros_like(rr)
    gt = jnp.zeros_like(rr)
    for am, max_nj in groups:
        Ps, Ds = _jacobi_chain(x, am, max_nj, with_der=True)
        r_am = _ipow(rr, am) if am > 0 else None
        r_am1 = _ipow(rr, am - 1) if am > 1 else None  # r^(am-1)
        for idx, mam, nj, sgn, w in modes:
            if mam != am:
                continue
            P = Ps[nj]
            dPdr = Ds[nj] * (4 * rr)  # dx/dr = 4r
            if am == 0:
                Z = P
                dZdr = dPdr
                dZdt = None
            else:
                az = cos_t[am] if sgn > 0 else sin_t[am]
                daz = -am * sin_t[am] if sgn > 0 else am * cos_t[am]
                u = r_am
                du = am * r_am1 if am > 1 else am  # d(r^am)/dr
                Z = P * u * az
                dZdr = (P * du + dPdr * u) * az
                dZdt = P * u * daz
            c = coef_ref[0, idx] * w
            contrib = contrib + jnp.where(col == idx, jnp.sum(g * Z) * w, 0.0)
            gr = gr + c * (g * dZdr)
            if dZdt is not None:
                gt = gt + c * (g * dZdt)

    @pl.when(step == 0)
    def _():
        cg_ref[...] = contrib

    @pl.when(step != 0)
    def _():
        cg_ref[...] = cg_ref[...] + contrib

    gr_ref[...] = gr
    gt_ref[...] = gt


def _pad2(arr, shape):
    return jnp.pad(arr, [(0, shape[0] - arr.shape[0]),
                         (0, shape[1] - arr.shape[1])])


@lru_cache(64)
def _make_cv(plan, K, grads='all'):
    """custom_vjp function for a static (plan, n_modes, grads mode)."""

    def _run_fwd(coefs, r, t):
        Ny, Nx = r.shape
        Typ, Txp = _round_up(Ny, _TILE), _round_up(Nx, _TILE)
        rp = _pad2(r, (Typ, Txp)).astype(jnp.float32)
        tp = _pad2(t, (Typ, Txp)).astype(jnp.float32)
        c2 = coefs.astype(jnp.float32).reshape(1, K)
        grid = (Typ // _TILE, Txp // _TILE)
        tile_spec = pl.BlockSpec((_TILE, _TILE), lambda i, j: (i, j),
                                 memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            partial(_fwd_kernel, plan),
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      tile_spec, tile_spec],
            out_specs=tile_spec,
            out_shape=jax.ShapeDtypeStruct((Typ, Txp), jnp.float32),
            interpret=pallas_interpret(),
        )(c2, rp, tp)
        return out[:Ny, :Nx]

    def _run_bwd(coefs, r, t, g):
        Ny, Nx = r.shape
        Typ, Txp = _round_up(Ny, _TILE), _round_up(Nx, _TILE)
        rp = _pad2(r, (Typ, Txp)).astype(jnp.float32)
        tp = _pad2(t, (Typ, Txp)).astype(jnp.float32)
        gp = _pad2(g, (Typ, Txp)).astype(jnp.float32)
        c2 = coefs.astype(jnp.float32).reshape(1, K)
        Kp = _round_up(K, _LANE)
        grid = (Typ // _TILE, Txp // _TILE)
        tile_spec = pl.BlockSpec((_TILE, _TILE), lambda i, j: (i, j),
                                 memory_space=pltpu.VMEM)
        cg_spec = pl.BlockSpec((1, Kp), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM)
        if grads == 'coefs':
            cg = pl.pallas_call(
                partial(_bwd_coefs_kernel, plan, Kp),
                grid=grid,
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                          tile_spec, tile_spec, tile_spec],
                out_specs=cg_spec,
                out_shape=jax.ShapeDtypeStruct((1, Kp), jnp.float32),
                interpret=pallas_interpret(),
            )(c2, rp, tp, gp)
            return cg[0, :K], None, None
        cg, gr, gt = pl.pallas_call(
            partial(_bwd_kernel, plan, Kp),
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      tile_spec, tile_spec, tile_spec],
            out_specs=(cg_spec, tile_spec, tile_spec),
            out_shape=(jax.ShapeDtypeStruct((1, Kp), jnp.float32),
                       jax.ShapeDtypeStruct((Typ, Txp), jnp.float32),
                       jax.ShapeDtypeStruct((Typ, Txp), jnp.float32)),
            interpret=pallas_interpret(),
        )(c2, rp, tp, gp)
        return cg[0, :K], gr[:Ny, :Nx], gt[:Ny, :Nx]

    @jax.custom_vjp
    def f(coefs, r, t):
        return _run_fwd(coefs, r, t)

    def f_fwd(coefs, r, t):
        return _run_fwd(coefs, r, t), (coefs, r, t)

    def f_bwd(res, g):
        coefs, r, t = res
        cg, gr, gt = _run_bwd(coefs, r, t, g)
        if grads == 'coefs':
            return (cg.astype(coefs.dtype), jnp.zeros_like(r),
                    jnp.zeros_like(t))
        return (cg.astype(coefs.dtype), gr.astype(r.dtype),
                gt.astype(t.dtype))

    f.defvjp(f_fwd, f_bwd)
    return f


def zernike_sum_pallas(coefs, nms, r, t, norm=True, grads='all'):
    """Fused ``sum_k coefs[k] * Z_{nms[k]}(r, t)`` on TPU; f32.

    r, t must be 2D (one pupil grid); the output matches their shape.
    grads='all' (default): exact VJPs for coefs, r, and t.
    grads='coefs': the backward kernel computes only the coefficient
    cotangents and declares the grids constants (zero cotangent) --
    ~2x faster backward when r/t are fixed geometry, as in phase
    retrieval.  Do NOT use it if the loss depends on the grids.
    """
    if grads not in ('all', 'coefs'):
        raise ValueError(f"grads must be 'all' or 'coefs', got {grads!r}")
    nms = tuple((int(n), int(m)) for n, m in nms)
    if not nms:
        return jnp.zeros_like(r)
    if r.ndim != 2 or t.ndim != 2:
        raise ValueError('zernike_sum_pallas requires 2D r, t grids')
    plan = _static_plan(nms, bool(norm))
    fn = _make_cv(plan, len(nms), grads)
    return fn(jnp.asarray(coefs), r, t)
