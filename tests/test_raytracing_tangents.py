"""Forward-mode tangent engine: FD cross-checks for every entry point.

Covers the rebuild of prysm/x/raytracing/_diff_raytrace.py —
raytrace_with_tangents with design seeds, wavefront_with_tangents
(reference-sphere couplings carried by AD), the paraxial tangent
family, the launch-recipe tangents, and the per-primitive d_* wrappers.
"""
import numpy as onp
import pytest

import jax.numpy as jnp

from prysm_tpu.x import raytracing as rt
from prysm_tpu.x.raytracing import adjoint as adj
from prysm_tpu.x.raytracing import _diff_raytrace as dr
from prysm_tpu.x.raytracing.analysis import _wavefront_from_trace
from prysm_tpu.x.raytracing.paraxial import (
    system_matrix,
    entrance_pupil_z,
    ynu_first_order,
)
import prysm_tpu.x.materials as mat

WVL = 0.5876


def _singlet(c1=1 / 62.0):
    bk7 = mat.model_glass(1.5168, 64.17, name='BK7')
    lens = rt.LensData()
    lens.add(rt.Sphere(c1), thickness=6.0, material=bk7)
    lens.add(rt.Sphere(-1 / 128.0), thickness=81.7, material=mat.air)
    return lens


@pytest.fixture(scope='module')
def singlet_offaxis():
    lens = _singlet()
    sys_ = rt.OpticalSystem(lens, aperture=20.0,
                            fields=[rt.Field(0, 0), rt.Field(0, 2)],
                            wavelengths=[WVL], stop_index=1)
    P, S = rt.launch(sys_, sys_.field(1), WVL, rt.Sampling.hex(4))
    return sys_, onp.asarray(P), onp.asarray(S)


SEEDS_AND_STEPS = [
    (lambda: adj.seed_curvature(1, name='c1'), 1e-7),
    (lambda: adj.seed_decenter(1, 'y', name='dy1'), 1e-6),
    (lambda: adj.seed_tilt(1, 'x', name='tx1'), 1e-7),
    (lambda: adj.seed_despace([(2, 1.0), (3, 1.0)], name='t1'), 1e-6),
    (lambda: adj.seed_index(1, name='n1'), 1e-7),
    (lambda: adj.seed_irregularity(1, 4, 0, 11.0, name='z4'), 1e-7),
]


def test_wavefront_with_tangents_matches_fd(singlet_offaxis):
    """AD wavefront-derivative maps match central differences of the
    host closing for every seed kind, including the reference-sphere
    center/curvature couplings the reference derives by hand."""
    sys_, P, S = singlet_offaxis
    surfs = sys_.lens.to_surfaces()
    seeds = [mk() for mk, _ in SEEDS_AND_STEPS]
    steps = [h for _, h in SEEDS_AND_STEPS]
    opd, x_pupil, y_pupil, dW = dr.wavefront_with_tangents(
        surfs, P, S, WVL, seeds)
    assert dW.shape == (opd.shape[0], len(seeds))
    assert x_pupil.shape == opd.shape

    def opd_eps(seed, e):
        ss = adj.apply_seeds(surfs, [seed], jnp.array([e]))
        w, _, _, _ = _wavefront_from_trace(
            ss, P, WVL, rt.raytrace(ss, P, S, WVL))
        return onp.asarray(w)

    for k, (seed, h) in enumerate(zip(seeds, steps)):
        fd = (opd_eps(seed, h) - opd_eps(seed, -h)) / (2.0 * h)
        scale = max(float(onp.abs(fd).max()), 1e-9)
        err = float(onp.abs(dW[:, k] - fd).max()) / scale
        assert err < 5e-4, (seed.name, err)

    # nominal OPD equals the host closing, chief-zeroed
    w0 = opd_eps(adj.seed_curvature(1), 0.0)
    assert onp.allclose(opd, w0, atol=1e-11)
    chief = int(onp.argmin(x_pupil ** 2 + y_pupil ** 2))
    assert opd[chief] == pytest.approx(0.0, abs=1e-12)


def test_wavefront_with_tangents_waves_and_fixed_xp(singlet_offaxis):
    sys_, P, S = singlet_offaxis
    surfs = sys_.lens.to_surfaces()
    seeds = [adj.seed_curvature(1, name='c1')]
    opd_l, _, _, dW_l = dr.wavefront_with_tangents(surfs, P, S, WVL, seeds)
    opd_w, _, _, dW_w = dr.wavefront_with_tangents(
        surfs, P, S, WVL, seeds, output='waves')
    scale = -1.0 / (WVL * 1e-3)
    assert onp.allclose(opd_w, opd_l * scale)
    assert onp.allclose(dW_w, dW_l * scale)
    # anchoring the sphere on a fixed exit pupil drops the xp motion term
    opd_f, _, _, dW_f = dr.wavefront_with_tangents(
        surfs, P, S, WVL, seeds, P_xp=onp.array([0.0, 0.0, 80.0]))
    assert opd_f.shape == opd_l.shape
    assert not onp.allclose(dW_f, dW_l)
    with pytest.raises(ValueError, match='mutually exclusive'):
        dr.wavefront_with_tangents(
            surfs, P, S, WVL, seeds, P_xp=onp.zeros(3),
            reference_curvature=0.01)


def test_raytrace_with_tangents_design_seeds(singlet_offaxis):
    """Design-seed trace tangents (positions, directions, and OPL
    segments) match central differences; histories keep the reference's
    trailing parameter axis layout."""
    sys_, P, S = singlet_offaxis
    surfs = sys_.lens.to_surfaces()
    seeds = [mk() for mk, _ in SEEDS_AND_STEPS[:4]]
    steps = [h for _, h in SEEDS_AND_STEPS[:4]]
    res = dr.raytrace_with_tangents(surfs, P, S, WVL, seeds)
    n_hist = onp.asarray(res.trace.P).shape[0]
    assert res.Pdot.shape == (n_hist, P.shape[0], 3, 4)
    assert res.Ldot.shape[-1] == 4
    assert res.n_params == 4

    def probe(seed, e):
        ss = adj.apply_seeds(surfs, [seed], jnp.array([e]))
        r = rt.raytrace(ss, P, S, WVL)
        return (onp.asarray(r.P)[-1], onp.asarray(r.S)[-1],
                onp.asarray(r.OPL).sum(axis=0))

    for k, (seed, h) in enumerate(zip(seeds, steps)):
        Pp, Sp, Lp = probe(seed, h)
        Pm, Sm, Lm = probe(seed, -h)
        for got, fd in ((res.Pdot[-1][..., k], (Pp - Pm) / (2 * h)),
                        (res.Sdot[-1][..., k], (Sp - Sm) / (2 * h)),
                        (res.Ldot.sum(axis=0)[..., k], (Lp - Lm) / (2 * h))):
            scale = max(float(onp.abs(fd).max()), 1e-9)
            assert float(onp.abs(got - fd).max()) / scale < 5e-5, seed.name


def test_raytrace_with_tangents_launch_seeds_still_work(singlet_offaxis):
    """Bare launch seeds (the parabasal path) coexist with design seeds."""
    sys_, P, S = singlet_offaxis
    surfs = sys_.lens.to_surfaces()
    seeds = [dr.DiffSeed('dx'), adj.seed_curvature(1, name='c1')]
    Pdot0 = onp.zeros(P.shape + (2,))
    Pdot0[:, 0, 0] = 1.0  # column 0: launch-x tangent
    res = dr.raytrace_with_tangents(surfs, P, S, WVL, seeds, Pdot0=Pdot0)
    # column 0 vs FD on the launch position
    h = 1e-6
    shift = onp.zeros_like(P)
    shift[:, 0] = h
    rp = onp.asarray(rt.raytrace(surfs, P + shift, S, WVL).P)[-1]
    rm = onp.asarray(rt.raytrace(surfs, P - shift, S, WVL).P)[-1]
    fd = (rp - rm) / (2 * h)
    assert onp.allclose(res.Pdot[-1][..., 0], fd, atol=1e-7)
    # column 1 is the same curvature tangent as a design-only call
    res_c = dr.raytrace_with_tangents(surfs, P, S, WVL,
                                      [adj.seed_curvature(1)])
    assert onp.allclose(res.Pdot[-1][..., 1], res_c.Pdot[-1][..., 0])


PARAXIAL_SEEDS = [
    lambda: adj.seed_curvature(1, name='c1'),
    lambda: adj.seed_despace([(2, 1.0), (3, 1.0)], name='t1'),
    lambda: adj.seed_index(1, name='n1'),
]


def test_paraxial_tangents_match_fd(singlet_offaxis):
    sys_, _, _ = singlet_offaxis
    surfs = sys_.lens.to_surfaces()
    seeds = [mk() for mk in PARAXIAL_SEEDS]
    M, n_img, Mdot, n_img_dot = dr.paraxial_system_matrix_tangents(
        surfs, WVL, seeds)
    M0, n0 = system_matrix(surfs, WVL)
    assert onp.allclose(M, onp.asarray(M0))
    assert n_img == pytest.approx(float(n0))

    h = 1e-6
    for k, seed in enumerate(seeds):
        sp = adj.apply_seeds(surfs, [seed], jnp.array([h]))
        sm = adj.apply_seeds(surfs, [seed], jnp.array([-h]))
        fd_M = (onp.asarray(system_matrix(sp, WVL)[0])
                - onp.asarray(system_matrix(sm, WVL)[0])) / (2 * h)
        assert onp.abs(Mdot[..., k] - fd_M).max() < 1e-6, seed.name
        fd_ep = (entrance_pupil_z(sp, WVL, stop_index=1)
                 - entrance_pupil_z(sm, WVL, stop_index=1)) / (2 * h)
        fd_xp = (ynu_first_order(sp, WVL, stop_index=1).xp_z
                 - ynu_first_order(sm, WVL, stop_index=1).xp_z) / (2 * h)
        ez = dr.paraxial_entrance_pupil_z_tangents(surfs, WVL, seeds,
                                                   stop_index=1)
        xz = dr.paraxial_exit_pupil_z_tangents(surfs, WVL, seeds,
                                               stop_index=1)
        assert ez[k] == pytest.approx(fd_ep, abs=1e-6)
        assert xz[k] == pytest.approx(fd_xp, abs=1e-6)


def test_paraxial_tangents_eligibility_gates(singlet_offaxis):
    """Transverse pose motion and sag terms fall back to None, like
    the reference; stop_index=None yields zeros."""
    sys_, _, _ = singlet_offaxis
    surfs = sys_.lens.to_surfaces()
    assert dr.paraxial_system_matrix_tangents(
        surfs, WVL, [adj.seed_decenter(1, 'y')]) is None
    assert dr.paraxial_system_matrix_tangents(
        surfs, WVL, [adj.seed_irregularity(1, 4, 0, 11.0)]) is None
    z = dr.paraxial_entrance_pupil_z_tangents(
        surfs, WVL, [adj.seed_curvature(1)], stop_index=None)
    assert onp.all(z == 0.0) and z.shape == (1,)


def test_paraxial_launch_tangents_fd():
    """Launch tangents for an NA_IMAGE aperture (pupil extent moves
    with the power) match FD of the actual launch over a rebuilt lens."""
    sampling = rt.Sampling.hex(3)
    field = rt.Field(0, 2)

    def build(c1):
        lens = _singlet(c1)
        return rt.OpticalSystem(
            lens, aperture=rt.ApertureSpec.na(0.08),
            fields=[rt.Field(0, 0), field],
            wavelengths=[WVL], stop_index=1)

    c0 = 1 / 62.0
    sys_ = build(c0)
    seeds = [adj.seed_curvature(1, name='c1')]
    out = dr.paraxial_launch_tangents(sys_, field, WVL, sampling, seeds)
    assert out is not None
    Pdot0, Sdot0 = out
    h = 1e-7
    Pp, Sp = rt.launch(build(c0 + h), field, WVL, sampling)
    Pm, Sm = rt.launch(build(c0 - h), field, WVL, sampling)
    fd_P = (onp.asarray(Pp) - onp.asarray(Pm)) / (2 * h)
    fd_S = (onp.asarray(Sp) - onp.asarray(Sm)) / (2 * h)
    assert onp.abs(Pdot0[..., 0] - fd_P).max() < 1e-4
    assert onp.abs(Sdot0[..., 0] - fd_S).max() < 1e-6
    # angle fields have fixed directions; EPD apertures fixed extents
    sys_epd = rt.OpticalSystem(_singlet(c0), aperture=20.0,
                               fields=[rt.Field(0, 0), field],
                               wavelengths=[WVL], stop_index=1)
    out2 = dr.paraxial_launch_tangents(sys_epd, field, WVL, sampling, seeds)
    assert out2 is not None
    assert onp.all(out2[1] == 0.0)
    # ineligible: transverse seed
    assert dr.paraxial_launch_tangents(
        sys_epd, field, WVL, sampling, [adj.seed_decenter(1, 'y')]) is None


def test_image_index_tangents():
    lens = _singlet()
    surfs = lens.to_surfaces()
    # index seed on the final refractive transition reaches image space
    j_img = max(i for i, s in enumerate(surfs)
                if getattr(s, 'typ', None) == dr.STYPE_REFRACT)
    seeds = [adj.seed_index(j_img, name='n_img'),
             adj.seed_index(1, name='n_interior'),
             adj.seed_curvature(1, name='c1')]
    out = dr.image_index_tangents(surfs, seeds)
    assert out[0] == 1.0 and out[1] == 0.0 and out[2] == 0.0


def test_d_primitive_wrappers(singlet_offaxis):
    """Per-primitive jvp wrappers: shapes and FD agreement."""
    rng = onp.random.default_rng(7)
    N, npar = 5, 2
    S = rng.normal(size=(N, 3))
    S /= onp.linalg.norm(S, axis=1, keepdims=True)
    P = rng.normal(size=(N, 3))
    Pdot = rng.normal(size=(N, 3, npar))
    Sdot = rng.normal(size=(N, 3, npar))
    Q = rng.normal(size=3)
    Qdot = rng.normal(size=(3, npar))

    # transform local/global round trip: tangents invert
    Pl, Sl, Pldot, Sldot = dr.d_transform_local(
        P, S, Q, None, Pdot, Sdot, Qdot, None)
    Pg, Sg, Pgdot, Sgdot = dr.d_transform_global(
        Pl, Sl, Q, None, Pldot, Sldot, Qdot, None)
    assert onp.allclose(Pg, P) and onp.allclose(Pgdot, Pdot, atol=1e-12)
    assert onp.allclose(Sgdot, Sdot, atol=1e-12)

    # reflect: FD in a random tangent direction
    n_hat = rng.normal(size=(N, 3))
    n_hat /= onp.linalg.norm(n_hat, axis=1, keepdims=True)
    nhdot = rng.normal(size=(N, 3, npar))
    Sp, dSp = dr.d_reflect(S, n_hat, Sdot, nhdot)
    h = 1e-7
    from prysm_tpu.x.raytracing.spencer_and_murty import reflect
    for k in range(npar):
        num = (onp.asarray(reflect(S + h * Sdot[..., k],
                                   n_hat + h * nhdot[..., k]))
               - onp.asarray(reflect(S - h * Sdot[..., k],
                                     n_hat - h * nhdot[..., k]))) / (2 * h)
        assert onp.allclose(dSp[..., k], num, atol=1e-6)

    # refract with index tangents
    ndot = rng.normal(size=npar)
    npostdot = rng.normal(size=npar)
    S_in = onp.array([[0.1, 0.0, 0.995]] * N)
    S_in /= onp.linalg.norm(S_in, axis=1, keepdims=True)
    nh = onp.array([[0.0, 0.0, 1.0]] * N)
    Sp2, dSp2 = dr.d_refract(1.0, 1.5, S_in, nh,
                             Sdot, None, ndot_pre=ndot, ndot_post=npostdot)
    from prysm_tpu.x.raytracing.spencer_and_murty import refract
    for k in range(npar):
        num = (onp.asarray(refract(1.0 + h * ndot[k], 1.5 + h * npostdot[k],
                                   S_in + h * Sdot[..., k], nh))
               - onp.asarray(refract(1.0 - h * ndot[k], 1.5 - h * npostdot[k],
                                     S_in - h * Sdot[..., k], nh))) / (2 * h)
        assert onp.allclose(dSp2[..., k], num, atol=1e-6)

    # d_intersect: spherical sag with a curvature parameter channel
    def sphere_san(x, y, c):
        r2 = x * x + y * y
        z = c * r2 / (1.0 + jnp.sqrt(jnp.maximum(1.0 - c * c * r2, 0.0)))
        denom = jnp.sqrt(jnp.maximum(1.0 - c * c * r2, 1e-14))
        dzdx = c * x / denom
        dzdy = c * y / denom
        nvec = jnp.stack([-dzdx, -dzdy, jnp.ones_like(dzdx)], axis=-1)
        return z, nvec / jnp.linalg.norm(nvec, axis=-1, keepdims=True)

    P0 = onp.array([[1.0, 0.5, -5.0], [0.2, -0.3, -5.0]])
    S0 = onp.array([[0.0, 0.0, 1.0], [0.01, 0.0, 0.99995]])
    S0 /= onp.linalg.norm(S0, axis=1, keepdims=True)
    cdot = onp.array([1.0])  # scalar param: tangent axis only
    Qi, nh_i, Qidot, nhidot = dr.d_intersect(
        sphere_san, P0, S0,
        None, None, params=(1 / 62.0,), params_dot=(cdot,))
    from prysm_tpu.x.raytracing.spencer_and_murty import intersect
    hc = 1e-7
    qp = onp.asarray(intersect(
        P0, S0, lambda x, y: sphere_san(x, y, 1 / 62.0 + hc))[0])
    qm = onp.asarray(intersect(
        P0, S0, lambda x, y: sphere_san(x, y, 1 / 62.0 - hc))[0])
    assert onp.allclose(Qidot[..., 0], (qp - qm) / (2 * hc), atol=1e-5)

    # d_opl_segment FD
    seg = rng.normal(size=(N, 3))
    dseg = rng.normal(size=(N, 3, npar))
    dL = dr.d_opl_segment(1.5, ndot, seg, dseg)
    for k in range(npar):
        lp = (1.5 + h * ndot[k]) * onp.linalg.norm(seg + h * dseg[..., k],
                                                   axis=1)
        lm = (1.5 - h * ndot[k]) * onp.linalg.norm(seg - h * dseg[..., k],
                                                   axis=1)
        assert onp.allclose(dL[..., k], (lp - lm) / (2 * h), atol=1e-6)

    # d_closest_point_on_axis + d_eic_closing FD
    Pc = onp.array([0.3, -0.2, 90.0])
    Sc = onp.array([0.02, 0.03, 0.999])
    Sc /= onp.linalg.norm(Sc)
    Pcdot = rng.normal(size=(3, npar))
    Scdot = rng.normal(size=(3, npar))
    xp, xpdot = dr.d_closest_point_on_axis(
        Pc, Sc, Pcdot, Scdot, onp.zeros(3), onp.array([0., 0., 1.]))
    from prysm_tpu.x.raytracing._line_math import closest_point_on_line_to_line
    for k in range(npar):
        xpp = closest_point_on_line_to_line(
            Pc + h * Pcdot[:, k], Sc + h * Scdot[:, k],
            onp.zeros(3), onp.array([0., 0., 1.]))
        xpm = closest_point_on_line_to_line(
            Pc - h * Pcdot[:, k], Sc - h * Scdot[:, k],
            onp.zeros(3), onp.array([0., 0., 1.]))
        assert onp.allclose(xpdot[:, k], (xpp - xpm) / (2 * h), atol=1e-5)


def test_wavefront_with_tangents_composes_with_launch_tangents():
    """Full pipeline: launch-recipe tangents feed the wavefront
    derivative, matching FD over a rebuilt system + relaunch (the
    launch-coordinate coupling the reference carries via res.Pdot[0])."""
    sampling = rt.Sampling.hex(3)
    field = rt.Field(0, 2)

    def build(t):
        bk7 = mat.model_glass(1.5168, 64.17, name='BK7')
        lens = rt.LensData()
        lens.add(rt.Sphere(1 / 62.0), thickness=t, material=bk7)
        lens.add(rt.Sphere(-1 / 128.0), thickness=81.7, material=mat.air)
        return rt.OpticalSystem(lens, aperture=20.0,
                                fields=[rt.Field(0, 0), field],
                                wavelengths=[WVL], stop_index=1)

    t0 = 6.0
    sys_ = build(t0)
    surfs = sys_.lens.to_surfaces()
    # thickness t moves surfaces 2..3 (compiled indices) along +z
    seeds = [adj.seed_despace([(2, 1.0), (3, 1.0)], name='t')]
    P, S = rt.launch(sys_, field, WVL, sampling)
    P = onp.asarray(P)
    S = onp.asarray(S)
    lt = dr.paraxial_launch_tangents(sys_, field, WVL, sampling, seeds)
    assert lt is not None
    opd, _, _, dW = dr.wavefront_with_tangents(
        surfs, P, S, WVL, seeds, Pdot0=lt[0], Sdot0=lt[1])

    def closed(t):
        s2 = build(t)
        P2, S2 = rt.launch(s2, field, WVL, sampling)
        ss = s2.lens.to_surfaces()
        w, _, _, _ = _wavefront_from_trace(
            ss, onp.asarray(P2), WVL,
            rt.raytrace(ss, onp.asarray(P2), onp.asarray(S2), WVL))
        return onp.asarray(w)

    h = 1e-6
    fd = (closed(t0 + h) - closed(t0 - h)) / (2 * h)
    scale = max(float(onp.abs(fd).max()), 1e-9)
    assert float(onp.abs(dW[:, 0] - fd).max()) / scale < 1e-3


def test_adj_primitives_inner_product_identities():
    """<adj_f(bar), tangent> == <bar, d_f(tangent)> for every primitive
    pair — the reverse rules are vjp pullbacks of the same kernels the
    forward d_* wrappers push through, so the identities hold to
    roundoff."""
    from prysm_tpu.x.raytracing.adjoint import primitives as ap

    rng = onp.random.default_rng(3)
    N, npar = 6, 1
    S = rng.normal(size=(N, 3))
    S /= onp.linalg.norm(S, axis=1, keepdims=True)
    n_hat = rng.normal(size=(N, 3))
    n_hat /= onp.linalg.norm(n_hat, axis=1, keepdims=True)
    P = rng.normal(size=(N, 3))
    Q = rng.normal(size=3)
    R = onp.linalg.qr(rng.normal(size=(3, 3)))[0]

    def ip(*pairs):
        return sum(onp.vdot(a, b) for a, b in pairs if a is not None)

    # transform_local
    Pdot = rng.normal(size=(N, 3, npar))
    Sdot = rng.normal(size=(N, 3, npar))
    Qdot = rng.normal(size=(3, npar))
    Rdot = rng.normal(size=(3, 3, npar))
    _, _, Pld, Sld = dr.d_transform_local(P, S, Q, R, Pdot, Sdot, Qdot, Rdot)
    Pl_bar = rng.normal(size=(N, 3))
    Sl_bar = rng.normal(size=(N, 3))
    P_bar, S_bar, Q_bar, R_bar = ap.adj_transform_local(
        P, S, Q, R, Pl_bar, Sl_bar)
    lhs = ip((P_bar, Pdot[..., 0]), (S_bar, Sdot[..., 0]),
             (Q_bar, Qdot[..., 0]), (R_bar, Rdot[..., 0]))
    rhs = ip((Pl_bar, Pld[..., 0]), (Sl_bar, Sld[..., 0]))
    assert lhs == pytest.approx(rhs, rel=1e-10)

    # reflect
    nhdot = rng.normal(size=(N, 3, npar))
    _, dSp = dr.d_reflect(S, n_hat, Sdot, nhdot)
    Sp_bar = rng.normal(size=(N, 3))
    S_bar, nh_bar = ap.adj_reflect(S, n_hat, Sp_bar)
    assert ip((S_bar, Sdot[..., 0]), (nh_bar, nhdot[..., 0])) == \
        pytest.approx(ip((Sp_bar, dSp[..., 0])), rel=1e-10)

    # refract with index channels
    S_in = onp.array([[0.1, 0.05, 0.99]] * N)
    S_in /= onp.linalg.norm(S_in, axis=1, keepdims=True)
    nh = onp.array([[0.0, 0.0, 1.0]] * N)
    ndot = rng.normal(size=npar)
    npostdot = rng.normal(size=npar)
    _, dSp2 = dr.d_refract(1.0, 1.5, S_in, nh, Sdot, nhdot,
                           ndot_pre=ndot, ndot_post=npostdot)
    Sp_bar = rng.normal(size=(N, 3))
    n_bar, np_bar, S_bar, nh_bar = ap.adj_refract(1.0, 1.5, S_in, nh, Sp_bar)
    lhs = (float(n_bar) * ndot[0] + float(np_bar) * npostdot[0]
           + ip((S_bar, Sdot[..., 0]), (nh_bar, nhdot[..., 0])))
    assert lhs == pytest.approx(ip((Sp_bar, dSp2[..., 0])), rel=1e-10)

    # opl segment
    seg = rng.normal(size=(N, 3))
    dseg = rng.normal(size=(N, 3, npar))
    dL = dr.d_opl_segment(1.5, ndot, seg, dseg)
    L_bar = rng.normal(size=N)
    npre_bar, seg_bar = ap.adj_opl_segment(1.5, seg, L_bar)
    lhs = float(npre_bar) * ndot[0] + ip((seg_bar, dseg[..., 0]))
    assert lhs == pytest.approx(ip((L_bar, dL[..., 0])), rel=1e-10)

    # eic closing
    C = onp.array([0.1, -0.2, 90.0])
    kappa = 1 / 85.0
    Pl = P + onp.array([0, 0, 88.0])
    Cdot = rng.normal(size=(3, npar))
    kdot = rng.normal(size=npar)
    sdot = dr.d_eic_closing(Pl, S, Pdot, Sdot, C, Cdot, kappa, kdot)
    s_bar = rng.normal(size=N)
    P_bar, S_bar, C_bar, k_bar = ap.adj_eic_closing(Pl, S, C, kappa, s_bar)
    lhs = (ip((P_bar, Pdot[..., 0]), (S_bar, Sdot[..., 0]),
              (C_bar, Cdot[..., 0])) + float(k_bar) * kdot[0])
    assert lhs == pytest.approx(ip((s_bar, sdot[..., 0])), rel=1e-10)

    # closest point on axis
    Pc = onp.array([0.3, -0.2, 90.0])
    Sc = onp.array([0.02, 0.03, 0.999])
    Sc /= onp.linalg.norm(Sc)
    Pcdot = rng.normal(size=(3, npar))
    Scdot = rng.normal(size=(3, npar))
    _, xpdot = dr.d_closest_point_on_axis(
        Pc, Sc, Pcdot, Scdot, onp.zeros(3), onp.array([0., 0., 1.]))
    xp_bar = rng.normal(size=3)
    P_bar, S_bar = ap.adj_closest_point_on_axis(
        Pc, Sc, onp.zeros(3), onp.array([0., 0., 1.]), xp_bar)
    lhs = ip((P_bar, Pcdot[..., 0]), (S_bar, Scdot[..., 0]))
    assert lhs == pytest.approx(ip((xp_bar, xpdot[..., 0])), rel=1e-10)

    # intersect with a curvature param channel
    def sphere_san(x, y, c):
        r2 = x * x + y * y
        z = c * r2 / (1.0 + jnp.sqrt(jnp.maximum(1.0 - c * c * r2, 0.0)))
        denom = jnp.sqrt(jnp.maximum(1.0 - c * c * r2, 1e-14))
        nvec = jnp.stack([-c * x / denom, -c * y / denom,
                          jnp.ones_like(x)], axis=-1)
        norm = jnp.sqrt(jnp.sum(nvec * nvec, axis=-1, keepdims=True))
        return z, nvec / norm

    P0 = onp.array([[1.0, 0.5, -5.0], [0.2, -0.3, -5.0]])
    S0 = onp.array([[0.0, 0.0, 1.0], [0.01, 0.0, 0.99995]])
    S0 /= onp.linalg.norm(S0, axis=1, keepdims=True)
    cdot = onp.array([1.0])
    P0dot = rng.normal(size=P0.shape + (npar,))
    S0dot = rng.normal(size=S0.shape + (npar,))
    _, _, Qidot, nhidot = dr.d_intersect(
        sphere_san, P0, S0, P0dot, S0dot, params=(1 / 62.0,),
        params_dot=(cdot,))
    Q_bar = rng.normal(size=P0.shape)
    nh_bar = rng.normal(size=P0.shape)
    P0_bar, S0_bar, c_bar = ap.adj_intersect(
        sphere_san, P0, S0, Q_bar, nh_bar, params=(1 / 62.0,))
    lhs = (ip((P0_bar, P0dot[..., 0]), (S0_bar, S0dot[..., 0]))
           + float(c_bar) * cdot[0])
    rhs = ip((Q_bar, Qidot[..., 0]), (nh_bar, nhidot[..., 0]))
    assert lhs == pytest.approx(rhs, rel=1e-8)


def test_wavefront_with_tangents_mixed_design_and_launch_seeds(
        singlet_offaxis):
    """A design seed and a bare launch seed share one seed list: the eps
    axis must stay aligned with the caller's order (launch-only seeds
    become empty design seeds, as in raytrace_with_tangents)."""
    sys_, P, S = singlet_offaxis
    surfs = sys_.lens.to_surfaces()
    n_params = 2
    seeds = [adj.seed_curvature(1, name='c1'), dr.DiffSeed('dx')]
    Pdot0 = onp.zeros(P.shape + (n_params,))
    Pdot0[:, 0, 1] = 1.0  # column 1: rigid +x launch shift
    opd, _, _, dW = dr.wavefront_with_tangents(
        surfs, P, S, WVL, seeds, Pdot0=Pdot0)
    assert dW.shape == (opd.shape[0], n_params)
    assert onp.isfinite(dW).all()
    # each column matches the same seed run alone
    _, _, _, dW_c = dr.wavefront_with_tangents(
        surfs, P, S, WVL, [adj.seed_curvature(1, name='c1')])
    onp.testing.assert_allclose(dW[:, 0], dW_c[:, 0], rtol=1e-12,
                                atol=1e-12)
    _, _, _, dW_l = dr.wavefront_with_tangents(
        surfs, P, S, WVL, [dr.DiffSeed('dx')],
        Pdot0=Pdot0[..., 1:])
    onp.testing.assert_allclose(dW[:, 1], dW_l[:, 0], rtol=1e-12,
                                atol=1e-12)


def test_raytrace_with_tangents_empty_seed_list(singlet_offaxis):
    """Zero seeds returns zero-width tangents without a redundant trace."""
    sys_, P, S = singlet_offaxis
    surfs = sys_.lens.to_surfaces()
    res = dr.raytrace_with_tangents(surfs, P, S, WVL, [])
    assert res.Pdot.shape == onp.asarray(res.trace.P).shape + (0,)
    assert res.Ldot.shape == onp.asarray(res.trace.OPL).shape + (0,)
