"""Seidel / design operands / tolerancing parity vs the reference."""
import sys
import types
import warnings

import numpy as onp
import pytest

import jax  # NOQA: F401

for _name, _attrs in (
        ('prysm.x.raytracing._first_order',
         {'initialize_slots': lambda obj: [setattr(obj, n, None)
                                           for n in type(obj).__slots__],
          'format_first_order': lambda obj, cls, **kw: cls}),
        ('prysm.x.raytracing._surface_map',
         {'SurfaceMap': type('SurfaceMap', (), {})}),
):
    if _name not in sys.modules:
        _m = types.ModuleType(_name)
        for _k, _v in _attrs.items():
            setattr(_m, _k, _v)
        sys.modules[_name] = _m

ref_rt = pytest.importorskip('prysm.x.raytracing')
ref_mat = pytest.importorskip('prysm.x.materials')
import prysm.x.raytracing.design as ref_design  # NOQA: E402
import prysm.x.raytracing.tolerance as ref_tol  # NOQA: E402
import prysm.x.raytracing.aberrations as ref_aber  # NOQA: E402

from prysm_tpu.x import raytracing as rt  # NOQA: E402
from prysm_tpu.x.raytracing.design import _TraceCache  # NOQA: E402
import prysm_tpu.x.materials as mat  # NOQA: E402


def _system(rt_mod, mat_mod):
    bk7 = mat_mod.model_glass(1.5168, 64.17, name='BK7')
    sf5 = mat_mod.model_glass(1.6727, 32.2, name='SF5')
    lens = rt_mod.LensData()
    lens.add(rt_mod.Sphere(1 / 62.0), thickness=6.0, material=bk7)
    lens.add(rt_mod.Sphere(-1 / 45.0), thickness=3.0, material=sf5)
    lens.add(rt_mod.Sphere(-1 / 128.0), thickness=95.6, material=mat_mod.air)
    return rt_mod.OpticalSystem(
        lens, aperture=20.0, fields=[0.0, 2.0],
        wavelengths=[0.4861, 0.5876, 0.6563], reference=1, stop_index=1)


def test_seidel_matches_reference():
    sm = rt.seidel_aberrations(_system(rt, mat))
    sr = ref_aber.seidel_aberrations(_system(ref_rt, ref_mat))
    for name in ('SI', 'SII', 'SIII', 'SIV', 'SV', 'CI', 'CII'):
        onp.testing.assert_allclose(getattr(sm, name), getattr(sr, name),
                                    atol=1e-14, err_msg=name)
    assert sm.optical_invariant == pytest.approx(sr.optical_invariant,
                                                 rel=1e-12)
    wm = sm.wavefront_coefficients()
    wr = sr.wavefront_coefficients()
    for k in wm:
        assert wm[k] == pytest.approx(wr[k], rel=1e-10), k
    tm = sm.transverse_aberrations(image_slope=-0.1)
    tr = sr.transverse_aberrations(image_slope=-0.1)
    for k in tm:
        assert tm[k] == pytest.approx(tr[k], rel=1e-10), k


def test_seidel_asphere_term_matches_reference():
    def build(rt_mod, mat_mod):
        bk7 = mat_mod.model_glass(1.5168, 64.17, name='BK7')
        lens = rt_mod.LensData()
        lens.add(rt_mod.EvenAsphere(1 / 62.0, -0.7, [1e-6]), thickness=6.0,
                 material=bk7)
        lens.add(rt_mod.Sphere(-1 / 128.0), thickness=90.0,
                 material=mat_mod.air)
        return rt_mod.OpticalSystem(lens, aperture=20.0, fields=[0.0, 1.0],
                                    wavelengths=[0.5876], stop_index=1)

    sm = rt.seidel_aberrations(build(rt, mat))
    sr = ref_aber.seidel_aberrations(build(ref_rt, ref_mat))
    onp.testing.assert_allclose(sm.SI, sr.SI, atol=1e-14)
    onp.testing.assert_allclose(sm.SV, sr.SV, atol=1e-14)


def test_operand_values_match_reference():
    mine = _system(rt, mat)
    ref = _system(ref_rt, ref_mat)
    cm = _TraceCache(mine)
    cr = ref_design._TraceCache(ref)
    pairs = [
        (rt.RmsSpotRadius(), ref_design.RmsSpotRadius()),
        (rt.EFL(), ref_design.EFL()),
        (rt.BFL(), ref_design.BFL()),
        (rt.ParaxialImageDistance(), ref_design.ParaxialImageDistance()),
        (rt.TotalTrack(), ref_design.TotalTrack()),
        (rt.Thickness(1), ref_design.Thickness(1)),
        (rt.Boresight(field=mine.field(1)), None),
        (rt.WavefrontRMS(), ref_design.WavefrontRMS()),
    ]
    for om, orf in pairs:
        vm = om(mine, cm)
        if orf is None:
            continue
        if isinstance(orf, ref_design.Boresight):
            orf.field = ref.field(1)
        vr = orf(ref, cr)
        assert vm == pytest.approx(vr, rel=1e-9), type(om).__name__
    # zernike coefficient operand
    zm = rt.ZernikeCoefficient(n=4, m=0, nms_basis=[(2, 0), (4, 0)])
    zr = ref_design.ZernikeCoefficient(n=4, m=0, nms_basis=[(2, 0), (4, 0)])
    assert zm(mine, _TraceCache(mine)) == pytest.approx(
        zr(ref, ref_design._TraceCache(ref)), rel=1e-8)


def test_problem_residuals_and_solve():
    mine = _system(rt, mat)
    mine.solve.image_distance()
    mine.opt.vary('curvature', [1, 3])
    prob = mine.opt.problem('spot', constraints=[rt.EFL(target=100.0)])
    x0 = prob.x0()
    r0 = prob.residuals(x0)
    assert r0.shape[0] == 6  # 2 fields x 3 wavelengths
    m0 = prob.merit(x0)
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        res = prob.solve(maxiter=30)
    assert prob.merit(res.x) < m0
    cache = _TraceCache(mine)
    assert rt.EFL()(mine, cache) == pytest.approx(100.0, abs=1e-6)
    # jacobian is finite and points downhill
    g = prob.jacobian(res.x)
    assert onp.isfinite(g).all()


def test_build_problem_goal_routing():
    mine = _system(rt, mat)
    prob = mine.opt.problem('wavefront')
    assert all(isinstance(op, rt.WavefrontRMS) for op in prob.operands)
    with pytest.raises(ValueError):
        mine.opt.problem('bogus')
    with pytest.raises(ValueError):
        rt.Problem(mine, [], gradient='bad')
    with pytest.raises(TypeError):
        rt.Problem(object(), [])


def test_sensitivity_table_matches_reference():
    mine = _system(rt, mat)
    ref = _system(ref_rt, ref_mat)
    pm = [rt.Perturbation.normal(mine, 'curvature', 1, 1e-5, name='c1'),
          rt.Perturbation.normal(mine, 'thickness', 1, 0.05, name='t1')]
    pr = [ref_tol.Perturbation.normal(ref, 'curvature', 1, 1e-5, name='c1'),
          ref_tol.Perturbation.normal(ref, 'thickness', 1, 0.05, name='t1')]
    mm = rt.operand_as_merit(rt.RmsSpotRadius())
    mr = ref_tol.operand_as_merit(ref_design.RmsSpotRadius())
    tm = rt.sensitivity_table(mine, pm, mm)
    tr = ref_tol.sensitivity_table(ref, pr, mr)
    onp.testing.assert_allclose(tm.sensitivities(), tr.sensitivities(),
                                rtol=1e-6)
    assert tm.merit_nominal == pytest.approx(tr.merit_nominal, rel=1e-10)


def test_monte_carlo_matches_reference():
    mine = _system(rt, mat)
    ref = _system(ref_rt, ref_mat)
    pm = [rt.Perturbation.uniform(mine, 'curvature', 1, 2e-5, name='c1')]
    pr = [ref_tol.Perturbation.uniform(ref, 'curvature', 1, 2e-5,
                                       name='c1')]
    mm = rt.operand_as_merit(rt.RmsSpotRadius())
    mr = ref_tol.operand_as_merit(ref_design.RmsSpotRadius())
    rm = rt.monte_carlo(mine, pm, mm, 20, seed=3, record_samples=True)
    rr = ref_tol.monte_carlo(ref, pr, mr, 20, seed=3, record_samples=True)
    onp.testing.assert_allclose(rm.sampled_x, rr.sampled_x, atol=1e-15)
    onp.testing.assert_allclose(rm.merits, rr.merits, rtol=1e-9)
    # nominals restored
    assert float(mine.to_surfaces()[1].shape.params['c']) == pytest.approx(
        1 / 62.0)


def test_perturbation_distributions_and_errors():
    mine = _system(rt, mat)
    with pytest.raises(ValueError):
        rt.Perturbation.normal(mine, 'curvature', 'all', 1e-5)
    p = rt.Perturbation.triangular(mine, 'thickness', 2, 0.1, name='t2')
    assert p.variance == pytest.approx(0.1 ** 2 / 6.0)
    rng = onp.random.default_rng(0)
    samples = [p.sample(rng) for _ in range(200)]
    assert min(samples) > p.nominal - 0.1
    assert max(samples) < p.nominal + 0.1


def test_problem_auto_gradient_route():
    """gradient='auto' binds residual_jacobian to the adjoint engine and
    converges to the FD solution; the Jacobian matches FD at x0 and stays
    finite where some rays vignette (the reference declines to FD there —
    prysm/x/raytracing/design.py:867; the jax route subsets to the valid
    bundle instead)."""
    import warnings as _w

    def _make():
        s = _system(rt, mat)
        s.solve.image_distance()
        s.opt.vary('curvature', [1, 3])
        return s

    sols = {}
    for mode in ('fd', 'auto'):
        s = _make()
        prob = rt.Problem(
            s,
            [rt.RmsSpotRadius(field=s.field(i), wavelength=w,
                              sampling=rt.Sampling.hex(3))
             for i in (0, 1) for w in (0.4861, 0.5876, 0.6563)],
            constraints=[rt.EFL(target=100.0)], gradient=mode)
        if mode == 'auto':
            assert callable(getattr(prob, 'residual_jacobian', None))
            x0 = prob.x0()
            J = prob.residual_jacobian(x0)
            h = 1e-7
            Jf = onp.zeros_like(J)
            for k in range(x0.size):
                xp = x0.copy()
                xp[k] += h
                fp = prob.residuals(xp)
                xp[k] = x0[k] - h
                fm = prob.residuals(xp)
                Jf[:, k] = (fp - fm) / (2 * h)
            prob.residuals(x0)
            onp.testing.assert_allclose(J, Jf, rtol=1e-4, atol=1e-10)
        else:
            # fd mode: the method exists but declines (DLS then does FD)
            assert prob.residual_jacobian(prob.x0()) is None
        with _w.catch_warnings():
            _w.simplefilter('ignore')
            res = prob.solve(maxiter=30)
        sols[mode] = res.x
    onp.testing.assert_allclose(sols['auto'], sols['fd'], atol=1e-8)

    # finite even when the evaluation point vignettes many rays
    s = _make()
    prob = rt.Problem(
        s, [rt.RmsSpotRadius(field=s.field(1), sampling=rt.Sampling.hex(4))],
        gradient='auto')
    x = prob.x0() + onp.array([4e-3, -3e-3])
    J = prob.residual_jacobian(x)
    assert onp.isfinite(J).all()


def test_wavefront_rms_auto_gradient_matches_fd():
    """WavefrontRMS rows of the auto residual Jacobian come from the
    forward-mode tangent engine (exit-pupil motion included) and must
    match central differences of the operand itself."""
    import warnings as _w

    s = _system(rt, mat)
    s.solve.image_distance()
    s.opt.vary('curvature', [1, 3])
    prob = rt.Problem(
        s,
        [rt.WavefrontRMS(field=s.field(1), wavelength=0.5876,
                         sampling=rt.Sampling.hex(3)),
         rt.RmsSpotRadius(field=s.field(0), wavelength=0.5876,
                          sampling=rt.Sampling.hex(3))],
        gradient='auto')
    x0 = prob.x0()
    with _w.catch_warnings():
        _w.simplefilter('ignore')
        J = prob.residual_jacobian(x0)
        h = 1e-7
        Jf = onp.zeros_like(J)
        for k in range(x0.size):
            xp = x0.copy()
            xp[k] += h
            fp = prob.residuals(xp)
            xp[k] = x0[k] - h
            fm = prob.residuals(xp)
            Jf[:, k] = (fp - fm) / (2 * h)
        prob.residuals(x0)
    onp.testing.assert_allclose(J, Jf, rtol=2e-4, atol=1e-8)


def test_merit_protocol_value_seed():
    """The reference's duck-typed merit protocol: value() evaluates on a
    traced bundle, seed() returns history-shaped cotangents consistent
    with jax.grad, seedable/has_value report capability."""
    s = _system(rt, mat)
    s.solve.image_distance()
    op = rt.RmsSpotRadius(field=s.field(0), wavelength=0.5876,
                          sampling=rt.Sampling.hex(3))
    assert op.seedable and op.has_value
    P, S = rt.launch(s, s.field(0), 0.5876, rt.Sampling.hex(3))
    P, S = onp.asarray(P), onp.asarray(S)
    trace = rt.raytrace(s.lens.to_surfaces(), P, S, 0.5876)
    cache = _TraceCache(s)
    direct = op(s, cache)
    assert op.value(trace, s, 0.5876) == pytest.approx(direct, rel=1e-9)
    P_bar, S_bar, L_bar = op.seed(trace, s, 0.5876)
    assert P_bar.shape == onp.asarray(trace.P).shape
    assert L_bar.shape == onp.asarray(trace.OPL).shape
    assert onp.isfinite(P_bar).all() and onp.abs(P_bar).max() > 0
    assert op.direct_gradient(trace, s, 0.5876, []) is None
    # a bare merit with no head refuses the protocol
    efl = rt.EFL(target=100.0)
    assert not efl.seedable and not efl.has_value
    with pytest.raises(NotImplementedError):
        efl.value(trace, s, 0.5876)
    with pytest.raises(NotImplementedError):
        efl.seed(trace, s, 0.5876)
