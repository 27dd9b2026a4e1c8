"""RitcheyChretien auto design + wavefront differential tests."""
import numpy as onp
import pytest

import jax  # NOQA: F401

from _ref_stubs import install as _install_ref_stubs

_install_ref_stubs()
ref_rt = pytest.importorskip('prysm.x.raytracing')
_install_ref_stubs()  # rebind names imported during package import
ref_mat = pytest.importorskip('prysm.x.materials')
import prysm.x.raytracing.auto as ref_auto  # NOQA: E402
import prysm.x.raytracing.tolerance as ref_tol  # NOQA: E402
import prysm.x.raytracing.wavefront_differential as ref_wd  # NOQA: E402

from prysm_tpu.x import raytracing as rt  # NOQA: E402
import prysm_tpu.x.materials as mat  # NOQA: E402


def test_rc_prescription_matches_reference():
    km = rt.RitcheyChretien(efl=800.0, bfl=180.0, separation=120.0)
    kr = ref_auto.RitcheyChretien(efl=800.0, bfl=180.0, separation=120.0)
    pm = km.prescription()
    pr = kr.prescription()
    for f in ('primary_curvature', 'secondary_curvature', 'primary_conic',
              'secondary_conic'):
        assert getattr(pm, f) == pytest.approx(getattr(pr, f), rel=1e-12), f
    for name in ('primary_focal_length', 'secondary_magnification',
                 'primary_radius', 'secondary_radius',
                 'primary_to_focus'):
        assert getattr(km, name) == pytest.approx(getattr(kr, name),
                                                  rel=1e-12), name


@pytest.mark.parametrize('kwargs', [
    dict(primary_radius=-309.677419, separation=120.0,
         secondary_radius=-86.4),
    dict(efl=800.0, secondary_magnification=5.166667, bfl=180.0),
    dict(bfl=180.0, separation=120.0, primary_focal_length=-154.8387),
])
def test_rc_closure_paths_match_reference(kwargs):
    km = rt.RitcheyChretien(**kwargs)
    kr = ref_auto.RitcheyChretien(**kwargs)
    assert km.complete == kr.complete
    if km.complete:
        assert km.efl == pytest.approx(kr.efl, rel=1e-9)
        assert km.bfl == pytest.approx(kr.bfl, rel=1e-9)
        assert km.separation == pytest.approx(kr.separation, rel=1e-9)


def test_rc_partial_and_branches_match_reference():
    km = rt.RitcheyChretien(efl=800.0, secondary_magnification=-4.0)
    kr = ref_auto.RitcheyChretien(efl=800.0, secondary_magnification=-4.0)
    assert km.unresolved == kr.unresolved
    assert km.degrees_of_freedom == kr.degrees_of_freedom
    with pytest.raises(ValueError):
        km.prescription()
    # the two-branch discrete form
    bm = rt.RitcheyChretien(efl=800.0, primary_to_focus=60.0,
                            secondary_radius=-86.4)
    br = ref_auto.RitcheyChretien(efl=800.0, primary_to_focus=60.0,
                                  secondary_radius=-86.4)
    sols_m = bm.solutions
    sols_r = br.solutions
    assert len(sols_m) == len(sols_r)
    for a, b in zip(sols_m, sols_r):
        assert a.bfl == pytest.approx(b.bfl, rel=1e-9)
        assert a.separation == pytest.approx(b.separation, rel=1e-9)


def test_rc_inconsistent_rejected():
    with pytest.raises(ValueError, match='inconsistent'):
        rt.RitcheyChretien(efl=800.0, bfl=180.0, separation=120.0,
                           secondary_magnification=-3.0)
    with pytest.raises(ValueError, match='finite'):
        rt.RitcheyChretien(efl=float('inf'))


def test_rc_traces_to_spec():
    rc = rt.RitcheyChretien(efl=800.0, bfl=180.0, separation=120.0)
    lens = rc.to_lensdata()
    sys_ = rt.OpticalSystem(lens, aperture=100.0, wavelengths=[0.6328],
                            stop_index=1)
    fop = sys_._ynu_first_order()
    assert abs(fop.efl) == pytest.approx(800.0, rel=1e-10)
    assert fop.bfl == pytest.approx(180.0, rel=1e-10)
    # the RC figure set is coma/SA-corrected on axis
    P, S = rt.launch(sys_, sys_.field(), 0.6328, rt.Sampling.hex(6))
    opd, _, _ = rt.wavefront(sys_, onp.asarray(P), onp.asarray(S), 0.6328,
                             output='waves')
    assert onp.sqrt((opd ** 2).mean()) < 5e-3


def _wd_setup(rt_mod, mat_mod, tol_mod=None):
    bk7 = mat_mod.model_glass(1.5168, 64.17, name='BK7')
    lens = rt_mod.LensData()
    lens.add(rt_mod.Sphere(1 / 62.0), thickness=6.0, material=bk7)
    lens.add(rt_mod.Sphere(-1 / 128.0), thickness=81.7,
             material=mat_mod.air)
    sys_ = rt_mod.OpticalSystem(lens, aperture=20.0, wavelengths=[0.5876],
                                stop_index=1)
    P, S = rt_mod.launch(sys_, sys_.field(), 0.5876,
                         rt_mod.Sampling.hex(4))
    Pcls = tol_mod.Perturbation if tol_mod is not None else \
        rt_mod.Perturbation
    perts = [Pcls.normal(sys_, 'curvature', 1, 1e-5, name='c1'),
             Pcls.normal(sys_, 'thickness', 1, 0.02, name='t1')]
    return sys_, onp.asarray(P), onp.asarray(S), perts


def test_wavefront_differential_matches_reference():
    sys_m, P, S, perts_m = _wd_setup(rt, mat)
    sys_r, _, _, perts_r = _wd_setup(ref_rt, ref_mat, ref_tol)
    wm = rt.wavefront_differential(sys_m, perts_m, P, S, 0.5876)
    wr = ref_wd.wavefront_differential(sys_r, perts_r, P, S, 0.5876)
    assert wm.rms_nominal == pytest.approx(wr.rms_nominal, rel=1e-9)
    # FD maps vs analytic tangents agree to FD accuracy
    onp.testing.assert_allclose(wm.dW, wr.dW, rtol=1e-4, atol=1e-10)
    onp.testing.assert_allclose(wm.sensitivity(), wr.sensitivity(),
                                rtol=1e-4, atol=1e-12)
    assert wm.expected_rms() == pytest.approx(wr.expected_rms(), rel=1e-6)


def test_wavefront_differential_quadratic_vs_direct():
    sys_, P, S, perts = _wd_setup(rt, mat)
    wd = rt.wavefront_differential(sys_, perts, P, S, 0.5876)
    # the quadratic prediction at a small curvature offset matches a
    # direct re-trace of the perturbed system
    dc = 5e-6
    pred = wd.rms_at(0, dc)
    perts[0].set(perts[0].nominal + dc)
    try:
        opd, _, _ = rt.wavefront(sys_, P, S, 0.5876)
        direct = onp.sqrt((opd ** 2).mean())
    finally:
        perts[0].set(perts[0].nominal)
    assert float(pred) == pytest.approx(direct, rel=2e-3)


def test_wavefront_differential_compensated():
    sys_, P, S, perts = _wd_setup(rt, mat)
    comp = [rt.Perturbation.normal(sys_, 'thickness', 2, 0.05,
                                   name='focus')]
    wd = rt.wavefront_differential(sys_, perts, P, S, 0.5876,
                                   compensators=comp)
    assert wd.is_compensated
    assert wd.compensator_motions().shape == (1, 2)
    wd0 = rt.wavefront_differential(sys_, perts, P, S, 0.5876)
    # refocus can only reduce (or hold) the per-tolerance RMS growth
    assert (wd.rms_change_per_tolerance()
            <= wd0.rms_change_per_tolerance() + 1e-12).all()
    # zernike sensitivity runs and has the right shape
    nom, dcoefs = wd.zernike_sensitivity([(2, 0), (4, 0)])
    assert dcoefs.shape == (2, 2)
    # fast MC matches slow MC at small amplitudes
    mc = wd0.fast_monte_carlo(perts, 100, seed=1)
    assert mc.n_trials == 100
    thr, prob = rt.cumulative_probability(mc)
    assert prob[-1] == pytest.approx(1.0)
    with pytest.raises(ValueError):
        wd0.fast_monte_carlo(perts[:1], 10)


def test_wavefront_differential_tangent_vs_fd_methods():
    """The forward-mode tangent maps and the finite-difference maps are
    two independent implementations of the same model; they must agree
    to FD truncation accuracy, compensators included."""
    sys_, P, S, perts = _wd_setup(rt, mat)
    comp = [rt.Perturbation.normal(sys_, 'thickness', 2, 0.05,
                                   name='focus')]
    wt = rt.wavefront_differential(sys_, perts, P, S, 0.5876,
                                   compensators=comp, method='tangent')
    wf = rt.wavefront_differential(sys_, perts, P, S, 0.5876,
                                   compensators=comp, method='fd')
    # atol rides the FD roundoff floor eps * W / h ~ 1e-8
    onp.testing.assert_allclose(wt.dW, wf.dW, rtol=1e-4, atol=5e-8)
    onp.testing.assert_allclose(wt.W0, wf.W0, atol=1e-8)
    onp.testing.assert_allclose(wt.compensator_motions(),
                                wf.compensator_motions(),
                                rtol=1e-4, atol=5e-8)
    with pytest.raises(ValueError, match="method must be"):
        rt.wavefront_differential(sys_, perts, P, S, 0.5876,
                                  method='nope')


def test_wavefront_differential_decenter_tilt_tangent_vs_fd():
    """Pose tolerances (decenter/tilt through a coordinate break) run
    through BOTH map sources: the analytic-ineligible seeds fall back to
    host FD of the ynu walk without tripping the axial-geometry guard,
    and the two engines agree to FD truncation accuracy."""
    bk7 = mat.model_glass(1.5168, 64.17, name='BK7')
    lens = rt.LensData()
    lens.add_coordbreak()
    lens.add(rt.Sphere(1 / 62.0), thickness=6.0, material=bk7)
    lens.add(rt.Sphere(-1 / 128.0), thickness=81.7, material=mat.air)
    sys_ = rt.OpticalSystem(lens, aperture=20.0, wavelengths=[0.5876],
                            stop_index=2)
    P, S = rt.launch(sys_, sys_.field(), 0.5876, rt.Sampling.hex(3))
    P = onp.asarray(P)
    S = onp.asarray(S)
    perts = [rt.Perturbation.normal(sys_, 'decenter', 1, 1e-3, name='dy',
                                    component=1),
             rt.Perturbation.normal(sys_, 'tilt', 1, 1e-4, name='tx',
                                    component=0),
             rt.Perturbation.normal(sys_, 'curvature', 2, 1e-5,
                                    name='c1')]
    wt = rt.wavefront_differential(sys_, perts, P, S, 0.5876,
                                   method='tangent')
    wf = rt.wavefront_differential(sys_, perts, P, S, 0.5876,
                                   method='fd')
    assert onp.isfinite(wt.dW).all()
    onp.testing.assert_allclose(wt.dW, wf.dW, rtol=1e-3, atol=5e-8)
    # the pose columns are live, not silently zeroed
    assert onp.abs(wt.dW[:, 0]).max() > 0.0
    assert onp.abs(wt.dW[:, 1]).max() > 0.0
