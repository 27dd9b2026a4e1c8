"""Coatings parity vs prysm.x.coatings + synthesis behavior tests."""
import numpy as onp
import pytest

ref_c = pytest.importorskip('prysm.x.coatings')

import prysm_tpu.x.coatings as myc  # NOQA: E402


WVL0 = 0.55
NH, NL = 2.35, 1.46
NSUB = 1.52


def _hr_stack(mod, pairs=4, absorbing=False):
    dH = WVL0 / (4 * NH)
    dL = WVL0 / (4 * NL)
    nH = NH + (0.01j if absorbing else 0)
    idx = [nH, NL] * pairs + [nH]
    th = [dH, dL] * pairs + [dH]
    return mod.Stack(idx, th, NSUB)


def test_rt_and_rta_match_reference():
    sm = _hr_stack(myc)
    sr = _hr_stack(ref_c)
    w = onp.linspace(0.4, 0.75, 9)
    for pol in ('s', 'p'):
        for theta in (0.0, 0.35):
            rm, tm = myc.stack_rt(sm, w, theta, pol)
            rr, tr = ref_c.stack_rt(sr, w, theta, pol)
            onp.testing.assert_allclose(onp.asarray(rm), rr, atol=1e-13)
            onp.testing.assert_allclose(onp.asarray(tm), tr, atol=1e-13)
    Rm, Tm, Am = myc.RTA(sm, w, 0.2, 's')
    Rr, Tr, Ar = ref_c.RTA(sr, w, 0.2, 's')
    onp.testing.assert_allclose(onp.asarray(Rm), Rr, atol=1e-13)
    onp.testing.assert_allclose(onp.asarray(Tm), Tr, atol=1e-13)
    onp.testing.assert_allclose(onp.asarray(Am), Ar, atol=1e-13)


def test_energy_conservation_with_absorption():
    sm = _hr_stack(myc, absorbing=True)
    w = onp.linspace(0.45, 0.65, 5)
    R, T, A = myc.RTA(sm, w, 0.1, 'p')
    onp.testing.assert_allclose(
        onp.asarray(R) + onp.asarray(T) + onp.asarray(A).sum(axis=0),
        1.0, atol=1e-12)
    A = onp.asarray(A)
    assert onp.all(A[::2] > 0)            # absorbing H layers
    onp.testing.assert_allclose(A[1::2], 0.0, atol=1e-12)  # lossless L layers


def test_internal_fields_and_depth_match_reference():
    sm = _hr_stack(myc)
    sr = _hr_stack(ref_c)
    Em, Hm = myc.internal_fields(sm, WVL0, 0.1, 'p')
    Er, Hr = ref_c.internal_fields(sr, WVL0, 0.1, 'p')
    onp.testing.assert_allclose(onp.asarray(Em), Er, atol=1e-13)
    onp.testing.assert_allclose(onp.asarray(Hm), Hr, atol=1e-13)
    z = onp.linspace(0.0, float(onp.sum(onp.asarray(sm.thicknesses))), 17)
    Em, Hm = myc.field_at_depth(sm, z, WVL0, 0.1, 'p')
    Er, Hr = ref_c.field_at_depth(sr, z, WVL0, 0.1, 'p')
    onp.testing.assert_allclose(onp.asarray(Em), Er, atol=1e-12)
    with pytest.raises(ValueError):
        myc.field_at_depth(sm, -0.1, WVL0, 0.1, 'p')


def test_gradients_match_reference():
    sm = _hr_stack(myc)
    sr = _hr_stack(ref_c)
    w = onp.linspace(0.4, 0.75, 7)
    for Term_m, Term_r, kw in (
            (myc.Reflectance, ref_c.Reflectance, {}),
            (myc.Transmittance, ref_c.Transmittance, {}),
    ):
        tm = Term_m(wvl=w, target=0.5, weight=2.0, pol='avg', **kw)
        tr = Term_r(wvl=w, target=0.5, weight=2.0, pol='avg', **kw)
        vm, gm = tm.value_and_grad(sm)
        vr, gr = tr.value_and_grad(sr)
        assert vm == pytest.approx(vr, rel=1e-12)
        onp.testing.assert_allclose(onp.asarray(gm), gr, atol=1e-11)
        vm, gm = tm.value_and_grad(sm, grad_fn=myc.index_gradient)
        vr, gr = tr.value_and_grad(sr, grad_fn=ref_c.index_gradient)
        onp.testing.assert_allclose(onp.asarray(gm), gr, atol=1e-11)


def test_field_merit_gradients_match_reference():
    sm = _hr_stack(myc)
    sr = _hr_stack(ref_c)
    w = onp.linspace(0.5, 0.6, 3)
    for args_m, args_r in (
            ((myc.LayerAbsorptance, (2,)), (ref_c.LayerAbsorptance, (2,))),
            ((myc.FieldIntensityAtBoundary, (3,)),
             (ref_c.FieldIntensityAtBoundary, (3,))),
            ((myc.FieldInLayer, (1,)), (ref_c.FieldInLayer, (1,))),
    ):
        (Tm, am), (Tr, ar) = args_m, args_r
        tm = Tm(*am, wvl=w, target=0.1, pol='s')
        tr = Tr(*ar, wvl=w, target=0.1, pol='s')
        vm, gm = tm.value_and_grad(sm)
        vr, gr = tr.value_and_grad(sr)
        assert vm == pytest.approx(vr, rel=1e-10)
        onp.testing.assert_allclose(onp.asarray(gm), gr, atol=1e-10)
    # peak-field term
    tm = myc.PeakFieldAtInterfaces(wvl=w, pol='s', target=0.0)
    tr = ref_c.PeakFieldAtInterfaces(wvl=w, pol='s', target=0.0)
    vm, gm = tm.value_and_grad(sm)
    vr, gr = tr.value_and_grad(sr)
    assert vm == pytest.approx(vr, rel=1e-10)
    onp.testing.assert_allclose(onp.asarray(gm), gr, atol=1e-10)


def test_needle_function_matches_reference():
    sm = _hr_stack(myc, pairs=2)
    sr = _hr_stack(ref_c, pairs=2)
    w = onp.linspace(0.45, 0.65, 6)
    tm = myc.Reflectance(wvl=w, target=1.0)
    tr = ref_c.Reflectance(wvl=w, target=1.0)
    total = float(onp.sum(onp.asarray(sm.thicknesses)))
    z = onp.linspace(0.005, total - 0.005, 40)
    Pm = myc.needle_function(sm, tm, 1.7, z)
    Pr = ref_c.needle_function(sr, tr, 1.7, z)
    onp.testing.assert_allclose(onp.asarray(Pm), Pr, atol=1e-11)


def test_insert_needle_and_cleanup():
    sm = _hr_stack(myc, pairs=1)
    new, idx = myc.insert_needle(sm, 0.07, 1.7, thickness=2e-3,
                                 return_index=True)
    assert len(new) == len(sm) + 2
    assert new.indices[idx] == 1.7
    total_before = float(onp.sum(onp.asarray(sm.thicknesses)))
    total_after = float(onp.sum(onp.asarray(new.thicknesses)))
    assert total_after == pytest.approx(total_before + 2e-3, abs=1e-12)
    # cleanup prunes the thin needle and re-merges the split host layer
    cleaned = myc.cleanup(new, prune_tol=5e-3)
    assert len(cleaned) == len(sm)
    onp.testing.assert_allclose(onp.asarray(cleaned.thicknesses),
                                onp.asarray(sm.thicknesses), atol=1e-12)


def test_refine_single_layer_ar():
    # single-layer AR on glass: optimal thickness is quarter-wave
    n_ar = onp.sqrt(NSUB)
    stack = myc.Stack([n_ar], [0.13], NSUB)
    term = myc.Reflectance(wvl=WVL0, target=0.0)
    result = myc.refine(stack, term, maxiter=100)
    d_qw = WVL0 / (4 * n_ar)
    assert float(result.stack.thicknesses[0]) == pytest.approx(d_qw, rel=2e-2)
    assert result.merit < 1e-6


def test_synthesize_reduces_merit():
    # a thick low-index host gives the needle sweep real room to insert
    w = onp.linspace(0.5, 0.6, 5)
    term = myc.Reflectance(wvl=w, target=1.0)
    stack0 = myc.Stack([NL], [0.8], NSUB)
    m0 = myc.as_merit(term).value(stack0)
    res = myc.synthesize(stack0, term, [NH, NL], max_iters=3, max_layers=12,
                         z_samples=60, refine_kwargs={'maxiter': 30})
    assert res.merit < m0
    assert res.n_layers > 1


def test_monitoring_matches_reference():
    sm = _hr_stack(myc, pairs=2)
    sr = _hr_stack(ref_c, pairs=2)
    dm, sigm = myc.monitoring_trace(sm, 2, 0.51, n_points=100)
    dr, sigr = ref_c.monitoring_trace(sr, 2, 0.51, n_points=100)
    onp.testing.assert_allclose(onp.asarray(sigm), sigr, atol=1e-13)
    lm = myc.cutoff_levels(sm, 0.51)
    lr = ref_c.cutoff_levels(sr, 0.51)
    onp.testing.assert_allclose(lm, lr, atol=1e-13)
    runm = myc.simulate_run(sm, 0.51)
    runr = ref_c.simulate_run(sr, 0.51)
    onp.testing.assert_allclose(onp.asarray(runm.thicknesses),
                                onp.asarray(runr.thicknesses), atol=1e-9)
    tp = myc.turning_points(*myc.monitoring_trace(sm, 0, 0.51, n_points=300,
                                                  max_factor=1.8))
    tpr = ref_c.turning_points(*ref_c.monitoring_trace(sr, 0, 0.51,
                                                       n_points=300,
                                                       max_factor=1.8))
    onp.testing.assert_allclose(tp, tpr, atol=1e-12)


def test_rugate_notch():
    rug = myc.sinusoidal_rugate(1.75, 0.12, 0.6, 20,
                                apodization=myc.quintic_taper(0.25))
    w = onp.linspace(0.5, 0.72, 45)
    R, T, A = myc.RTA(rug, w, 0.0, 's')
    R = onp.asarray(R)
    peak = w[int(onp.argmax(R))]
    assert peak == pytest.approx(0.6, abs=0.02)
    assert R.max() > 0.5
    # off-notch reflectance is low
    off = R[(w < 0.55) | (w > 0.66)]
    assert off.max() < 0.25


def test_rugate_matches_reference():
    rm = myc.sinusoidal_rugate(1.8, 0.1, 0.55, 8)
    rr = ref_c.sinusoidal_rugate(1.8, 0.1, 0.55, 8)
    onp.testing.assert_allclose(onp.asarray(rm.thicknesses),
                                onp.asarray(rr.thicknesses), atol=1e-14)
    onp.testing.assert_allclose(onp.asarray(rm.indices),
                                onp.asarray(rr.indices), atol=1e-14)
