"""Adjoint (reverse-mode) sensitivities: FD cross-checks + linear algebra."""
import numpy as onp
import pytest

import jax  # NOQA: F401
import jax.numpy as jnp

from prysm_tpu.x import raytracing as rt
from prysm_tpu.x.raytracing import adjoint as adj
import prysm_tpu.x.materials as mat


@pytest.fixture(scope='module')
def singlet():
    bk7 = mat.model_glass(1.5168, 64.17, name='BK7')
    lens = rt.LensData()
    lens.add(rt.Sphere(1 / 62.0), thickness=6.0, material=bk7)
    lens.add(rt.Sphere(-1 / 128.0), thickness=81.7, material=mat.air)
    sys_ = rt.OpticalSystem(lens, aperture=20.0,
                            fields=[rt.Field(0, 0), rt.Field(0, 2)],
                            wavelengths=[0.5876], stop_index=1)
    P, S = rt.launch(sys_, sys_.field(1), 0.5876, rt.Sampling.hex(4))
    return sys_, onp.asarray(P), onp.asarray(S)


ALL_SEEDS = [
    (lambda: adj.seed_curvature(1, name='c1'), 1e-7),
    (lambda: adj.seed_conic(1, name='k1'), 1e-5),
    (lambda: adj.seed_decenter(1, 'y', name='dy1'), 1e-5),
    (lambda: adj.seed_tilt(1, 'x', name='tx1'), 1e-6),
    (lambda: adj.seed_despace([(2, 1.0), (3, 1.0)], name='t1'), 1e-5),
    (lambda: adj.seed_index(1, name='n1'), 1e-6),
    (lambda: adj.seed_irregularity(1, 4, 0, 11.0, name='z4'), 1e-6),
]


def _fd(surfs, seed, head, P, S, h):
    vals = []
    for sgn in (+1, -1):
        ss = adj.apply_seeds(surfs, [seed], jnp.array([sgn * h]))
        r = rt.raytrace(ss, P, S, 0.5876)
        vals.append(float(head(r.P, r.S, r.OPL)))
    return (vals[0] - vals[1]) / (2 * h)


def test_adjoint_matches_fd_every_seed_kind(singlet):
    """Reverse-mode gradients agree with central differences for every
    seed vocabulary entry and every built-in head.

    Replaces the reference's hand-written backward sweep
    (prysm/x/raytracing/adjoint/backward_sweep.py) with jax.vjp; the
    conic seed requires a Conic shape, so it is exercised separately.
    """
    sys_, P, S = singlet
    surfs = sys_.lens.to_surfaces()
    seeds = [mk() for mk, _ in ALL_SEEDS if mk().name != 'k1']
    steps = [h for mk, h in ALL_SEEDS if mk().name != 'k1']
    heads = [adj.RmsSpotHead(), adj.BoresightHead(), adj.OplSpreadHead(),
             adj.RayHeightHead(2)]
    res = adj.multi_objective_sensitivity(sys_, P, S, 0.5876, seeds, heads)
    assert res.jacobian.shape == (4, 6)
    for m, head in enumerate(heads):
        for k, (seed, h) in enumerate(zip(seeds, steps)):
            fdv = _fd(surfs, seed, head, P, S, h)
            assert res.jacobian[m, k] == pytest.approx(
                fdv, rel=1e-4, abs=1e-8), (res.head_names[m], seed.name)
    # nominals recorded for every callable head
    assert set(res.nominals) == set(res.head_names)


def test_adjoint_conic_seed():
    bk7 = mat.model_glass(1.5168, 64.17, name='BK7')
    lens = rt.LensData()
    lens.add(rt.Conic(1 / 62.0, -0.5), thickness=6.0, material=bk7)
    lens.add(rt.Conic(-1 / 128.0, 0.0), thickness=81.7, material=mat.air)
    sys_ = rt.OpticalSystem(lens, aperture=20.0, wavelengths=[0.5876],
                            stop_index=1)
    P, S = rt.launch(sys_, sys_.field(), 0.5876, rt.Sampling.hex(4))
    P = onp.asarray(P)
    S = onp.asarray(S)
    seed = adj.seed_conic(1, name='k1')
    head = adj.RmsSpotHead()
    g, val = adj.adjoint_gradient(sys_, P, S, 0.5876, [seed], head)
    fdv = _fd(sys_.lens.to_surfaces(), seed, head, P, S, 1e-5)
    assert g[0] == pytest.approx(fdv, rel=1e-5)
    assert val > 0


def test_adjoint_matches_perturbation_fd(singlet):
    """seed_from_perturbation: adjoint gradient == FD of the editor DOF."""
    sys_, P, S = singlet
    pert = rt.Perturbation.normal(sys_, 'thickness', 1, 0.02, name='t1')
    seed = adj.seed_from_perturbation(pert)
    head = adj.RmsSpotHead()
    g, _ = adj.adjoint_gradient(sys_, P, S, 0.5876, [seed], head)
    # direct FD through the editor (recompiles the layout each side)
    h = 1e-5
    vals = []
    for sgn in (+1, -1):
        pert.set(pert.nominal + sgn * h)
        try:
            r = sys_.trace(P, S, 0.5876)
            vals.append(float(head(jnp.asarray(onp.asarray(r.P)),
                                   jnp.asarray(onp.asarray(r.S)),
                                   jnp.asarray(onp.asarray(r.OPL)))))
        finally:
            pert.set(pert.nominal)
    fdv = (vals[0] - vals[1]) / (2 * h)
    assert g[0] == pytest.approx(fdv, rel=1e-4)


def test_tolerance_linear_algebra():
    J = onp.array([[2.0, 0.0, 1.0],
                   [0.0, 4.0, 0.0]])
    tol = adj.inverse_sensitivity(J, 1e-2)
    onp.testing.assert_allclose(tol, [5e-3, 2.5e-3, 1e-2])
    # zero-sensitivity columns are unconstrained, clipped by steps_max
    J0 = onp.array([[1.0, 0.0]])
    tol0 = adj.inverse_sensitivity(J0, 1.0, steps_max=[10.0, 10.0])
    onp.testing.assert_allclose(tol0, [1.0, 10.0])
    # per-objective budgets
    tolm = adj.multi_objective_budget(J, [1e-2, 4e-2])
    onp.testing.assert_allclose(tolm, [5e-3, 1e-2, 1e-2])
    # RSS
    rss = adj.rss_prediction(J, [1.0, 1.0, 1.0])
    onp.testing.assert_allclose(rss, [onp.sqrt(5.0), 4.0])
    # compensation projects J onto the complement of the compensator space
    rng = onp.random.default_rng(7)
    Jr = rng.standard_normal((4, 6))
    Jc = rng.standard_normal((4, 2))
    Jeff, motions = adj.compensated_jacobian(Jr, Jc)
    assert motions.shape == (2, 6)
    onp.testing.assert_allclose(onp.linalg.pinv(Jc) @ Jeff, 0.0, atol=1e-12)
    tau = rng.standard_normal(6)
    assert (onp.linalg.norm(Jeff @ tau)
            <= onp.linalg.norm(Jr @ tau) + 1e-12)


def test_sensitivity_table_and_result_api(singlet):
    sys_, P, S = singlet
    seeds = [adj.seed_curvature(1, name='c1'),
             adj.seed_decenter(1, 'y', name='dy1')]
    res = adj.multi_objective_sensitivity(sys_, P, S, 0.5876, seeds,
                                          [adj.RmsSpotHead()])
    tab = adj.ToleranceSensitivityTable(res, [1e-6, 1e-3])
    assert tab.sensitivity().shape == (1, 2)
    deg = tab.degradation_at_step()
    onp.testing.assert_allclose(
        deg, res.jacobian * onp.array([1e-6, 1e-3])[None, :])
    names = [n for n, _ in tab.ranked_by('rms_spot')]
    assert set(names) == {'c1', 'dy1'}
    onp.testing.assert_allclose(res.sensitivity_for(0),
                                res.sensitivity_for('rms_spot'))
