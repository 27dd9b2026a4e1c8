"""x/ subsystem oracles on the real chip at f32.

Coatings (energy conservation + analytic quarter-wave + thickness
gradient vs finite differences), the deformable mirror (render/adjoint
inner product), and polarization (unitarity of rotations and
retarders).  All computation inside jit; real f32 fetches only.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu


def test_coating_energy_conservation_on_chip():
    """Lossless stack: R + T == 1 across the band, both polarizations."""
    import prysm_tpu.x.coatings as coat
    stack = coat.Stack([1.38, 2.05, 1.38], [0.1, 0.05, 0.1], 1.52)
    wvls = jnp.linspace(0.45, 0.65, 9, dtype=jnp.float32)

    @jax.jit
    def rta(wvls):
        out = []
        for pol in ('s', 'p'):
            R, T, A = coat.RTA(stack, wvls, 0.25, pol)
            out.append((R, T, A))
        return out

    for R, T, A in rta(wvls):
        R = np.asarray(R, dtype=np.float64)
        T = np.asarray(T, dtype=np.float64)
        A = np.asarray(A, dtype=np.float64)
        np.testing.assert_allclose(R + T, 1.0, atol=2e-5)
        assert np.abs(A).max() < 2e-5


def test_coating_quarter_wave_reflectance_on_chip():
    """The x/coatings engine reproduces the single-QW closed form."""
    import prysm_tpu.x.coatings as coat
    n1, ns, wvl = 1.38, 1.52, 0.55
    stack = coat.Stack([n1], [wvl / (4 * n1)], ns)

    @jax.jit
    def R0():
        r, _ = coat.stack_rt(stack, jnp.asarray([wvl], jnp.float32),
                             0.0, 's')
        return jnp.abs(r[0]) ** 2

    R_exact = ((1.0 * ns - n1 ** 2) / (1.0 * ns + n1 ** 2)) ** 2
    assert float(R0()) == pytest.approx(R_exact, abs=1e-5)


def test_coating_thickness_gradient_vs_fd_on_chip():
    """d(R)/d(thickness) by jax.grad matches central differences at f32."""
    import prysm_tpu.x.coatings as coat
    ns, wvl = 1.52, 0.55

    @jax.jit
    def R(th):
        stack = coat.Stack([1.38, 2.05], th, ns)
        r, _ = coat.stack_rt(stack, jnp.asarray([wvl], jnp.float32),
                             0.0, 's')
        return jnp.abs(r[0]) ** 2

    th0 = jnp.asarray([0.10, 0.06], jnp.float32)
    g = np.asarray(jax.jit(jax.grad(R))(th0), dtype=np.float64)
    h = 1e-3
    for i in range(2):
        tp = np.asarray(th0, np.float64).copy(); tp[i] += h
        tm = np.asarray(th0, np.float64).copy(); tm[i] -= h
        fd = (float(R(jnp.asarray(tp, jnp.float32)))
              - float(R(jnp.asarray(tm, jnp.float32)))) / (2 * h)
        assert fd == pytest.approx(g[i], rel=2e-2), i


def test_dm_render_adjoint_vdot_on_chip():
    """<render(a), y> == <a, render_adjoint(y)> for the DM chain."""
    from prysm_tpu.x.dm import DM
    rng = np.random.default_rng(4)
    # smooth gaussian influence function on a 16x16 poke grid
    xx, yy = np.meshgrid(*[np.arange(-48, 48)] * 2)
    ifn = np.exp(-(xx ** 2 + yy ** 2) / (2 * 3.0 ** 2)).astype(np.float32)
    dm = DM(jnp.asarray(ifn), Nout=96, Nact=8, sep=8)
    a = jnp.asarray(rng.normal(size=(8, 8)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(96, 96)).astype(np.float32))

    render = dm.render_fn(wfe=True)

    @jax.jit
    def both(a, y):
        lhs = jnp.sum(render(a) * y)
        # autodiff transpose == the hand-rolled adjoint; vdot with grad
        (abar,) = jax.grad(lambda aa: jnp.sum(render(aa) * y))(a),
        rhs = jnp.sum(a * abar)
        return lhs, rhs

    lhs, rhs = both(a, y)
    assert float(lhs) == pytest.approx(float(rhs), rel=1e-4)


def test_jones_rotation_and_retarder_unitarity_on_chip():
    """Rotations and lossless retarders preserve the Jones norm."""
    from prysm_tpu.x.polarization import (
        jones_rotation_matrix, linear_retarder, linear_pol_vector)

    @jax.jit
    def norms():
        v = linear_pol_vector(30.0)
        R = jones_rotation_matrix(0.7)
        W = linear_retarder(jnp.pi / 2, theta=0.4)
        n0 = jnp.sum(jnp.abs(v) ** 2)
        n1 = jnp.sum(jnp.abs(R @ v) ** 2)
        n2 = jnp.sum(jnp.abs(W @ v) ** 2)
        return n0, n1, n2

    n0, n1, n2 = norms()
    assert float(n1) == pytest.approx(float(n0), rel=1e-5)
    assert float(n2) == pytest.approx(float(n0), rel=1e-5)


def test_half_wave_plate_flips_polarization_on_chip():
    """HWP at 45 deg maps horizontal to vertical polarization."""
    from prysm_tpu.x.polarization import half_wave_plate, linear_pol_vector

    @jax.jit
    def out():
        v = linear_pol_vector(0.0)              # horizontal
        W = half_wave_plate(jnp.pi / 4)         # fast axis at 45 deg
        o = W @ v
        return jnp.abs(o[0]), jnp.abs(o[1])

    ax, ay = out()
    assert float(ax) < 1e-5
    assert float(ay) == pytest.approx(1.0, rel=1e-5)
