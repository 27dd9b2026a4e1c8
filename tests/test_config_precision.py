"""Precision propagation — the rebuild's twin of the reference's
``tests/config/test_config_precision_propagation.py``.

Flipping ``config.precision`` between 32 and 64 bits must change the dtype
of every allocation in the synthesis -> propagation -> metrics stack; no
op may silently promote back to float64 or demote to float32.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from prysm_tpu.conf import config


@pytest.fixture(params=[32, 64], ids=['f32', 'f64'])
def precision(request):
    config.precision = request.param
    yield jnp.dtype(jnp.float32 if request.param == 32 else jnp.float64)
    config.precision = None     # restore x64-tracking default


def test_grids_and_geometry(precision):
    from prysm_tpu.coordinates import make_xy_grid, cart_to_polar
    from prysm_tpu.geometry import circle_sdf, antialias

    x, y = make_xy_grid(32, diameter=2)
    r, t = cart_to_polar(x, y)
    amp = antialias(circle_sdf(1.0, r), float(x[0, 1] - x[0, 0]))
    for arr in (x, y, r, t, amp):
        assert arr.dtype == precision


def test_polynomials(precision):
    from prysm_tpu.coordinates import make_xy_grid, cart_to_polar
    from prysm_tpu.polynomials import zernike_nm_seq, sum_of_2d_modes, Q2d

    x, y = make_xy_grid(32, diameter=2)
    r, t = cart_to_polar(x, y)
    modes = zernike_nm_seq([(2, 0), (3, 1)], r, t)
    opd = sum_of_2d_modes(modes, jnp.asarray([1.0, 2.0], dtype=precision))
    assert modes.dtype == precision
    assert opd.dtype == precision
    assert Q2d(2, 0, r, t).dtype == precision


def test_wavefront_and_propagation(precision):
    from prysm_tpu.coordinates import make_xy_grid, cart_to_polar
    from prysm_tpu.geometry import circle_sdf, antialias
    from prysm_tpu.propagation import Wavefront, prepare_executor

    cdtype = jnp.dtype(jnp.complex64 if precision == jnp.dtype(jnp.float32)
                       else jnp.complex128)
    N = 32
    x, y = make_xy_grid(N, diameter=2)
    dx = float(x[0, 1] - x[0, 0])
    r, _ = cart_to_polar(x, y)
    amp = antialias(circle_sdf(1.0, r), dx)
    wf = Wavefront.from_amp_and_phase(amp, amp * 10.0, 0.55, dx)
    assert wf.data.dtype == cdtype

    psf = wf.focus(10, Q=2).intensity
    assert psf.data.dtype == precision

    plan = prepare_executor(dx, (N, N), 0.5, 16, 0.55, 10.0)
    focused = wf.focus_dft(plan)
    assert focused.data.dtype == cdtype


def test_executor_plan_leaves(precision):
    from prysm_tpu.fttools import plan_mdft, _host_fftrange

    x = _host_fftrange(16) * 0.1
    f = _host_fftrange(8) * 0.3
    plan = plan_mdft(x, x, f, f)
    assert plan.Ex_re.dtype == precision
    assert plan.Ey_im.dtype == precision


def test_metrics(precision):
    from prysm_tpu.otf import mtf_from_psf

    psf = jnp.ones((16, 16), dtype=precision)
    mtf = mtf_from_psf(psf, 1.0)
    assert mtf.data.dtype == precision


def test_raytrace(precision):
    from prysm_tpu.x.raytracing import Surface, Sphere, Plane, raytrace

    class NK:
        def __init__(self, index):
            self._index = index

        def n(self, wvl):
            return self._index

    surfaces = [
        Surface(shape=Sphere(1 / 50.0), interaction='refract',
                P=[0, 0, 0.0], material=NK(1.5168)),
        Surface(shape=Sphere(-1 / 50.0), interaction='refract',
                P=[0, 0, 4.0], material=NK(1.0)),
        Surface(shape=Plane(), interaction='eval', P=[0, 0, 45.0]),
    ]
    P = np.zeros((4, 3), dtype=np.float64)
    P[:, 0] = np.linspace(-5, 5, 4)
    P[:, 2] = -5.0
    S = np.zeros((4, 3), dtype=np.float64)
    S[:, 2] = 1.0
    result = raytrace(surfaces, P, S, 0.5876)
    assert result.P.dtype == precision
    assert result.S.dtype == precision


def test_matmul_precision_pinned_highest():
    """Importing the library pins matmul precision to 'highest'.

    The TPU MXU's default f32 matmul accumulates at bf16 width: measured
    4.5e-3 relative error on a 512^2 MDFT vs the f64 oracle, vs 5.7e-6
    at 'highest' -- outside every accuracy tier this library promises.
    """
    import jax
    import prysm_tpu  # NOQA: F401 - the import applies the setting
    assert jax.config.jax_default_matmul_precision == 'highest'
    from prysm_tpu.conf import set_matmul_precision
    try:
        set_matmul_precision('default')
        assert jax.config.jax_default_matmul_precision == 'default'
    finally:
        set_matmul_precision('highest')
