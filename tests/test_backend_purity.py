"""Structural purity tests — the rebuild's analogue of the reference's
``tests/test_no_direct_numpy_scipy.py`` AST gate.

The reference bans direct numpy/scipy imports so its backend shim can swap
to CuPy safely.  Here JAX *is* the backend; the equivalent safety
properties are:

1. scipy appears only in host-side solver/IO modules (allow-list below) —
   never on a device compute path;
2. no GPU/accelerator framework (cupy, torch, mlx) is imported anywhere;
3. the hot jitted paths stage out with **no host callbacks** — a callback
   inside jit means a device->host sync per step, the TPU analogue of the
   reference's "direct numpy in the compute path" bug class.
"""
import ast
import pathlib

import pytest

PKG = pathlib.Path(__file__).resolve().parent.parent / 'prysm_tpu'

# modules allowed to import scipy: host-side special functions, splines,
# fitting, and the compiled L-BFGS-B driver (the reference's one native
# exemption, tests/test_no_direct_numpy_scipy.py:43-45 there)
SCIPY_ALLOWED = {
    'x/fibers.py',            # Bessel zeros/evals for the LP mode solve
    'x/psi.py',               # phase unwrap fallback
    'x/materials/tabulated.py',   # spline interpolants over catalog data
    'x/materials/fitted.py',      # dispersion-formula fitting
    'x/raytracing/field.py',      # pupil-grid interpolation
    'x/optym/lbfgsb.py',          # scipy's compiled reverse-comm driver
    'mathops.py',                 # lazy imports inside set_backend_to_numpy
}

BANNED_MODULES = {'cupy', 'torch', 'mlx'}

# the sanctioned backend-swap surface: set_backend_to_{cupy,pytorch,mlx}
# lazily import the foreign framework ONLY inside the function the user
# calls (reference parity, prysm/mathops.py:48-110).  Nothing on a
# compute path may touch them.
FOREIGN_FRAMEWORK_ALLOWED = {'mathops.py'}


def _imports(tree):
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                yield alias.name
        elif isinstance(node, ast.ImportFrom) and node.module:
            yield node.module


def _sources():
    for path in sorted(PKG.rglob('*.py')):
        rel = path.relative_to(PKG).as_posix()
        yield rel, ast.parse(path.read_text())


def test_scipy_only_in_allowed_modules():
    offenders = []
    for rel, tree in _sources():
        for mod in _imports(tree):
            if mod.split('.')[0] == 'scipy' and rel not in SCIPY_ALLOWED:
                offenders.append(rel)
    assert not offenders, (
        f'scipy imported outside the host-side allow-list: {offenders}; '
        'device compute must go through jax')


def test_no_foreign_accelerator_frameworks():
    offenders = []
    for rel, tree in _sources():
        if rel in FOREIGN_FRAMEWORK_ALLOWED:
            # still must be lazy: no foreign import at module top level
            top = {a.name for n in tree.body if isinstance(n, ast.Import)
                   for a in n.names}
            top |= {n.module for n in tree.body
                    if isinstance(n, ast.ImportFrom) and n.module}
            eager = {m for m in top if m.split('.')[0] in BANNED_MODULES}
            assert not eager, f'{rel}: foreign framework imported eagerly: {eager}'
            continue
        for mod in _imports(tree):
            if mod.split('.')[0] in BANNED_MODULES:
                offenders.append((rel, mod))
    assert not offenders, f'foreign array framework imported: {offenders}'


def test_scipy_allowlist_is_tight():
    """Every allow-listed module still imports scipy (prune stale entries)."""
    present = set()
    for rel, tree in _sources():
        if any(m.split('.')[0] == 'scipy' for m in _imports(tree)):
            present.add(rel)
    stale = SCIPY_ALLOWED - present
    assert not stale, f'allow-list entries no longer import scipy: {stale}'


@pytest.fixture(scope='module')
def flagship_jaxpr():
    import jax
    import jax.numpy as jnp
    from prysm_tpu.coordinates import make_xy_grid, cart_to_polar
    from prysm_tpu.geometry import circle_sdf, antialias
    from prysm_tpu.polynomials import zernike_nm_seq, sum_of_2d_modes
    from prysm_tpu.propagation import Wavefront, prepare_executor

    N, fN = 64, 32
    dx = 2.2 / N
    plan = prepare_executor(dx, (N, N), 0.25, fN, 0.55, 10.0)
    nms = [(2, 0), (2, 2)]

    def loss(coefs, plan):
        x, y = make_xy_grid(N, diameter=2.2)
        r, t = cart_to_polar(x, y)
        amp = antialias(circle_sdf(1.0, r), dx)
        opd = sum_of_2d_modes(zernike_nm_seq(nms, r, t), coefs)
        E = Wavefront.from_amp_and_phase(amp, opd, 0.55, dx).focus_dft(plan)
        return jnp.sum(E.intensity.data)

    coefs = jnp.asarray([5.0, -2.0])
    return jax.make_jaxpr(jax.value_and_grad(loss))(coefs, plan)


def test_flagship_step_has_no_host_callbacks(flagship_jaxpr):
    banned = {'pure_callback', 'io_callback', 'debug_callback', 'callback'}

    def scan(jaxpr, seen):
        for eqn in jaxpr.eqns:
            assert eqn.primitive.name not in banned, (
                f'host callback {eqn.primitive.name} inside the flagship '
                'gradient step — this syncs device->host every iteration')
            for sub in eqn.params.values():
                inner = getattr(sub, 'jaxpr', None)
                if inner is not None and id(inner) not in seen:
                    seen.add(id(inner))
                    scan(inner, seen)

    scan(flagship_jaxpr.jaxpr, set())
