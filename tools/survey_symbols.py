"""Sweep SURVEY.md §2's component inventory against the repo namespace.

Extracts every backticked identifier from the inventory tables, strips
``:line`` anchors and ``a/b/c`` slash-lists, and checks each against the
union of the repo's public namespaces (modules + class attributes).

Known non-findings (printed for transparency, not failures):

* prose words and shell commands (``wc``, ``repo``, ``tests``...);
* slash-list stems whose real names resolve (``conic`` from
  ``seed_curvature/conic/...`` -> ``seed_conic``; ``defaults`` ->
  ``set_backend_to_defaults``; ``rs/ts/rp/tp`` -> ``fresnel_rs``...;
  ``circular`` -> ``circular_aperture``; ``power/tiptilt`` ->
  ``Interferogram.remove_power/remove_tiptilt``; ``CHARMS`` ->
  ``CHARMSCoefficientMaterial`` et al.);
* reference-private internals replaced by documented design deltas
  (``SurfaceIntermediate`` -> the vjp adjoint engine, PARITY.md).

Run: python tools/survey_symbols.py   (exit 1 on unexplained misses)
"""
import importlib
import inspect
import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

MODULES = [
    'prysm_tpu', 'prysm_tpu.mathops', 'prysm_tpu.conf', 'prysm_tpu.wavelengths',
    'prysm_tpu.fttools', 'prysm_tpu.coordinates', 'prysm_tpu._richdata',
    'prysm_tpu.geometry', 'prysm_tpu.segmented',
    'prysm_tpu.polynomials', 'prysm_tpu.polynomials.jacobi',
    'prysm_tpu.polynomials.zernike', 'prysm_tpu.polynomials.qpoly',
    'prysm_tpu.polynomials.cheby', 'prysm_tpu.polynomials.dickson',
    'prysm_tpu.polynomials.hermite', 'prysm_tpu.polynomials.legendre',
    'prysm_tpu.polynomials.laguerre', 'prysm_tpu.polynomials.xy',
    'prysm_tpu.polynomials.fitting', 'prysm_tpu.polynomials._clenshaw',
    'prysm_tpu.polynomials._recurrence',
    'prysm_tpu.propagation', 'prysm_tpu.propagation.fft',
    'prysm_tpu.propagation.dft', 'prysm_tpu.propagation.angular_spectrum',
    'prysm_tpu.propagation.coronagraph', 'prysm_tpu.propagation.wavefront',
    'prysm_tpu.otf', 'prysm_tpu.psf', 'prysm_tpu.detector', 'prysm_tpu.bayer',
    'prysm_tpu.degradations', 'prysm_tpu.objects', 'prysm_tpu.thinlens',
    'prysm_tpu.thinfilm', 'prysm_tpu.refractive', 'prysm_tpu.interferogram',
    'prysm_tpu.io', 'prysm_tpu.sample_data', 'prysm_tpu.plotting',
    'prysm_tpu.x.raytracing', 'prysm_tpu.x.raytracing.spencer_and_murty',
    'prysm_tpu.x.raytracing.surfaces', 'prysm_tpu.x.raytracing.lensdata',
    'prysm_tpu.x.raytracing.system', 'prysm_tpu.x.raytracing.launch',
    'prysm_tpu.x.raytracing.raygen', 'prysm_tpu.x.raytracing.paraxial',
    'prysm_tpu.x.raytracing.parabasal', 'prysm_tpu.x.raytracing.aperture',
    'prysm_tpu.x.raytracing.analysis', 'prysm_tpu.x.raytracing.aberrations',
    'prysm_tpu.x.raytracing._diff_raytrace', 'prysm_tpu.x.raytracing.adjoint',
    'prysm_tpu.x.raytracing.adjoint.primitives',
    'prysm_tpu.x.raytracing.adjoint.seeds',
    'prysm_tpu.x.raytracing.adjoint.tolerance_analysis',
    'prysm_tpu.x.raytracing.design', 'prysm_tpu.x.raytracing.opt',
    'prysm_tpu.x.raytracing.tolerance', 'prysm_tpu.x.raytracing.auto',
    'prysm_tpu.x.raytracing.wavefront_differential',
    'prysm_tpu.x.raytracing.io', 'prysm_tpu.x.raytracing.plotting',
    'prysm_tpu.x.optym', 'prysm_tpu.x.optym.optimizers',
    'prysm_tpu.x.optym.lbfgsb', 'prysm_tpu.x.optym.least_squares',
    'prysm_tpu.x.optym.governors', 'prysm_tpu.x.optym.linesearch',
    'prysm_tpu.x.optym.problem', 'prysm_tpu.x.optym.activation',
    'prysm_tpu.x.optym.cost', 'prysm_tpu.x.optym.sample_problems',
    'prysm_tpu.x.optym.operators', 'prysm_tpu.x.optym.plotting',
    'prysm_tpu.x.coatings', 'prysm_tpu.x.materials', 'prysm_tpu.x.dm',
    'prysm_tpu.x.polarization', 'prysm_tpu.x.fibers',
    'prysm_tpu.x.pdi', 'prysm_tpu.x.sri', 'prysm_tpu.x.psi',
    'prysm_tpu.x.shack_hartmann',
]

# prose / shell words in the tables that are not API symbols
PROSE = {
    'a', 'b', 'c', 'd', 'f', 'g', 'h', 'x', 'y', 'A', 'B', 'C', 'N', 'M',
    'W', 'E', 'Ex', 'Ey', 'F', 'and', 'or', 'the', 'via', 'per', 'repo',
    'tests', 'wc', 'prysm', 'cupy', 'torch', 'mlx', 'pytorch', 'mkl_fft',
    'lru', 'NaN', 'DoFs', 'LoC', 'CI', 'h5py', 'scipy', 'numpy', 'ndimage',
    'matplotlib', 'OK', 'NEWTON', 'CLIP', 'MISS', 'TIR', 'EVANESCENT',
    'pjit', 'psum', 'shard_map', 'mathops', 'polynomials', 'optym',
    'coatings', 'materials', 'raytracing', 'Hex', 'axial',
}

# slash-list stems / shorthand -> the real repo name(s) that must resolve
ALIASES = {
    'conic': ['seed_conic'], 'shape_param': ['seed_shape_param'],
    'irregularity': ['seed_irregularity'], 'despace': ['seed_despace'],
    'circular': ['circular_aperture'],
    'defaults': ['set_backend_to_defaults'],
    'rs': ['fresnel_rs'], 'ts': ['fresnel_ts'],
    'rp': ['fresnel_rp'], 'tp': ['fresnel_tp'],
    'mtf': ['mtf_from_psf'], 'ptf': ['ptf_from_psf'],
    'power': ['remove_power'], 'tiptilt': ['remove_tiptilt'],
    'CHARMS': ['CHARMSCoefficientMaterial', 'CHARMSTableMaterial'],
    'TemperatureSellmeier': ['TemperatureSellmeierMaterial'],
    '_amp': ['from_amp_and_phase_adjoint_amp'],
    'keep_intermediates': [],    # asserted as a raytrace kwarg in main()
    # reference-private helper names whose repo twins carry different
    # (public-facing) names or were superseded by documented design deltas
    'SurfaceIntermediate': [],   # PARITY.md: vjp engine replaces the sweep
    '_harmonic_powers': [],      # folded into zernike's harmonic factoring
    '_initialize_alphas': ['clenshaw_alphas_scan'],
    '_clenshaw_sum': ['clenshaw_sum'],
    '_clenshaw_sum_der': ['clenshaw_alphas_scan'],  # j-th-derivative scan
}


def inventory_tokens():
    text = (ROOT / 'SURVEY.md').read_text()
    sec = text[text.index('## 2. Component inventory'):
               text.index('## 3. Call stacks')]
    toks = set()
    for m in re.findall(r'`([^`]+)`', sec):
        for part in re.split(r'[,/\s]+', m):
            part = part.split(':')[0].strip('*')
            if part and '.' not in part and re.fullmatch(r'\w+', part) \
                    and not part[0].isdigit():
                toks.add(part)
    return toks


def repo_names():
    names = set()
    for mn in MODULES:
        mod = importlib.import_module(mn)
        for n in dir(mod):
            names.add(n)
            obj = getattr(mod, n)
            if inspect.isclass(obj):
                names.update(dir(obj))
    return names


def main():
    import jax
    jax.config.update('jax_platforms', 'cpu')
    toks = inventory_tokens()
    names = repo_names()

    from prysm_tpu.x.raytracing.spencer_and_murty import raytrace
    assert 'keep_intermediates' in inspect.signature(raytrace).parameters

    unresolved = []
    for t in sorted(toks):
        if t in names or t in PROSE:
            continue
        alias = ALIASES.get(t)
        if alias is not None:
            bad = [a for a in alias if a not in names]
            if bad:
                unresolved.append(f'{t} (alias {bad} missing)')
            continue
        unresolved.append(t)

    print(f'{len(toks)} inventory tokens checked against '
          f'{len(MODULES)} modules')
    if unresolved:
        print('UNRESOLVED:')
        for t in unresolved:
            print(' -', t)
        return 1
    print('all resolved (directly, by documented alias, or as a '
          'documented design delta)')
    return 0


if __name__ == '__main__':
    sys.exit(main())
