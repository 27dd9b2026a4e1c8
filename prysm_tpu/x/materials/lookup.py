"""Material lookup helpers (MIRROR sentinel, air/vacuum, glass names).

Rebuild of ``prysm/x/materials/lookup.py``.
"""
from .core import ConstantMaterial

MIRROR = '__MIRROR__'

_DEFAULT_CATALOG = None

air = ConstantMaterial(1.0, name='air')
vacuum = ConstantMaterial(1.0, name='vacuum')


def _default_catalog():
    """Module-cached refractiveindex.info catalog (downloads once)."""
    global _DEFAULT_CATALOG
    if _DEFAULT_CATALOG is None:
        from .rii import RefractiveIndexCatalog
        _DEFAULT_CATALOG = RefractiveIndexCatalog.from_database()
    return _DEFAULT_CATALOG


def glass(name, database=None, **qualifiers):
    """Resolve a glass name through a catalog or the default database."""
    if database is None:
        database = _default_catalog()
    if hasattr(database, 'material_for_name'):
        return database.material_for_name(name, **qualifiers)
    raise TypeError(
        'database must be a material catalog exposing material_for_name(name)')


def resolve_index(spec, name_resolver=None):
    """Resolve any index spec to a callable n(wvl), MIRROR, air, or None.

    Strings 'MIRROR', 'AIR', 'VACUUM' are special; other strings route
    through name_resolver; numbers become constant callables.
    """
    if spec is None:
        return None
    if spec is MIRROR:
        return MIRROR
    if isinstance(spec, str):
        key = spec.strip().upper()
        if spec == MIRROR or key == 'MIRROR':
            return MIRROR
        if not key or key in ('AIR', 'VACUUM'):
            return air
        if name_resolver is None:
            raise TypeError(
                f'cannot resolve glass name {spec!r} without a catalog')
        return name_resolver(spec)
    if callable(spec):
        return spec
    value = spec
    return lambda wvl: value


def lookup(name, database=None, **qualifiers):
    """Resolve a glass token to a material, air, or the MIRROR sentinel."""
    resolved = resolve_index(
        name,
        name_resolver=lambda token: glass(token, database=database,
                                          **qualifiers))
    return air if resolved is None else resolved
