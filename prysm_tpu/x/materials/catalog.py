"""Catalog containers, namespaced lookup, explicit ambiguity handling.

Rebuild of ``prysm/x/materials/catalog.py``.
"""
from .core import MaterialRecord, _normalize_name, _range_contains  # NOQA: F401


class AmbiguousMaterialError(KeyError):
    """A material lookup matched more than one record."""

    def __init__(self, query, candidates):
        self.query = query
        self.candidates = tuple(candidates)
        labels = ', '.join(_record_label(r) for r in self.candidates)
        super().__init__(f'ambiguous material {query!r}; candidates: {labels}')


def _record_label(record):
    parts = []
    if record.catalog:
        parts.append(record.catalog)
    parts.append(record.name)
    if record.variant:
        parts.append(record.variant)
    return ':'.join(parts)


def _matches_name(record, name):
    norm = _normalize_name(name)
    return any(_normalize_name(c) == norm for c in record.names_for_match())


def _record_matches_query(record, query):
    if query is None:
        return True
    norm = _normalize_name(query)
    for candidate in record.names_for_match():
        cnorm = _normalize_name(candidate)
        if norm == cnorm or norm in cnorm:
            return True
    return False


_FILTER_KEYS = {'catalog', 'variant', 'process', 'material_class',
                'wavelength_range_contains', 'temperature_range_contains'}


def _record_matches_filters(record, filters):
    for key in ('catalog', 'variant', 'process'):
        want = filters.get(key)
        if want is not None and _normalize_name(
                getattr(record, key) or '') != _normalize_name(want):
            return False
    mc = filters.get('material_class')
    if mc is not None and record.material_class != mc:
        return False
    wrc = filters.get('wavelength_range_contains')
    if wrc is not None and not _range_contains(record.wavelength_range, wrc):
        return False
    trc = filters.get('temperature_range_contains')
    if trc is not None and not _range_contains(record.temperature_range, trc):
        return False
    for key, value in filters.items():
        if key in _FILTER_KEYS or value is None:
            continue
        if record.metadata.get(key) != value:
            return False
    return True


def _resolve_record(records, name, qualifiers):
    """The one record matching name+qualifiers, or KeyError/Ambiguous."""
    qualifiers = dict(qualifiers)
    catalog = qualifiers.pop('catalog', None)
    if catalog is None:
        catalog = qualifiers.pop('namespace', None)
    matches = [r for r in records
               if _matches_name(r, name)
               and _record_matches_filters(r, {'catalog': catalog, **qualifiers})]
    if not matches:
        raise KeyError(f'no material named {name!r}')
    if len(matches) > 1:
        norm = _normalize_name(name)
        # an exact primary-name hit beats alias hits (LAF3 vs N-LAF3)
        primary = [r for r in matches if _normalize_name(r.name) == norm]
        if len(primary) == 1:
            return primary[0]
        raise AmbiguousMaterialError(name, matches)
    return matches[0]


def _search_records(records, query, filters):
    return [r for r in records
            if _record_matches_query(r, query)
            and _record_matches_filters(r, filters)]


class RecordSet:
    """Shared query behavior over a records() sequence."""

    def records(self):
        """The records in this set; subclasses implement."""
        raise NotImplementedError

    def search(self, query=None, **metadata_filters):
        """Search metadata without instantiating materials."""
        return _search_records(self.records(), query, metadata_filters)

    def material_for_name(self, name, **qualifiers):
        """Resolve one material by name; KeyError / AmbiguousMaterialError."""
        return _resolve_record(self.records(), name, qualifiers).load()

    def __getitem__(self, key):
        """Lookup by name or 'namespace:name'."""
        if isinstance(key, str) and ':' in key:
            namespace, name = key.split(':', 1)
            return self.material_for_name(name, catalog=namespace)
        return self.material_for_name(key)


class Catalog(RecordSet):
    """In-memory catalog over material records."""

    def __init__(self, records=(), *, namespace=None):
        self.namespace = namespace
        self._records = tuple(records)

    @classmethod
    def from_materials(cls, materials, *, namespace=None):
        """Build a catalog from material instances without mutating them."""
        records = []
        for material in materials:
            override = (namespace
                        if namespace is not None and not material.catalog
                        else None)
            records.append(material.record(catalog=override))
        return cls(records, namespace=namespace)

    def records(self):
        """All material records."""
        return self._records


class CatalogChain(RecordSet):
    """Several catalogs searched in order with shared ambiguity rules."""

    def __init__(self, catalogs):
        self.catalogs = tuple(catalogs)

    def records(self):
        """Records from every catalog in chain order."""
        return tuple(r for catalog in self.catalogs for r in catalog.records())
