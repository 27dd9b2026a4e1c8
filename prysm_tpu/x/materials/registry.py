"""Searchable material registry with computed-property filters.

Rebuild of ``prysm/x/materials/registry.py``.
"""
from .catalog import (
    CatalogChain,
    RecordSet,
    _compile_filters,
    _loose_name_match,
    _passes,
)
from .core import MissingKError

_COMPUTED = {'n_at', 'k_max', 'dispersion', 'partial_dispersion', 'abbe'}


def _criterion_tuple(name, value, min_length, max_length, fill):
    try:
        values = tuple(value)
    except TypeError as exc:
        raise ValueError(f'{name} criterion must be a sequence') from exc
    if not (min_length <= len(values) <= max_length):
        raise ValueError(
            f'{name} criterion expects {min_length} to {max_length} values')
    return values + (fill,) * (max_length - len(values))


class MaterialRegistry(RecordSet):
    """Index many catalogs; search metadata or computed optical metrics."""

    def __init__(self, records):
        self._records = tuple(records)
        self._metric_cache = {}

    @classmethod
    def from_catalogs(cls, catalogs):
        """Build from a catalog, a chain, or an iterable of catalogs."""
        if isinstance(catalogs, CatalogChain) or hasattr(catalogs, 'records'):
            return cls(tuple(catalogs.records()))
        records = []
        for catalog in catalogs:
            records.extend(tuple(catalog.records()))
        return cls(records)

    def records(self):
        """Registry records."""
        return self._records

    def search(self, **criteria):
        """Records matching metadata and computed filters."""
        return list(self.iter_search(**criteria))

    def iter_search(self, **criteria):
        """Yield records matching metadata and computed filters."""
        for record in self._records:
            if self._matches(record, criteria):
                yield record

    def _matches(self, record, criteria):
        query = criteria.get('query')
        meta = {k: v for k, v in criteria.items()
                if k != 'query' and k not in _COMPUTED}
        if not _loose_name_match(record, query):
            return False
        if not _passes(record, _compile_filters(meta)):
            return False

        def in_band(value, lo, hi):
            return not ((lo is not None and value < lo)
                        or (hi is not None and value > hi))

        if criteria.get('n_at') is not None:
            wvl, lo, hi, temp = _criterion_tuple('n_at', criteria['n_at'],
                                                 3, 4, None)
            if not in_band(self._metric(record, 'n_at', (wvl, temp)), lo, hi):
                return False
        if criteria.get('k_max') is not None:
            wvl, threshold, temp = _criterion_tuple('k_max', criteria['k_max'],
                                                    2, 3, None)
            if threshold is None:
                raise ValueError('k_max criterion requires a non-None threshold')
            if self._metric(record, 'k_at', (wvl, temp)) > threshold:
                return False
        if criteria.get('dispersion') is not None:
            w1, w2, lo, hi, temp = _criterion_tuple(
                'dispersion', criteria['dispersion'], 4, 5, None)
            if not in_band(self._metric(record, 'dispersion', (w1, w2, temp)),
                           lo, hi):
                return False
        if criteria.get('partial_dispersion') is not None:
            w1, w2, w3, w4, lo, hi, temp = _criterion_tuple(
                'partial_dispersion', criteria['partial_dispersion'], 6, 7, None)
            if not in_band(self._metric(record, 'partial_dispersion',
                                        (w1, w2, w3, w4, temp)), lo, hi):
                return False
        if criteria.get('abbe') is not None:
            ws, wc, wl, lo, hi, temp = _criterion_tuple(
                'abbe', criteria['abbe'], 5, 6, None)
            if not in_band(self._metric(record, 'abbe', (ws, wc, wl, temp)),
                           lo, hi):
                return False
        return True

    def _metric(self, record, metric, args):
        key = (record.material_id, metric, args)
        try:
            if key in self._metric_cache:
                return self._metric_cache[key]
        except TypeError:
            key = None  # unhashable (array) criterion args: skip the cache
        material = record.load()
        if metric == 'n_at':
            wvl, temp = args
            value = material.n_at(wvl, temperature=temp)
        elif metric == 'k_at':
            wvl, temp = args
            try:
                value = material.k(wvl, temperature=temp)
            except MissingKError:
                value = 0.0  # transparent for the k_max filter
        elif metric == 'dispersion':
            w1, w2, temp = args
            value = material.dispersion(w1, w2, temperature=temp)
        elif metric == 'partial_dispersion':
            w1, w2, w3, w4, temp = args
            value = material.partial_dispersion(w1, w2, w3, w4,
                                                temperature=temp)
        elif metric == 'abbe':
            ws, wc, wl, temp = args
            value = material.abbe(ws, wc, wl, temperature=temp)
        else:
            raise ValueError(f'unknown metric {metric!r}')
        if key is not None:
            self._metric_cache[key] = value
        return value
