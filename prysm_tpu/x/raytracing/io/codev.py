"""Code V .seq prescription reader/writer.

Rebuild of ``prysm/x/raytracing/io/codev.py``: semicolon/newline command
tokenizer, SO/S/SI surface blocks with RDY/CUY/THI/K/GLA and even-
asphere A..H coefficients, Fringe-Zernike and XY-polynomial freeforms,
decenter/tilt (XDE..CDE, DAR) converted with the left-handed ADE/BDE
sign at this boundary, model-glass token decoding, and a strict writer.
"""
import math
import re

from ... import materials as _materials
from ._indexing import fringe_to_nm, xy_j_to_mn
from ._common import (
    fields_from_xy,
    read_text_or_path,
    fold_sign,
    writable_shape_or_raise,
    length_scale_to_mm,
    scale_length_to_mm,
    aperture_kwargs_from_radii,
    parse_float,
)
from ..lensdata import LensData
from ..system import OpticalSystem, ApertureSpec, FieldSet
from ..paraxial import effective_focal_length
from ._surface_spec import (
    build_shape,
    surface_spec_factory,
    surface_spec_from_row,
)

# writer emits THI 1E10 for an infinite conjugate; reads >= this are inf
_INFINITE_OBJECT_THI_MM = 1e9


# ---------- tokenizer -------------------------------------------------------

def _strip_comment(line):
    i = line.find('!')
    if i >= 0:
        line = line[:i]
    return line.rstrip()


def _split_commands(text):
    """Flat list of [verb, *args] commands (newline/semicolon separated)."""
    cmds = []
    for line in text.splitlines():
        line = _strip_comment(line)
        if not line.strip():
            continue
        for piece in line.split(';'):
            piece = piece.strip()
            if not piece:
                continue
            tokens = piece.split()
            tokens[0] = tokens[0].upper()
            cmds.append(tokens)
    return cmds


_VIGNETTING_KEYS = ('vux', 'vlx', 'vuy', 'vly')


def _new_surface_dict():
    return {
        'rdy': None, 'cuy': None, 'rdx': None, 'cux': None,
        'thi': 0.0, 'k': 0.0, 'kx': None, 'gla': None,
        'semidiameter': None, 'inner_semidiameter': None,
        'asphere_coefs': {}, 'is_asphere': False,
        'zfr_coefs': None, 'xyp_coefs': None, 'nrr': None,
        'dec_x': 0.0, 'dec_y': 0.0, 'dec_z': 0.0,
        'ade': 0.0, 'bde': 0.0, 'cde': 0.0,
        'dar': False,
    }


def read_seq(path_or_text, *, _is_text=False, database=None):
    """Read a Code V .seq file into an OpticalSystem."""
    text, path_for_meta = read_text_or_path(path_or_text, is_text=_is_text)
    cmds = _split_commands(text)

    header = {
        'title': None, 'unit': None,
        'wavelengths': [], 'wavelength_weights': [],
        'reference_wvl_index': None,
        'epd': None, 'fno': None,
        'yan': [], 'xan': [], 'yim': [], 'xim': [],
        'vignetting': {key: [] for key in _VIGNETTING_KEYS},
        'extras': {},
    }
    radius_mode = True   # RDM default; CUM flips to curvature mode
    surfaces = []
    current = None
    stop_surface = None

    def _commit_current():
        nonlocal current
        if current is not None:
            surfaces.append(current)
            current = None

    i = 0
    while i < len(cmds):
        verb, *args = cmds[i]
        if verb == 'LEN':
            pass
        elif verb in ('TITLE', 'TIT'):
            header['title'] = _unquote_title(' '.join(args))
        elif verb in ('RDM',):
            radius_mode = True
        elif verb in ('CUM',):
            radius_mode = False
        elif verb in ('DIM',):
            if args:
                u = args[0].upper()
                header['unit'] = {
                    'M': 'mm',  # Code V 'M' = millimeter
                    'CM': 'cm', 'IN': 'in', 'FT': 'ft',
                }.get(u, u.lower())
        elif verb == 'WL':
            # Code V wavelengths are nanometers; microns here
            try:
                header['wavelengths'] = [float(t) / 1000.0 for t in args]
            except ValueError:
                pass
        elif verb == 'WTW':
            try:
                header['wavelength_weights'] = [float(t) for t in args]
            except ValueError:
                pass
        elif verb == 'REF':
            if args:
                try:
                    header['reference_wvl_index'] = int(args[0])
                except ValueError:
                    pass
        elif verb == 'EPD':
            if args:
                try:
                    header['epd'] = float(args[0])
                except ValueError:
                    pass
        elif verb == 'FNO':
            if args:
                try:
                    header['fno'] = float(args[0])
                except ValueError:
                    pass
        elif verb in ('YAN', 'XAN', 'YIM', 'XIM'):
            try:
                header[verb.lower()] = [float(t) for t in args]
            except ValueError:
                pass
        elif verb in ('VUX', 'VLX', 'VUY', 'VLY'):
            try:
                header['vignetting'][verb.lower()] = [float(t)
                                                      for t in args]
            except ValueError:
                pass
        elif verb == 'STO':
            stop_surface = current if current is not None else (
                surfaces[-1] if surfaces else None)
        elif verb == 'SO':
            _commit_current()
            current = _new_surface_dict()
            current['_is_object'] = True
            _consume_surface_line(args, current, radius_mode)
        elif verb == 'S':
            _commit_current()
            current = _new_surface_dict()
            _consume_surface_line(args, current, radius_mode)
        elif verb == 'SI':
            _commit_current()
            current = _new_surface_dict()
            current['_is_image'] = True
            _consume_surface_line(args, current, radius_mode)
        elif verb == 'GO':
            _commit_current()
            break
        elif current is not None and verb == 'RDY':
            current['rdy'] = parse_float(args[0])
        elif current is not None and verb == 'CUY':
            current['cuy'] = parse_float(args[0])
        elif current is not None and verb == 'RDX':
            current['rdx'] = parse_float(args[0])
        elif current is not None and verb == 'CUX':
            current['cux'] = parse_float(args[0])
        elif current is not None and verb == 'THI':
            current['thi'] = parse_float(args[0])
        elif current is not None and verb == 'K':
            current['k'] = parse_float(args[0])
        elif current is not None and verb == 'KX':
            current['kx'] = parse_float(args[0])
        elif current is not None and verb == 'GLA':
            current['gla'] = args[0] if args else None
        elif current is not None and verb in ('CAO', 'CA', 'CIR'):
            if args:
                current['semidiameter'] = parse_float(args[0])
        elif current is not None and verb == 'CAI':
            if args:
                current['inner_semidiameter'] = parse_float(args[0])
        elif current is not None and verb == 'ASP':
            current['is_asphere'] = True
        elif current is not None and verb == 'ZFR':
            try:
                current['zfr_coefs'] = [parse_float(t) for t in args]
            except ValueError:
                pass
        elif current is not None and verb == 'XYP':
            try:
                current['xyp_coefs'] = [parse_float(t) for t in args]
            except ValueError:
                pass
        elif current is not None and verb in ('NRR', 'NRD'):
            if args:
                try:
                    current['nrr'] = parse_float(args[0])
                except ValueError:
                    pass
        elif current is not None and verb == 'DAR':
            current['dar'] = True
        elif current is not None and verb == 'XDE':
            if args:
                current['dec_x'] = parse_float(args[0])
        elif current is not None and verb == 'YDE':
            if args:
                current['dec_y'] = parse_float(args[0])
        elif current is not None and verb == 'ZDE':
            if args:
                current['dec_z'] = parse_float(args[0])
        elif current is not None and verb == 'ADE':
            if args:
                current['ade'] = parse_float(args[0])
        elif current is not None and verb == 'BDE':
            if args:
                current['bde'] = parse_float(args[0])
        elif current is not None and verb == 'CDE':
            if args:
                current['cde'] = parse_float(args[0])
        elif current is not None and verb == 'BEN':
            pass  # reflection direction is handled natively
        elif current is not None and len(verb) == 1 and verb in 'ABCDEFGH':
            # A/B/C/... are even-asphere coefs (A = a4, B = a6, ...)
            order = ord(verb) - ord('A') + 1
            try:
                current['asphere_coefs'][order] = parse_float(args[0])
                current['is_asphere'] = True
            except (IndexError, ValueError):
                pass
        else:
            header['extras'].setdefault(verb, []).append(' '.join(args))
        i += 1

    _commit_current()

    if not surfaces:
        raise ValueError('no surfaces found in .seq text')

    unit_scale = length_scale_to_mm(header['unit'] or 'mm')

    fields = _angle_fields_from_header(header)
    ref_idx = header.get('reference_wvl_index')
    wavelengths = header['wavelengths']
    reference = None
    if ref_idx is not None and 1 <= ref_idx <= len(wavelengths):
        reference = ref_idx - 1

    aperture = None
    if header['epd'] is not None:
        aperture = ApertureSpec.epd(scale_length_to_mm(header['epd'],
                                                       unit_scale))
    elif header['fno'] is not None:
        aperture = ApertureSpec.fno(header['fno'])

    ld = LensData()
    sys = OpticalSystem(
        ld, aperture=aperture, fields=fields, wavelengths=wavelengths,
        weights=header['wavelength_weights'] or None, reference=reference,
        title=header['title'], source_path=path_for_meta,
        source_format='codev', extras=header['extras'])

    n_refl = 0
    stop_row = None
    for sd in surfaces:
        if sd.get('_is_object'):
            obj_thi = scale_length_to_mm(sd.get('thi', 0.0), unit_scale)
            if (math.isfinite(obj_thi) and obj_thi != 0.0
                    and abs(obj_thi) < _INFINITE_OBJECT_THI_MM):
                ld.object_row.thickness = obj_thi
            obj_spec = _build_spec(sd, radius_mode, database, unit_scale)
            if obj_spec.n is not None:
                ld.object_row.material = obj_spec.n
            continue
        tilt, decenter, kind = _pose_from_dict(sd, unit_scale)
        if tilt is not None or decenter is not None:
            ld.add_coordbreak(
                decenter=decenter or (0.0, 0.0, 0.0),
                tilt=tilt or (0.0, 0.0, 0.0), kind=kind)
        aperture_kwargs = aperture_kwargs_from_radii(
            sd.get('semidiameter'), unit_scale,
            inner_radius=sd.get('inner_semidiameter'))
        if sd.get('_is_image'):
            sign = fold_sign(n_refl)
            ld.image_row.thickness = sign * scale_length_to_mm(
                sd.get('thi', 0.0), unit_scale)
            for key, val in aperture_kwargs.items():
                setattr(ld.image_row, key, val)
            continue
        else:
            spec = _build_spec(sd, radius_mode, database, unit_scale)
            if spec.typ == 'refl':
                n_refl += 1
            sign = fold_sign(n_refl)
            ld.add(build_shape(spec),
                   thickness=sign * scale_length_to_mm(
                       sd.get('thi', 0.0), unit_scale),
                   material=spec.n, typ=spec.typ, **aperture_kwargs)
        if sd is stop_surface:
            stop_row = ld.rows[-2]   # surface just inserted before IMAGE

    if stop_row is not None:
        from ..listings import surface_row_mappings
        for mapping in surface_row_mappings(ld):
            if (mapping['surface_index'] is not None
                    and ld.rows[mapping['row_index']] is stop_row):
                sys.stop_index = mapping['surface_index']
                break

    if not fields and (header['xim'] or header['yim']):
        sys.fields = FieldSet(_image_height_fields_from_header(
            header, sys, unit_scale))

    return sys


def _unquote_title(title):
    title = title.strip()
    if len(title) >= 2 and title[0] in ('"', "'") and title[-1] == title[0]:
        return title[1:-1]
    return title


def _field_count(x_values, y_values):
    return max(len(x_values), len(y_values))


def _vignetting_by_field(header, nfields):
    if nfields <= 0:
        return []
    out = []
    for i in range(nfields):
        item = {}
        for key in _VIGNETTING_KEYS:
            values = header['vignetting'].get(key, ())
            item[key] = values[i] if i < len(values) else 0.0
        out.append(item)
    return out


def _angle_fields_from_header(header):
    nfields = _field_count(header['xan'], header['yan'])
    if nfields == 0:
        return []
    return fields_from_xy(
        header['xan'], header['yan'], kind='angle', unit='deg',
        vignetting=_vignetting_by_field(header, nfields))


def _image_height_fields_from_header(header, system, unit_scale):
    """Convert XIM/YIM image heights to equivalent angle fields via EFL."""
    nfields = _field_count(header['xim'], header['yim'])
    if nfields == 0:
        return []

    wavelength = system.wavelength(None)
    efl = abs(float(effective_focal_length(system.to_surfaces(),
                                           wvl=wavelength)))
    if not math.isfinite(efl) or efl <= 0.0:
        raise ValueError(
            'Code V image-height fields (XIM/YIM) require a finite, '
            'nonzero effective focal length')

    x_angles = []
    y_angles = []
    for i in range(nfields):
        x = header['xim'][i] if i < len(header['xim']) else 0.0
        y = header['yim'][i] if i < len(header['yim']) else 0.0
        x = scale_length_to_mm(x, unit_scale)
        y = scale_length_to_mm(y, unit_scale)
        x_angles.append(math.degrees(math.atan2(x, efl)))
        y_angles.append(math.degrees(math.atan2(y, efl)))

    return fields_from_xy(
        x_angles, y_angles, kind='angle', unit='deg',
        vignetting=_vignetting_by_field(header, nfields))


def _is_number(token):
    t = token.strip()
    if t.upper() in ('INF', 'INFINITY'):
        return True
    try:
        float(t)
        return True
    except ValueError:
        return False


def _consume_surface_line(args, sd, radius_mode):
    """Parse inline tokens of SO / S / SI: S <rad> <thi> [glass]."""
    pos = 0
    if pos < len(args) and _is_number(args[pos]):
        val = parse_float(args[pos])
        sd['rdy' if radius_mode else 'cuy'] = val
        pos += 1
    if pos < len(args) and _is_number(args[pos]):
        sd['thi'] = parse_float(args[pos])
        pos += 1
    if pos < len(args):
        if pos == 0:
            raise ValueError(
                'Code V surface line expects positional numeric data, got '
                f'{args[pos]!r}')
        sd['gla'] = args[pos]


def _pose_from_dict(sd, length_scale=1.0):
    """(tilt, decenter, kind) for one parsed surface dict.

    Code V alpha/beta tilts are left-handed; invert ADE/BDE at this
    boundary only.
    """
    tilt = None
    decenter = None
    if any(sd.get(k, 0.0) for k in ('ade', 'bde', 'cde')):
        tilt = (float(sd.get('cde', 0.0)),
                -float(sd.get('bde', 0.0)),
                -float(sd.get('ade', 0.0)))
    if any(sd.get(k, 0.0) for k in ('dec_x', 'dec_y', 'dec_z')):
        decenter = (scale_length_to_mm(sd.get('dec_x', 0.0), length_scale),
                    scale_length_to_mm(sd.get('dec_y', 0.0), length_scale),
                    scale_length_to_mm(sd.get('dec_z', 0.0), length_scale))
    kind = 'dar' if sd.get('dar') else 'basic'
    return tilt, decenter, kind


def _build_spec(sd, radius_mode, database=None, length_scale=1.0):
    """One parsed Code V surface dict -> SurfaceSpec (no pose)."""
    c_y = _resolve_c(sd, 'cuy', 'rdy')
    c_x = _resolve_c(sd, 'cux', 'rdx')
    k_y = float(sd.get('k', 0.0))
    k_x = sd.get('kx', None)

    glass = sd.get('gla')
    if glass is not None and glass.upper() in ('REFL', 'REF_S',
                                               'REFL_FRONT'):
        n_callable = _materials.MIRROR
    else:
        n_callable = _lookup_codev_glass(glass, database)
    spec = surface_spec_factory(n_callable, length_scale)

    if sd.get('zfr_coefs') is not None:
        coefs = sd['zfr_coefs']
        nrr = sd.get('nrr') or 1.0
        nms = [fringe_to_nm(j) for j in range(1, len(coefs) + 1)]
        return spec('zernike',
                    dict(c=c_y, k=k_y, normalization_radius=float(nrr),
                         nms=nms, coefs=tuple(coefs), norm=False))

    if sd.get('xyp_coefs') is not None:
        coefs = sd['xyp_coefs']
        nrr = sd.get('nrr') or 1.0
        mns = [xy_j_to_mn(j) for j in range(1, len(coefs) + 1)]
        return spec('xy',
                    dict(c=c_y, k=k_y, normalization_radius=float(nrr),
                         mns=mns, coefs=tuple(coefs)))

    if c_x is not None or k_x is not None:
        cx_resolved = c_x if c_x is not None else c_y
        kx_resolved = float(k_x) if k_x is not None else 0.0
        return spec('biconic',
                    dict(c_x=cx_resolved, c_y=c_y, k_x=kx_resolved,
                         k_y=k_y))

    if sd.get('is_asphere'):
        coefs_dict = sd.get('asphere_coefs', {})
        if coefs_dict:
            n_coefs = max(coefs_dict)
            coefs = tuple(coefs_dict.get(i, 0.0)
                          for i in range(1, n_coefs + 1))
        else:
            coefs = ()
        return spec('even_asphere', dict(c=c_y, k=k_y, coefs=coefs))

    return spec('conic', dict(c=c_y, k=k_y))


_MODEL_DOTTED = re.compile(r'^(\d{6})\.(\d{6})$')
_MODEL_CODE = re.compile(r'^(\d{6})$')


def _model_glass_from_token(token):
    """Code V model glass from an nd/Vd token, or None.

    Spellings: nd:Vd; dotted AAAAAA.BBBBBB (nd = 1+A/1e6, Vd = B/1e4);
    six-digit NNNVVV (nd = 1+NNN/1e3, Vd = VVV/10).
    """
    if ':' in token:
        a, b = token.split(':', 1)
        try:
            return _materials.model_glass(float(a), float(b))
        except ValueError:
            return None
    m = _MODEL_DOTTED.match(token)
    if m:
        return _materials.model_glass(1.0 + int(m.group(1)) * 1e-6,
                                      int(m.group(2)) * 1e-4)
    m = _MODEL_CODE.match(token)
    if m:
        code = m.group(1)
        return _materials.model_glass(1.0 + int(code[:3]) * 1e-3,
                                      int(code[3:]) * 1e-1)
    return None


def _lookup_codev_glass(glass, database):
    """Resolve a GLA token GLASS_CATALOG (vendor-suffixed) or model glass."""
    if glass is None:
        return _materials.lookup(glass, database=database)
    model = _model_glass_from_token(glass)
    if model is not None:
        return model
    if '_' not in glass:
        return _materials.lookup(glass, database=database)
    try:
        return _materials.lookup(glass, database=database)
    except KeyError:
        pass
    name, vendor = glass.rsplit('_', 1)
    model = _model_glass_from_token(name)
    if model is not None:
        return model
    try:
        return _materials.lookup(name, database=database, catalog=vendor)
    except KeyError:
        return _materials.lookup(name, database=database)


def _glass_name(material, typ):
    """Best-effort Code V glass token for a LensData material."""
    from ..spencer_and_murty import STYPE_REFLECT
    from ..surfaces import _map_stype
    if _map_stype(typ) == STYPE_REFLECT:
        return 'REFL'
    if material is None or material is _materials.air \
            or material is _materials.vacuum:
        return None
    page_info = getattr(material, 'page_info', None)
    if page_info and page_info.get('page'):
        return page_info['page']
    return None


def _coordbreak_seq_lines(row):
    """Code V decenter/tilt commands for a LensData CoordBreak."""
    dx, dy, dz = (float(v) for v in row.decenter)
    rz, ry, rx = (float(v) for v in row.tilt)
    lines = []
    if getattr(row, 'kind', 'basic') == 'dar':
        lines.append('DAR')
    if dx:
        lines.append(f'XDE {dx:g}')
    if dy:
        lines.append(f'YDE {dy:g}')
    if dz:
        lines.append(f'ZDE {dz:g}')
    # ADE/BDE are left-handed about X/Y; invert on export
    if rx:
        lines.append(f'ADE {-rx:g}')
    if ry:
        lines.append(f'BDE {-ry:g}')
    if rz:
        lines.append(f'CDE {rz:g}')
    return lines


def write_seq(system):
    """Serialize an OpticalSystem to .seq text (rot. symmetric subset).

    Writes curvature mode (CUM); wavelengths export in nanometers;
    post-mirror gaps use the Code V negative-thickness convention.
    """
    from ._common import aperture_export_radii, preflight_export
    from ..lensdata import SurfaceMap
    preflight_export(system, 'write_seq')
    from ..lensdata import CoordBreak
    lines = ['LEN', 'CUM', 'DIM M']
    title = getattr(system, 'title', None)
    if title:
        lines.append(f'TITLE "{title}"')
    wvls = getattr(system, 'wavelengths', None)
    wvls = [] if wvls is None else [float(w) for w in wvls]
    if wvls:
        lines.append('WL ' + ' '.join(f'{w * 1000.0:g}' for w in wvls))
        lines.append(f'REF {int(getattr(system, "reference", 0)) + 1}')
    weights = getattr(system, 'weights', None)
    weights = [] if weights is None else [float(w) for w in weights]
    if weights and len(weights) == len(wvls) \
            and any(w != 1.0 for w in weights):
        lines.append('WTW ' + ' '.join(f'{w:g}' for w in weights))
    epd = getattr(system, 'epd', None)
    if epd is not None:
        lines.append(f'EPD {epd:g}')
    fields = getattr(system, 'fields', None) or []
    if fields:
        lines.append('XAN ' + ' '.join(f'{f.hx:g}' for f in fields))
        lines.append('YAN ' + ' '.join(f'{f.hy:g}' for f in fields))
        for key in ('vux', 'vlx', 'vuy', 'vly'):
            values = [0.0 if f.vignetting is None
                      else float(f.vignetting.get(key, 0.0))
                      for f in fields]
            if any(value != 0.0 for value in values):
                lines.append(key.upper() + ' '
                             + ' '.join(f'{v:g}' for v in values))

    from ..spencer_and_murty import STYPE_OBJ, _is_measurement_surf
    from ..surfaces import _map_stype
    obj_row = next((r for r in system.rows
                    if not isinstance(r, CoordBreak)
                    and _map_stype(r.typ) == STYPE_OBJ), None)
    obj_thi = (float(obj_row.thickness) if obj_row is not None
               else float('inf'))
    thi = '1E10' if not math.isfinite(obj_thi) else f'{obj_thi:g}'
    so_line = f'SO ; THI {thi}'
    if obj_row is not None:
        glass = _glass_name(obj_row.material, obj_row.typ)
        if glass:
            so_line += f' ; GLA {glass}'
        outer, inner = aperture_export_radii(obj_row.aperture,
                                             allow_annular=True)
        if outer is not None:
            so_line += f' ; CAO {outer:g}'
        if inner is not None:
            so_line += f' ; CAI {inner:g}'
    lines.append(so_line)

    n_refl = 0
    pending_coordbreak = None
    lens = getattr(system, 'lens', system)
    mapping = SurfaceMap(lens)
    stop_index = getattr(system, 'stop_index', None)
    for row_index, row in enumerate(system.rows):
        if isinstance(row, CoordBreak):
            if pending_coordbreak is not None:
                raise NotImplementedError(
                    'write_seq cannot export consecutive CoordBreak rows '
                    'without an intervening surface')
            pending_coordbreak = row
            continue
        stype = _map_stype(row.typ)
        if stype == STYPE_OBJ:
            continue
        is_eval = _is_measurement_surf(stype)
        writable_shape_or_raise(row.shape_kind, is_eval, 'write_seq')
        spec = surface_spec_from_row(row)
        params = spec.params
        is_refl = _glass_name(row.material, row.typ) == 'REFL'
        if is_refl:
            n_refl += 1
        sign = fold_sign(n_refl)
        thi = sign * spec.thickness
        if is_eval:
            parts = ['SI']
            outer, inner = aperture_export_radii(row.aperture,
                                                 allow_annular=True)
            if outer is not None:
                parts.append(f'CAO {outer:g}')
            if inner is not None:
                parts.append(f'CAI {inner:g}')
            lines.append(' ; '.join(parts))
            if mapping.surface_for_row(row_index) == stop_index:
                lines.append('STO')
            if pending_coordbreak is not None:
                lines.extend(_coordbreak_seq_lines(pending_coordbreak))
                pending_coordbreak = None
            continue
        parts = ['S', f'CUY {params.get("c", 0.0):g}', f'THI {thi:g}']
        if params.get('k', 0.0):
            parts.insert(2, f'K {params["k"]:g}')
        glass = _glass_name(row.material, row.typ)
        if glass:
            parts.append(f'GLA {glass}')
        outer, inner = aperture_export_radii(row.aperture,
                                             allow_annular=True)
        if outer is not None:
            parts.append(f'CAO {outer:g}')
        if inner is not None:
            parts.append(f'CAI {inner:g}')
        lines.append(' ; '.join(parts))
        if mapping.surface_for_row(row_index) == stop_index:
            lines.append('STO')
        if pending_coordbreak is not None:
            lines.extend(_coordbreak_seq_lines(pending_coordbreak))
            pending_coordbreak = None
    if pending_coordbreak is not None:
        raise NotImplementedError(
            'write_seq cannot export a trailing CoordBreak with no surface')
    lines.append('GO')
    return '\n'.join(lines) + '\n'


def _resolve_c(sd, cu_key, rd_key):
    """Curvature from CUY/CUX or 1/RDY/RDX; None when an X-axis is unset."""
    if sd.get(cu_key) is not None:
        return float(sd[cu_key])
    if sd.get(rd_key) is not None:
        r = float(sd[rd_key])
        if _finite_nonzero(r):
            return 1.0 / r
        return 0.0
    if cu_key == 'cuy':
        return 0.0
    return None


def _finite_nonzero(x):
    return math.isfinite(x) and x != 0.0
