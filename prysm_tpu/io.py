"""File readers/writers for commercial instruments (Zygo, Code V, SigFit).

Rebuild of ``prysm/io.py``.  This is pure host-side numpy: file formats are
byte layouts, not device computation.  The Zygo binary header layout follows
the MetroPro reference guide; phase scaling constants match the reference
(prysm/io.py:155-247) so files round-trip bit-identically.
"""
import math
import struct
import shutil
import datetime
import warnings
from io import StringIO, IOBase
from pathlib import Path

import numpy as np

ZYGO_INVALID_PHASE = 2147483640
ZYGO_ENC = 'utf-8'
ZYGO_PHASE_RES_FACTORS = {
    0: 4096,    # 12-bit
    1: 32768,   # 15-bit
    2: 131072,  # 17-bit
}
ZYGO_DEFAULT_WVL = 6.327999813038332e-07


def read_mtfmapper_sfr_single(file, pixel_pitch=None):
    """Read an MTF Mapper raw_sfr_values.txt file (-f with --single-roi).

    Returns (spatial frequencies, mtf); frequencies in cy/px, or cy/mm when
    pixel_pitch (um) is given.
    """
    if hasattr(file, 'read'):
        data = file.read()
    else:
        with open(file, 'r') as f:
            data = f.read()
    floats = [float(d) for d in data.splitlines()[0].split(' ')[:-1]]
    edge_angle, *mtf = floats
    mtf = np.asarray(mtf)
    freqs = np.arange(len(mtf)) / 64
    if pixel_pitch is not None:
        freqs = freqs / (pixel_pitch / 1e3)
    return freqs, mtf


def read_zygo_datx(file):
    """Read a Zygo .datx (HDF5) file -> dict(phase, intensity, meta).

    Phase is converted to nm; invalid points become NaN; arrays are flipped
    so y increases upward.
    """
    import h5py
    with h5py.File(file, 'r') as f:
        try:
            intens_block = list(f['Data']['Intensity'].keys())[0]
            intensity = f['Data']['Intensity'][intens_block][()].astype(np.uint16)
            intensity = np.flipud(intensity)
        except (KeyError, OSError):
            intensity = None

        phase_key = list(f['Data']['Surface'].keys())[0]
        phase_obj = f['Data']['Surface'][phase_key]
        no_data = phase_obj.attrs['No Data'][0]
        wvl = phase_obj.attrs['Wavelength'][0] * 1e9  # m -> nm
        punit = phase_obj.attrs['Unit'][0]
        if isinstance(punit, bytes):
            punit = punit.decode('UTF-8')
        scale_factor = phase_obj.attrs['Interferometric Scale Factor']
        obliquity = phase_obj.attrs['Obliquity Factor']
        phase = np.flipud(phase_obj[()]).astype(np.float64)
        phase[phase >= no_data] = np.nan
        if punit == 'Fringes':
            phase = phase * obliquity * scale_factor * wvl
        elif punit == 'NanoMeters':
            pass
        else:
            raise ValueError('datx file does not use a understood phase unit')

        attrs = f['Attributes']
        key = list(attrs)[-1]
        attrs = attrs[key].attrs
        meta = {}
        for key, value in attrs.items():
            if key.endswith('Unit'):
                continue
            if key.startswith('Data Context.'):
                key = key[len('Data Context.'):]
            if key.startswith('Data Attributes.'):
                key = key[len('Data Attributes.'):]
            if key.endswith('Value'):
                key = key[:-5]
            if key.endswith(':'):
                key = key[:-1]
            if key == 'Resolution':
                key = 'Lateral Resolution'
            elif key in ['Property Bag List', 'Group Number', 'TextCount']:
                continue
            if value.dtype == 'object':
                value = value[0]
                if isinstance(value, bytes):
                    value = value.decode('UTF-8')
            elif value.dtype in ['uint8', 'int32']:
                value = int(value[0])
            elif value.dtype in ['float64']:
                value = float(value[0])
            else:
                continue
            meta[key] = value
    return {'phase': phase, 'intensity': intensity, 'meta': meta}


def _zygo_field_table():
    """MetroPro binary header fields: name -> (struct code, lo, hi, default)."""
    IB16 = '>H'
    IL16 = '<H'
    IB32 = '>I'
    IL32 = '<I'
    FB32 = '>f'
    FL32 = '<f'
    LE = '<'
    uint8 = 'B'
    return {
        'magic_number': (IB32, 0, 4, 0x881B036F),
        'header_format': (IB16, 4, 6, 1),
        'header_size': (IB32, 6, 10, 834),
        'swtype': (IB16, 10, 12, 1),
        'swdate': (LE + '30' + 's', 12, 42, ' ' * 30),
        'swmaj': (IB16, 42, 44, 0),
        'swmin': (IB16, 44, 46, 0),
        'swpatch': (IB16, 46, 48, 0),
        'ac_x': (IB16, 48, 50, 0),
        'ac_y': (IB16, 50, 52, 0),
        'ac_width': (IB16, 52, 54, 0),
        'ac_height': (IB16, 54, 56, 0),
        'ac_n_buckets': (IB16, 56, 58, 0),
        'ac_range': (IB16, 58, 60, 0),
        'ac_n_bytes': (IB32, 60, 64, 0),
        'cn_x': (IB16, 64, 66, 0),
        'cn_y': (IB16, 66, 68, 0),
        'cn_width': (IB16, 68, 70, 0),
        'cn_height': (IB16, 70, 72, 0),
        'cn_n_bytes': (IB32, 72, 76, 0),
        'timestamp': (IB32, 76, 80, 0),
        'comment': (LE + '82' + 's', 80, 162, ' ' * 82),
        'source': (IB16, 162, 164, 0),
        'scale_factor': (FB32, 164, 168, 0.5),
        'wavelength': (FB32, 168, 172, ZYGO_DEFAULT_WVL),
        'numerical_aperture': (FB32, 172, 176, 0),
        'obliquity_factor': (FB32, 176, 180, 1.),
        'magnification': (FB32, 180, 184, 0),
        'lateral_resolution': (FB32, 184, 188, 1.),
        'acq_type': (IB16, 188, 190, 0),
        'intensity_average_count': (IB16, 190, 192, 0),
        'sfac_limit': (IB16, 194, 196, 3),
        'ramp_cal': (IB16, 192, 194, 0),
        'ramp_gain': (IB16, 196, 198, 1753),
        'part_thickness': (FB32, 198, 202, 0),
        'sw_llc': (IB16, 202, 204, 1),
        'target_range': (FB32, 204, 208, 0.1),
        'rad_crv_measure_seq': (IL16, 208, 210, 0),
        'min_mod': (IB32, 210, 214, 17),
        'min_mod_count': (IB32, 214, 218, 50),
        'phase_res': (IB16, 218, 220, 1),
        'min_area': (IB32, 220, 224, 20),
        'discontinuity_action': (IB16, 224, 226, 1),
        'discontinuity_filter': (FB32, 226, 230, 60.),
        'connect_order': (IB16, 230, 232, 0),
        'sign': (IB16, 232, 234, 0),
        'camera_width': (IB16, 234, 236, 0),
        'camera_height': (IB16, 236, 238, 0),
        'sys_type': (IB16, 238, 240, 23),
        'sys_board': (IB16, 240, 242, 0),
        'sys_serial': (IB16, 242, 244, 0),
        'sys_inst_id': (IB16, 244, 246, 0),
        'obj_name': (LE + '12' + 's', 246, 258, ' ' * 12),
        'part_name': (LE + '40' + 's', 258, 298, ' ' * 80),
        'codev_type': (IB16, 298, 300, 0),
        'phase_avg_count': (IB16, 300, 302, 1),
        'sub_sys_err': (IB16, 302, 304, 0),
        '__pad0': ('16x', 304, 320, '\x00' * 16),
        'part_sn': (LE + '40' + 's', 320, 360, ' ' * 40),
        'refractive_index': (FB32, 360, 364, 1.),
        'remove_tilt': (IB16, 364, 366, 0),
        'remove_fringes': (IB16, 366, 368, 0),
        'max_area': (IB32, 368, 372, 9999999),
        'setup_type': (IB16, 372, 374, 0),
        'wrapped': (IB16, 374, 376, 0),
        'pre_connect_filter': (FB32, 376, 380, 0.),
        '__pad1': ('6x', 380, 386, '\x00' * 6),
        'wavelength_in_1': (FB32, 386, 390, ZYGO_DEFAULT_WVL),
        'wavelength_in_2': (FB32, 390, 394, ZYGO_DEFAULT_WVL),
        'wavelength_in_3': (FB32, 394, 398, ZYGO_DEFAULT_WVL),
        'wavelength_select': ('<8s', 398, 406, '1       '),
        'fda_res': (IB16, 406, 408, 0),
        'scan_description': (LE + '20' + 's', 408, 428, ' ' * 20),
        'n_fiducials': (IB16, 428, 430, 0),
        'fiducial_1': (FB32, 430, 434, 0.),
        'fiducial_2': (FB32, 434, 438, 0.),
        'fiducial_3': (FB32, 438, 442, 0.),
        'fiducial_4': (FB32, 442, 446, 0.),
        'fiducial_5': (FB32, 446, 450, 0.),
        'fiducial_6': (FB32, 450, 454, 0.),
        'fiducial_7': (FB32, 454, 458, 0.),
        'fiducial_8': (FB32, 458, 462, 0.),
        'fiducial_9': (FB32, 462, 466, 0.),
        'fiducial_10': (FB32, 466, 470, 0.),
        'fiducial_11': (FB32, 470, 474, 0.),
        'fiducial_12': (FB32, 474, 478, 0.),
        'fiducial_13': (FB32, 478, 482, 0.),
        'fiducial_14': (FB32, 482, 486, 0.),
        'pixel_width': (FB32, 486, 490, 7.4e-6),
        'pixel_height': (FB32, 490, 494, 7.4e-6),
        'exit_pupil_diameter': (FB32, 494, 498, 0.),
        'light_level_percent': (FB32, 498, 502, 55.),
        'coords_state': (IL32, 502, 506, 0),
        'coords_x': (FL32, 506, 510, 0.),
        'coords_y': (FL32, 510, 514, 0.),
        'coords_z': (FL32, 514, 518, 0.),
        'coords_a': (FL32, 518, 522, 0.),
        'coords_b': (FL32, 522, 526, 0.),
        'coords_c': (FL32, 526, 530, 0.),
        'cohrence_mode': (IL16, 530, 532, 0),
        'surface_filter': (IL16, 532, 534, 0),
        'sys_err_filename': (LE + '28' + 's', 534, 562, ' ' * 28),
        'zoom_descr': (LE + '8' + 's', 562, 570, '   1X '),
        'alpha_part': (FL32, 570, 574, 0),
        'beta_part': (FL32, 574, 578, 0),
        'dist_part': (FL32, 578, 582, 0),
        'cam_split_loc_x': (IL16, 582, 584, 0),
        'cam_split_loc_y': (IL16, 584, 586, 0),
        'cam_split_trans_x': (IL16, 586, 588, 0),
        'cam_split_trans_y': (IL16, 588, 590, 0),
        'material_a': (LE + '24' + 's', 590, 614, ' ' * 24),
        'material_b': (LE + '24' + 's', 614, 638, ' ' * 24),
        '__pad2': ('4x', 638, 642, '\x00' * 4),
        'dmi_center_x': (FL32, 642, 646, 0.),
        'dmi_center_y': (FL32, 646, 650, 0.),
        'sph_distortion_correction': (IL16, 650, 652, 0),
        'sph_dist_part_na': (FL32, 654, 658, 0.),
        'sph_dist_part_radius': (FL32, 658, 662, 0.),
        'sph_dist_cal_na': (FL32, 662, 666, 0.),
        'sph_dist_cal_radius': (FL32, 666, 670, 0.),
        'surface_type': (IL16, 670, 672, 0),
        'ac_surface_type': (IL16, 672, 674, 0),
        'z_pos': (FL32, 674, 678, 0.),
        'power_mul': (FL32, 678, 682, 0.),
        'focus_mul': (FL32, 682, 686, 0.),
        'roc_focus_cal_factor': (FL32, 686, 690, 0.),
        'roc_power_cal_factor': (FL32, 690, 694, 0.),
        'ftp_pos_left': (FL32, 694, 698, 0.),
        'ftp_pos_right': (FL32, 698, 702, 0.),
        'ftp_pos_pitch': (FL32, 702, 706, 0.),
        'ftp_pos_roll': (FL32, 706, 710, 0.),
        'min_mod_percent': (FL32, 710, 714, 7.),
        'max_intens': (IL32, 714, 718, 0),
        'ring_of_fire': (IL16, 718, 720, 0),
        '__pad3': ('x', 720, 721, '\x00'),
        'rc_orientation': ('c', 721, 722, ' '),
        'rc_distance': (FL32, 722, 726, 0.),
        'rc_angle': (FL32, 726, 730, 0.),
        'rc_diameter': (FL32, 730, 734, 0.),
        'rem_fringes_mode': (IB16, 734, 736, 0),
        '__pad4': ('x', 736, 737, '\x00'),
        'ftpsi_phase_res': (uint8, 737, 738, 0),
        'frames_acquired': (IL16, 738, 740, 0),
        'cavity_type': (IL16, 740, 742, 0),
        'cam_frame_rate': (FL32, 742, 746, 0.),
        'tune_range': (FL32, 746, 750, 0.),
        'cal_pix_x': (IL16, 750, 752, 0),
        'cal_pix_y': (IL16, 752, 754, 0),
        'test_cal_pts_1': (FL32, 758, 762, 0.),
        'test_cal_pts_2': (FL32, 762, 766, 0.),
        'test_cal_pts_3': (FL32, 766, 770, 0.),
        'test_cal_pts_4': (FL32, 770, 774, 0.),
        'ref_cal_pts_1': (FL32, 774, 778, 0.),
        'ref_cal_pts_2': (FL32, 778, 782, 0.),
        'ref_cal_pts_3': (FL32, 782, 786, 0.),
        'ref_cal_pts_4': (FL32, 786, 790, 0.),
        'test_cal_pix_opd': (FL32, 790, 794, 0.),
        'test_ref_pix_opd': (FL32, 794, 798, 0.),
        'flash_phase_cd_mask': (FL32, 798, 802, 9.139576869988608e-40),
        'flash_phase_alias_mask': (FL32, 802, 806, 0.),
        'flash_phase_filter': (FL32, 806, 810, 0.),
        'scan_direction': (uint8, 810, 811, 0),
        'ftpsi_res_factor': (IL16, 814, 816, 0),
    }


def read_zygo_metadata(file_contents):
    """Parse the full MetroPro metadata header from binary file contents."""
    table = _zygo_field_table()
    out = {}
    for k, (T, lo, hi, default) in table.items():
        if k.startswith('__pad'):
            continue
        v = struct.unpack(T, file_contents[lo:hi])[0]
        if 's' in T:
            v = v.decode(ZYGO_ENC).rstrip('\x00')
        out[k] = v
    return out


def read_zygo_dat(file, multi_intensity_action='first'):
    """Read a Zygo binary .dat file -> dict(phase [nm], intensity, meta).

    Arrays are flipped vertically so y increases upward.
    """
    with open(file, 'rb') as fid:
        contents = fid.read()
    meta = read_zygo_metadata(contents)
    iw, ih, ib = meta['ac_width'], meta['ac_height'], meta['ac_n_buckets']
    if ib == 0:
        ib = 1
    ilen = iw * ih * ib
    pw, ph = meta['cn_width'], meta['cn_height']
    plen = pw * ph
    header_len = meta['header_size']

    intensity = np.frombuffer(contents, offset=header_len, count=ilen,
                              dtype=np.uint16).reshape((ib, ih, iw))
    action = multi_intensity_action.lower()
    if action == 'avg':
        intensity = intensity.mean(axis=0)
    elif action == 'first':
        intensity = intensity[0]
    elif action == 'last':
        intensity = intensity[-1]
    else:
        raise ValueError(f'multi_intensity_action {multi_intensity_action} '
                         'not among valid options of avg, first, last.')
    intensity = np.flipud(intensity)

    dt = np.dtype(np.int32).newbyteorder('>')
    try:
        phase_raw = np.frombuffer(contents, offset=header_len + ilen * 2,
                                  count=plen, dtype=dt)
    except ValueError:
        # malformed (truncated) files: zero pad and flag the missing region
        warnings.warn('provided file was malformed (truncated) - appending '
                      'zeros to phase data')
        offset = header_len + ilen * 2
        valid = len(contents) - offset
        missing_buf = bytes(plen * 4 - valid)
        contents2 = contents[offset:] + missing_buf
        phase_raw = np.copy(np.frombuffer(contents2, count=plen, dtype=dt))
        backtrack = math.ceil(len(missing_buf) / 4)
        phase_raw[-backtrack:] = ZYGO_INVALID_PHASE

    phase = phase_raw.astype(np.float64).reshape((ph, pw))
    phase = np.flipud(phase)
    phase[phase >= ZYGO_INVALID_PHASE] = np.nan
    R = ZYGO_PHASE_RES_FACTORS[meta['phase_res']]
    sf = (meta['wavelength'] * meta['scale_factor'] * meta['obliquity_factor']) / R
    phase *= (sf * 1e9)  # m -> nm
    return {'phase': phase, 'intensity': intensity, 'meta': meta}


def write_zygo_dat(file, phase, dx, wavelength=0.6328, intensity=None):
    """Write a Zygo binary .dat file (phase nm, dx mm, wavelength um)."""
    if intensity is not None:
        raise NotImplementedError('writing DAT files with intensity is not supported')
    table = _zygo_field_table()
    values = {k: v[3] for k, v in table.items()}
    values['scale_factor'] = 1.
    values['obliquity_factor'] = 1.
    values['lateral_resolution'] = dx / 1e3
    values['timestamp'] = math.floor(datetime.datetime.now().timestamp())
    values['cn_width'] = phase.shape[1]
    values['cn_height'] = phase.shape[0]
    values['cn_n_bytes'] = phase.size * 4
    values['wavelength'] = wavelength / 1e6
    values['phase_res'] = 1

    import ctypes
    buf = ctypes.create_string_buffer(834)
    for k, (T, lo, hi, _) in table.items():
        if k.startswith('__pad'):
            continue
        val = values[k]
        if 's' in T or T == 'c':
            val = val.encode(ZYGO_ENC)
        struct.pack_into(T, buf, lo, val)

    phase = np.flipud(np.asarray(phase))
    mask = np.isnan(phase)
    R = ZYGO_PHASE_RES_FACTORS[1]
    sf_m = (wavelength / 1e6 * 1. * 1.) / R
    encoded = np.where(mask, 0, phase) / 1e9 * (1 / sf_m)
    im = encoded.astype(np.int32)
    im[mask] = ZYGO_INVALID_PHASE
    dt = np.dtype(np.int32).newbyteorder('>')
    bufphs = im.astype(dt).tobytes(order='C')
    close_file = not hasattr(file, 'write')
    if close_file:
        file = open(file, 'wb')
    try:
        file.write(buf)
        file.write(bufphs)
    finally:
        if close_file:
            file.close()


def write_zygo_ascii(file, phase, dx, wavelength=0.6328, intensity=None):
    """Write a Zygo ASCII interferogram file (phase nm, dx mm, wvl um)."""
    timestamp = datetime.datetime.now()
    line1 = 'Zygo ASCII Data File - Format 2'
    line2 = '0 0 0 0 ' + timestamp.strftime('"%a %b %d %H:%M:%S %Y').ljust(30, ' ') + '"'
    if intensity is None:
        line3 = '0 0 0 0 0 0'
    else:
        raise NotImplementedError('writing of ASCII files with nonempty intensity not yet supported.')
    px, py = phase.shape
    line4 = f'0 0 {py} {px}'
    line5 = '"' + ' ' * 81 + '"'
    line6 = '"' + ' ' * 39 + '"'
    line7 = '"' + ' ' * 39 + '"'
    timestamp_int = int(str(timestamp.timestamp()).split('.')[0])
    res = dx * 1e3
    line8 = f'0 0.5 {wavelength * 1e-6} 0 1 0 {res} {timestamp_int}'
    line9 = f'{py} {px} 0 0 0 0 ' + '"' + ' ' * 9 + '"'
    line10 = '0 0 0 0 0 0 0 0 0 0'
    line11 = '1 1 20 2 0 0 0 0 0'
    line12 = '0 ' + '"' + ' ' * 12 + '"'
    line13 = '1 0'
    line14 = '"' + ' ' * 7 + '"'
    header = '\n'.join((line1, line2, line3, line4, line5, line6, line7,
                        line8, line9, line10, line11, line12, line13, line14)) + '\n'
    line15 = '#'
    line16 = '#'
    coef = ZYGO_PHASE_RES_FACTORS[1]
    phase = np.asarray(phase, dtype=np.float64)
    encoded_phase = phase * (coef / wavelength / wavelength / 0.5)
    encoded_phase[np.isnan(encoded_phase)] = ZYGO_INVALID_PHASE
    encoded_phase = encoded_phase.astype(np.int64).flatten()
    npts = encoded_phase.shape[0]
    boundary = 10 * (npts // 10)
    s = StringIO()
    s.write(header)
    s.write('\n'.join([line15, line16, '']))
    np.savetxt(s, encoded_phase[:boundary].reshape(-1, 10), fmt='%d',
               delimiter=' ', newline=' \n')
    tail = ' '.join((str(d) for d in encoded_phase[boundary:]))
    s.write(tail)
    s.write('\n#\n')
    s.seek(0)
    if not isinstance(file, IOBase):
        with open(file, 'w') as fd:
            shutil.copyfileobj(s, fd)
    else:
        shutil.copyfileobj(s, file)


# ---------------------------------------------------------------------------
# SigFit
# ---------------------------------------------------------------------------

def read_sigfit_zernikes(file):
    """Read Zernikes from a SigFit OUTCOF3 file -> {surface id: data dict}."""
    with open(str(file), 'r') as fid:
        data = fid.read()
    data = data.split('Surface')
    out = {}
    for dat in data[1:]:
        sid, d = _read_sigfit_zernike_core(dat)
        out[sid] = d
    return out


def _read_sigfit_zernike_core(text):
    lines = text.splitlines()
    _, rest = lines[0].split('SID=')
    rest = rest.lstrip()
    surface, rest = rest.split('Rnorm=')
    surface = int(surface.strip())
    rest = rest.lstrip()
    rnorm, rest = rest.split('Type')
    _, rest = rest.split('WVL=')
    rest = rest.lstrip()
    wvl, rest = rest.split()
    unit = rest.lstrip()
    fctr = 25.4e3 if unit.lower() == 'in' else 1e3
    typ = 'Noll' if 'ZEMAX' in lines[2] else 'Fringe'
    normed = 'RMS' in lines[2]
    rnorm = float(rnorm.lstrip()) * fctr / 1e3
    coefs = []
    total_lines = len(lines)
    if lines[-1].strip() == '':
        slice_ = slice(4, -1)
    else:
        slice_ = slice(4, total_lines - 1)
    for line in lines[slice_]:
        idx, *coef = line.split(',')
        if isinstance(coef, list) and len(coef) > 0:
            coef, *_ = coef
        if coef == '' or coef == []:
            coefs.append(0)
        else:
            coefs.append(float(coef))
    coefs = np.asarray(coefs)
    wvl = float(wvl) * fctr
    return surface, {
        'type': typ,
        'normed': normed,
        'wavelength': wvl,
        'coefs': coefs * wvl,
        'rnorm': rnorm,
    }


def read_sigfit_rigidbody(file):
    """Read rigid body perturbations from a SigFit sum1.csv -> {sid: dict}."""
    file = str(file)
    with open(file, 'r') as fid:
        data = fid.readlines()
    fctr = 25.4 if '= in' in data[4] else 1
    arr = np.genfromtxt(file, skip_header=7, delimiter=',')[:, 4:12]
    arr[:, 1:] *= fctr
    out = {}
    for row in arr:
        sid, dx, dy, dz, rx, ry, rz, dR = row
        out[int(sid)] = {'dx': dx, 'dy': dy, 'dz': dz,
                         'rx': rx, 'ry': ry, 'rz': rz, 'dR': dR}
    return out


# ---------------------------------------------------------------------------
# Code V
# ---------------------------------------------------------------------------

def write_codev_gridint(array, filename, comment='CV GRD generated by prysm_tpu',
                        typ='SUR', nnb=False):
    """Write a Code V grid-sag INT file (array nm for SUR/WFR)."""
    array = np.flipud(np.asarray(array, dtype=np.float64))
    typ = typ.upper()
    assert typ in ('SUR', 'WFR', 'FIL'), 'typ must be one of SUR, WFR, FIL'
    assert array.ndim == 2, 'gridint files must be 2D arrays'
    nnb_str = 'NNB ' if nnb else ''

    array = array / 1e3  # nm -> um
    NDA_PIX = np.isnan(array)
    mn_valid = np.nanmin(array)
    mx_valid = np.nanmax(array)
    if abs(mn_valid) < np.finfo(array.dtype).eps or (mn_valid > 0):
        mn_valid = 1
    scale_down = -32767 / mn_valid
    scale_up = +32767 / mx_valid
    scale = min(scale_down, scale_up)
    array = np.around(np.where(NDA_PIX, 0, array * scale)).astype(np.int16)
    array[NDA_PIX] = -32768

    n, m = array.shape
    hdr = comment + '\n' + f'GRD {n} {m} {typ} WVL 1.0 {nnb_str}SSZ {scale} NDA -32768\n'
    width = 585
    while (array.size % width) != 0:
        width -= 1
    array = array.ravel().reshape((width, array.size // width))
    np.savetxt(filename, array, fmt='%d', delimiter=' ', header=hdr, comments='')


def write_codev_zfr_int(coefs, filename, comment='CV ZFR generated by prysm_tpu',
                        SUR=True):
    """Write a Code V INT file of ZFR (Fringe Zernike) coefficients, nm."""
    typ = 'SUR' if SUR else 'WFR'
    hdr = comment + '\n' + f'ZFR {len(coefs)} {typ} WVL 0.001 SSZ 1\n'
    formatted = '\n'.join([f'{v:.9f}' for v in coefs])
    with open(filename, 'w') as f:
        f.write(hdr)
        f.write(formatted + '\n')


def read_codev_gridint(file):
    """Read a Code V grid INT file -> (array [nm], meta dict)."""
    txt = Path(file).expanduser().read_text()
    end = 80
    while True:
        L = len(txt)
        if L < end:
            end = L
        i = txt[:end].find('!')
        if i < 0:
            break
        i = txt.find('\n', i)
        if i < 0:
            raise ValueError('CV INT file header corrupted - no new line found after !')
        txt = txt[i + 1:]

    end = txt.find('\n')
    if end < 0:
        raise ValueError('CV INT file header corrupted - no new line found after title')
    title = txt[:end]
    txt = txt[end + 1:]
    end = txt.find('\n')
    hdr = txt[:end]

    params = hdr.split()
    i = 0
    L = len(params)
    wvl = nda = ssz = m = n = meaning = None
    while i < L:
        tok = params[i].upper()
        if tok == 'WVL':
            wvl = float(params[i + 1])
            i += 2
        elif tok == 'SSZ':
            ssz = float(params[i + 1])
            i += 2
        elif tok == 'NDA':
            nda = int(params[i + 1])
            i += 2
        elif tok == 'GRD':
            m = int(params[i + 1])
            n = int(params[i + 2])
            i += 3
        elif tok == 'SUR':
            meaning = 'surface error'
            i += 1
        elif tok == 'WFR':
            meaning = 'wavefront error'
            i += 1
        elif tok == 'NNB':
            i += 1
        else:
            raise ValueError(f'parsing CV INT header: token {params[i]} not understood')

    if wvl is None:
        raise ValueError('CV INT header did not contain WVL')
    if nda is None:
        raise ValueError('CV INT (GRID) header did not contain NDA')
    if m is None or n is None:
        raise ValueError('CV INT header did not contain GRD, only grid INT files are supported')
    if ssz is None:
        raise ValueError('CV INT header did not contain SSZ')
    if meaning is None:
        raise ValueError('CV INT header did not contain SUR or WFR')

    main_data = txt[end + 1:]
    a = np.array(main_data.split(), dtype=np.int64)
    mask = a == nda
    a = a.astype(np.float64) * (1000 * wvl / ssz)
    a[mask] = np.nan
    a = np.flipud(a.reshape((n, m)))
    meta = {'title': title, 'wavelength': wvl, 'data meaning': meaning}
    return a, meta


def read_codev_psf(fn, sep=','):
    """Read a Code V PSF buffer dump -> (dx um, array)."""
    with open(fn, 'r') as f:
        total_lines_skipped = 0
        line = '\n'
        while line == '\n':
            line = f.readline()
            total_lines_skipped += 1
        line = line.strip()
        assert line == 'PSF data:', 'dat file must begin with a line, "PSF data:"'
        while not line.startswith('Grid spacing:'):
            line = f.readline().lstrip()
            total_lines_skipped += 1
        tmp = line.split(',')
        v = float(tmp[1])
        unit = tmp[2].strip()
        if unit != 'MM.':
            if unit != 'IN.':
                raise ValueError(f'expected unit to be other mm or in, got {unit}')
            v *= 25.4
        dx = v * 1e3
        while not line.startswith('Array Size:'):
            line = f.readline().lstrip()
            total_lines_skipped += 1
        array_dim = int(line.split(',')[1])
    arr = np.genfromtxt(fn, skip_header=total_lines_skipped, delimiter=sep)
    assert arr.shape == (array_dim, array_dim), 'array size must match header'
    return dx, arr


def read_codev_bsp(fn, sep=','):
    """Read a Code V BSP buffer dump -> ((dx, dy) um, (x, y) offset, array)."""
    with open(fn, 'r') as f:
        total_lines_skipped = 0
        line = '\n'
        while line == '\n':
            line = f.readline()
            total_lines_skipped += 1
        line = line.strip()
        assert line == 'BSP data:', 'dat file must begin with a line, "BSP data:"'
        while not line.startswith('Offset of grid center'):
            line = f.readline().lstrip()
            total_lines_skipped += 1
        tmp = line.split(':')[1]
        tmp = tmp.split(',')[1:-1]
        xyoffset = [float(v) for v in tmp]
        while not line.startswith('Grid spacing:'):
            line = f.readline().lstrip()
            total_lines_skipped += 1
        tmp = line.split(',')
        v = float(tmp[1])
        unit = tmp[2].strip()
        v2 = float(tmp[3])
        if unit != 'mm':
            if unit != 'in':
                raise ValueError(f'expected unit to be other mm or in, got {unit}')
            v *= 25.4
            v2 *= 25.4
        dx = v * 1e3
        dy = v2 * 1e3
        while not line.startswith('Array Size:'):
            line = f.readline().lstrip()
            total_lines_skipped += 1
        array_dim = tuple(int(v) for v in line.split(',')[1:])
    arr = np.genfromtxt(fn, skip_header=total_lines_skipped, delimiter=sep)
    assert arr.shape == array_dim, 'array size must match header'
    return (dx, dy), xyoffset, arr
