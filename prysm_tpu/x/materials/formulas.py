"""Dispersion formulas (Sellmeier/Cauchy/Schott/AGF/refractiveindex.info).

Rebuild of ``prysm/x/materials/formulas.py``.  Plain numpy float math —
these evaluate at setup time on the host.
"""
import numpy as np


def cauchy(wvl_um, A, *args):
    """Cauchy equation n = A + B/w^2 + C/w^4 + ..., wavelength in microns.

    Host-side numpy on purpose: materials evaluate at setup time; the
    jnp twins live in prysm_tpu.refractive for in-graph use.
    """
    n = A + 0 * np.asarray(wvl_um, dtype=float)
    for i, coef in enumerate(args, start=1):
        n = n + coef / wvl_um ** (2 * i)
    return n


def sellmeier(wvl_um, A, B):
    """Sellmeier equation n^2 = 1 + sum A_i w^2/(w^2 - B_i), microns.

    B carries the squared resonance wavelengths, matching the reference
    convention (prysm/refractive.py sellmeier).
    """
    w2 = np.asarray(wvl_um, dtype=float) ** 2
    nsq = 1.0 + 0 * w2
    for a, b in zip(np.atleast_1d(np.asarray(A, dtype=float)),
                    np.atleast_1d(np.asarray(B, dtype=float))):
        nsq = nsq + a * w2 / (w2 - b)
    return np.sqrt(nsq)


def _cauchy(wvl_um, A, *args):
    return cauchy(wvl_um, A, *args)


def _sellmeier(wvl_um, A, B):
    return sellmeier(wvl_um, A, B)


def sellmeier_interleaved(wvl_um, *coefficients):
    """Sellmeier with interleaved A1, B1, A2, B2, ... coefficients."""
    return _sellmeier(wvl_um, coefficients[0::2], coefficients[1::2])


def schott(wvl_um, c0, c1, c2, c3, c4, c5):
    """Schott power-series equation (AGF formula 1)."""
    w2 = np.square(wvl_um)
    nsq = (c0 + c1 * w2 + c2 / w2 + c3 / w2 ** 2 + c4 / w2 ** 3
           + c5 / w2 ** 4)
    return np.sqrt(nsq)


def extended2(wvl_um, c0, c1, c2, c3, c4, c5, c6, c7):
    """AGF Extended-2 equation (formula 12)."""
    w2 = np.square(wvl_um)
    nsq = (c0 + c1 * w2 + c2 / w2 + c3 / w2 ** 2 + c4 / w2 ** 3
           + c5 / w2 ** 4 + c6 * w2 ** 2 + c7 * w2 ** 3)
    return np.sqrt(nsq)


def extended3(wvl_um, c0, c1, c2, c3, c4, c5, c6, c7, c8):
    """AGF Extended-3 equation (formula 13)."""
    w2 = np.square(wvl_um)
    nsq = (c0 + c1 * w2 + c2 * w2 ** 2 + c3 / w2 + c4 / w2 ** 2
           + c5 / w2 ** 3 + c6 / w2 ** 4 + c7 / w2 ** 5 + c8 / w2 ** 6)
    return np.sqrt(nsq)


def _agf_sellmeier(coefficients, wvl_um, name, terms):
    needed = 2 * terms
    if len(coefficients) < needed:
        raise ValueError(
            f'AGF Sellmeier glass {name} requires {needed} coefficients')
    pairs = coefficients[:needed]
    return _sellmeier(wvl_um, pairs[0::2], pairs[1::2])


def agf_formula(formula, wvl_um, *coefficients, name='material'):
    """Evaluate the supported Zemax AGF dispersion-formula ids.

    Coefficients trail the wavelength positionally so
    partial(agf_formula, fid) plugs straight into FormulaMaterial.
    """
    if formula == 1:
        if len(coefficients) < 6:
            raise ValueError(
                f'AGF Schott formula glass {name} requires six coefficients')
        return schott(wvl_um, *coefficients[:6])
    if formula == 2:
        return _agf_sellmeier(coefficients, wvl_um, name, terms=3)
    if formula == 6:
        return _agf_sellmeier(coefficients, wvl_um, name, terms=4)
    if formula == 12:
        if len(coefficients) < 8:
            raise ValueError(
                f'AGF Extended 2 formula glass {name} requires eight coefficients')
        return extended2(wvl_um, *coefficients[:8])
    if formula == 13:
        if len(coefficients) < 9:
            raise ValueError(
                f'AGF Extended 3 formula glass {name} requires nine coefficients')
        return extended3(wvl_um, *coefficients[:9])
    raise NotImplementedError(
        f'AGF dispersion formula {formula} for {name} is not implemented')


def riinfo_formula(formula_id, wvl_um, *coefficients):
    """Evaluate refractiveindex.info dispersion formulas 1-9 (microns)."""
    C = coefficients
    Cp = list(C) + [0.0] * 6
    wl = wvl_um
    if formula_id == 1:  # Sellmeier, resonances as sqrt
        nsq = 1 + Cp[0]
        for i in range(1, len(C), 2):
            nsq = nsq + C[i] * wl ** 2 / (wl ** 2 - C[i + 1] ** 2)
        return np.sqrt(nsq)
    if formula_id == 2:  # Sellmeier-2, resonances squared already
        nsq = 1 + Cp[0]
        for i in range(1, len(C), 2):
            nsq = nsq + C[i] * wl ** 2 / (wl ** 2 - C[i + 1])
        return np.sqrt(nsq)
    if formula_id == 3:  # polynomial in powers of wl
        nsq = Cp[0]
        for i in range(1, len(C), 2):
            nsq = nsq + C[i] * wl ** C[i + 1]
        return np.sqrt(nsq)
    if formula_id == 4:  # RefractiveIndex.INFO mixed form
        nsq = Cp[0]
        for i in range(1, min(8, len(C)), 4):
            nsq = nsq + C[i] * wl ** C[i + 1] / (wl ** 2 - C[i + 2] ** C[i + 3])
        if len(C) > 9:
            for i in range(9, len(C), 2):
                nsq = nsq + C[i] * wl ** C[i + 1]
        return np.sqrt(nsq)
    if formula_id == 5:  # Cauchy with arbitrary powers
        n = Cp[0]
        for i in range(1, len(C), 2):
            n = n + C[i] * wl ** C[i + 1]
        return n
    if formula_id == 6:  # gases
        n = 1 + Cp[0]
        for i in range(1, len(C), 2):
            n = n + C[i] / (C[i + 1] - wl ** (-2))
        return n
    if formula_id == 7:  # Herzberger
        n = Cp[0] + Cp[1] / (wl ** 2 - 0.028) + Cp[2] / (wl ** 2 - 0.028) ** 2
        for i in range(3, len(C)):
            n = n + C[i] * wl ** (2 * (i - 2))
        return n
    if formula_id == 8:  # retro
        tmp = Cp[0] + Cp[1] * wl ** 2 / (wl ** 2 - Cp[2]) + Cp[3] * wl ** 2
        return np.sqrt((2 * tmp + 1) / (1 - tmp))
    if formula_id == 9:  # exotic
        return np.sqrt(Cp[0] + Cp[1] / (wl ** 2 - Cp[2])
                       + Cp[3] * (wl - Cp[4]) / ((wl - Cp[4]) ** 2 + Cp[5]))
    raise ValueError(
        f'unknown refractiveindex.info dispersion formula {formula_id}')
