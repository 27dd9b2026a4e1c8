"""First-order (Gaussian) optics conversions.

Rebuild of ``prysm/thinlens.py``: scalar/array relations between object and
image distances, focal lengths, F-numbers, NA, magnification, defocus and
image displacement, plus thick-singlet and two-lens systems.  All pure jnp,
so they trace, batch, and differentiate.
"""
import jax.numpy as jnp


def object_to_image_dist(efl, object_distance):
    """Image distance from the thin lens equation (object distance < 0)."""
    ret = 1 / efl + 1 / object_distance
    return 1 / ret


def image_to_object_dist(efl, image_distance):
    """Object distance from the thin lens equation."""
    ret = 1 / efl - 1 / image_distance
    return 1 / ret


def object_image_to_efl(object_distance, image_distance):
    """EFL from object and image distances."""
    power = 1 / image_distance - 1 / object_distance
    return 1 / power


def efl_to_power(efl, n=1):
    """Optical power from focal length (in medium of index n)."""
    return n / efl


def power_to_efl(power, n=1):
    """Focal length from optical power (in medium of index n)."""
    return n / power


def efl_to_fno(efl, epd):
    """F/# from focal length and entrance pupil diameter."""
    return abs(efl) / epd


def fno_to_efl(fno, epd):
    """Focal length from F/# and entrance pupil diameter."""
    return fno * epd


def fno_to_epd(fno, efl):
    """Entrance pupil diameter from F/# and focal length."""
    return abs(efl) / fno


def image_dist_epd_to_na(image_distance, epd):
    """Numerical aperture from image distance and pupil diameter."""
    rho = epd / 2
    marginal_ray_angle = jnp.abs(jnp.arctan2(rho, image_distance))
    return jnp.sin(marginal_ray_angle)


def image_dist_epd_to_fno(image_distance, epd):
    """Working F/# from image distance and pupil diameter."""
    na = image_dist_epd_to_na(image_distance, epd)
    return na_to_fno(na)


def fno_to_na(fno):
    """NA from F/# (paraxial)."""
    return 1 / (2 * fno)


def na_to_fno(na):
    """F/# from NA (paraxial)."""
    return 1 / (2 * na)


def object_dist_to_mag(efl, object_dist):
    """Lateral magnification from focal length and object distance."""
    return efl / (efl - object_dist)


def mag_to_object_dist(efl, mag):
    """Object distance from focal length and magnification."""
    return efl * (1 - 1 / mag)


def mag_to_image_dist(efl, mag):
    """Image distance from focal length and magnification."""
    return efl * (1 - mag)


def linear_to_long_mag(lateral_mag):
    """Longitudinal magnification from lateral magnification."""
    return lateral_mag ** 2


def mag_to_fno(mag, infinite_fno, pupil_mag=1):
    """Working F/# from magnification and infinite-conjugate F/#."""
    return (1 + abs(mag) / pupil_mag) * infinite_fno


def defocus_to_image_displacement(W020, fno, wavelength=None):
    """Image displacement from defocus: 8 F# ^2 (lambda) W020."""
    if wavelength is not None:
        return 8 * fno ** 2 * wavelength * W020
    return 8 * fno ** 2 * W020


def image_displacement_to_defocus(dz, fno, wavelength=None):
    """Wavefront defocus from image displacement."""
    if wavelength is not None:
        return dz / (8 * fno ** 2 * wavelength)
    return dz / (8 * fno ** 2)


def image_shift_to_tilt(dx, fno):
    """Wavefront tilt (W111-like) from lateral image shift."""
    return (dx / fno) * 0.5


def tilt_to_image_shift(W111, fno):
    """Lateral image shift from wavefront tilt."""
    return 2 * (W111 * fno)


def singlet_power(c1, c2, t, n, n_ambient=1.):
    """Power of a thick singlet from curvatures, thickness, and index."""
    phi1 = (n - n_ambient) * c1
    phi2 = (n_ambient - n) * c2
    return phi1 + phi2 - t / n * phi1 * phi2


def singlet_efl(c1, c2, t, n, n_ambient=1.):
    """EFL of a thick singlet."""
    phi = singlet_power(c1, c2, t, n, n_ambient)
    return n_ambient / phi


def singlet_bfl(c1, c2, t, n, n_ambient=1.):
    """Back focal length of a thick singlet."""
    phi1 = (n - n_ambient) * c1
    efl = singlet_efl(c1, c2, t, n, n_ambient)
    return efl * (1 - t / n * phi1)


def singlet_ffl(c1, c2, t, n, n_ambient=1.):
    """Front focal length of a thick singlet."""
    phi2 = (n_ambient - n) * c2
    efl = singlet_efl(c1, c2, t, n, n_ambient)
    return -efl * (1 - t / n * phi2)


def twolens_efl(efl1, efl2, separation):
    """EFL of a two-thin-lens system."""
    phi1 = 1 / efl1
    phi2 = 1 / efl2
    phi_tot = phi1 + phi2 - separation * phi1 * phi2
    return 1 / phi_tot


def twolens_power(efl1, efl2, separation):
    """Power of a two-thin-lens system."""
    return 1 / twolens_efl(efl1, efl2, separation)


def twolens_bfl(efl1, efl2, separation):
    """Back focal length of a two-thin-lens system."""
    phi1 = 1 / efl1
    numerator = 1 - separation * phi1
    efl = twolens_efl(efl1, efl2, separation)
    return numerator * efl


def twolens_ffl(efl1, efl2, separation):
    """Front focal length of a two-thin-lens system."""
    phi2 = 1 / efl2
    efl = twolens_efl(efl1, efl2, separation)
    return -efl * (1 - separation * phi2)


def twolens_separation(efl1, efl2, efl):
    """Separation producing a given EFL for two thin lenses."""
    phi1 = 1 / efl1
    phi2 = 1 / efl2
    phi = 1 / efl
    return (phi1 + phi2 - phi) / (phi1 * phi2)
