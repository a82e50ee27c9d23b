"""HEALPix ring-scheme pixelization (vectorized, jittable).

Rebuilds the reference's native HEALPix subset (reference:
src/healpix.f90:29-186 -- `vec2pix`, `pix2vec`, `nside2npix`): the RING
scheme on the sphere used by the interior all-sky observer.  Every branch of
the classic algorithm is evaluated with `jnp.where` masks so one call
pixelizes a whole photon batch.

Pixel indices here are 0-based (the reference returns 1-based ids and
subtracts when binning); nside must be a power of two <= 8192.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

TWOTHIRD = 2.0 / 3.0
HALFPI = 0.5 * math.pi
TWOPI = 2.0 * math.pi


def nside2npix(nside: int) -> int:
    if nside < 1 or nside > 8192 or (nside & (nside - 1)) != 0:
        raise ValueError(f'invalid nside {nside} (power of 2, <= 8192)')
    return 12 * nside * nside


def vec2pix_ring(nside: int, vx, vy, vz):
    """RING-scheme pixel id (0-based) containing direction (vx, vy, vz)."""
    norm = jnp.sqrt(vx * vx + vy * vy + vz * vz)
    z = vz / norm
    phi = jnp.arctan2(vy, vx)
    phi = jnp.where(phi < 0.0, phi + TWOPI, phi)
    tt = phi / HALFPI                        # in [0, 4)
    za = jnp.abs(z)

    nl2 = 2 * nside
    nl4 = 4 * nside
    ncap = nl2 * (nside - 1)
    npix = 12 * nside * nside

    # --- equatorial region
    jp = jnp.floor(nside * (0.5 + tt - z * 0.75)).astype(jnp.int32)
    jm = jnp.floor(nside * (0.5 + tt + z * 0.75)).astype(jnp.int32)
    ir = nside + 1 + jp - jm                 # ring index from z = 2/3
    kshift = jnp.where(ir % 2 == 0, 1, 0)
    ip = (jp + jm - nside + kshift + 1) // 2 + 1
    ip = jnp.where(ip > nl4, ip - nl4, ip)
    pix_eq = ncap + nl4 * (ir - 1) + ip

    # --- polar caps
    tp = tt - jnp.floor(tt)
    tmp = nside * jnp.sqrt(3.0 * (1.0 - za))
    jpc = jnp.floor(tp * tmp).astype(jnp.int32)
    jmc = jnp.floor((1.0 - tp) * tmp).astype(jnp.int32)
    irc = jpc + jmc + 1
    ipc = jnp.floor(tt * irc).astype(jnp.int32) + 1
    ipc = jnp.where(ipc > 4 * irc, ipc - 4 * irc, ipc)
    pix_n = 2 * irc * (irc - 1) + ipc
    pix_s = npix - 2 * irc * (irc + 1) + ipc

    pix_cap = jnp.where(z > 0.0, pix_n, pix_s)
    pix1 = jnp.where(za <= TWOTHIRD, pix_eq, pix_cap)   # 1-based
    return (pix1 - 1).astype(jnp.int32)


def pix2vec_ring(nside: int, ipix):
    """Unit vector of the center of 0-based RING pixel ipix."""
    ipix1 = jnp.asarray(ipix, jnp.int32) + 1          # 1-based as reference
    npix = 12 * nside * nside
    nl2 = 2 * nside
    nl4 = 4 * nside
    ncap = 2 * nside * (nside - 1)
    fact1 = 1.5 * nside
    fact2 = 3.0 * nside * nside

    # north polar cap
    hip = ipix1 / 2.0
    fihip = jnp.floor(hip)
    iring_n = jnp.floor(jnp.sqrt(jnp.maximum(hip - jnp.sqrt(fihip), 0.0))
                        ).astype(jnp.int32) + 1
    iphi_n = ipix1 - 2 * iring_n * (iring_n - 1)
    z_n = 1.0 - iring_n * iring_n / fact2
    phi_n = (iphi_n - 0.5) * math.pi / (2.0 * iring_n)

    # equatorial region
    ipe = ipix1 - ncap - 1
    iring_e = ipe // nl4 + nside
    iphi_e = ipe % nl4 + 1
    fodd = 0.5 * (1 + (iring_e + nside) % 2)
    z_e = (nl2 - iring_e) / fact1
    phi_e = (iphi_e - fodd) * math.pi / (2.0 * nside)

    # south polar cap
    ips = npix - ipix1 + 1
    hips = ips / 2.0
    fihips = jnp.floor(hips)
    iring_s = jnp.floor(jnp.sqrt(jnp.maximum(hips - jnp.sqrt(fihips), 0.0))
                        ).astype(jnp.int32) + 1
    iphi_s = 4 * iring_s + 1 - (ips - 2 * iring_s * (iring_s - 1))
    z_s = -1.0 + iring_s * iring_s / fact2
    phi_s = (iphi_s - 0.5) * math.pi / (2.0 * iring_s)

    in_n = ipix1 <= ncap
    in_e = jnp.logical_and(~in_n, ipix1 <= nl2 * (5 * nside + 1))
    z = jnp.where(in_n, z_n, jnp.where(in_e, z_e, z_s))
    phi = jnp.where(in_n, phi_n, jnp.where(in_e, phi_e, phi_s))
    sth = jnp.sqrt(jnp.maximum((1.0 - z) * (1.0 + z), 0.0))
    return sth * jnp.cos(phi), sth * jnp.sin(phi), z
