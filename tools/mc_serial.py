"""Serial golden-model MC for the static uniform slab (zonly traversal).

A direct, trusted transcription of the reference photon loop for the
plane-parallel Neufeld problem: point source at center, uniform T, no dust,
no velocity, xy-periodic slab (reference: src/run_simulation_mod.f90:134-205,
src/raytrace_car.f90:2519-2677, src/scattering_car.f90:660-830).  Used as the
cross-implementation parity check for the batched TPU engine (the analogue of
the reference's Cartesian-vs-AMR agreement tests).
"""

import numpy as np
from scipy.special import wofz


def voigt(x, a):
    return wofz(x + 1j * a).real


def rand_vz(rng, x0in, a):
    """Rejection sampler for f(u) ~ exp(-u^2)/((x0-u)^2+a^2) (ZM02 envelope,
    adequate for a golden model -- correctness over speed)."""
    x0 = abs(x0in)
    # Laursen u0
    if x0 < 0.2:
        u0 = 0.0
    else:
        loga = np.log(a)
        xcw = 1.59 - (0.60 + 0.03 * loga) * loga
        if x0 < xcw:
            u0 = x0 - 0.01 * a ** (1 / 6) * np.exp(1.2 * x0)
        else:
            u0 = 4.5
    th0 = np.arctan((u0 - x0) / a)
    p = (th0 + np.pi / 2) / ((np.pi / 2 + th0)
                             + np.exp(-u0 ** 2) * (np.pi / 2 - th0))
    while True:
        if rng.random() <= p:
            th = (th0 + np.pi / 2) * rng.random() - np.pi / 2
            u = a * np.tan(th) + x0
            if rng.random() <= np.exp(-u * u):
                break
        else:
            th = (np.pi / 2 - th0) * rng.random() + th0
            u = a * np.tan(th) + x0
            if rng.random() <= np.exp(-u * u + u0 * u0):
                break
    return u if x0in >= 0 else -u


def run_slab(nphotons, taumax, T=10.0, nz=65, nxfreq=121, xmax_freq=None,
             seed=0, a=None, vtherm1=0.12895319011972164 / np.sqrt(1.00797),
             damping=6.2649e8, wavelength0=0.1215668237310):
    """Returns (xfreq_centers, Jout_counts, mean_nscatt)."""
    rng = np.random.default_rng(seed)
    vtherm = vtherm1 * np.sqrt(T)
    Dfreq = vtherm / (wavelength0 * 1e-9)      # um -> km
    if a is None:
        a = damping / (4 * np.pi) / Dfreq
    zmax = 1.0
    dz = 2.0 * zmax / nz
    H0 = voigt(0.0, a)
    # opacity normalization: tau(line center, z=0 -> edge) = taumax
    rhokap0 = taumax / (H0 * zmax)

    if xmax_freq is None:
        atau3 = (a * taumax) ** (1 / 3)
        xmax_freq = np.floor(5 * atau3) + 1 if taumax > 5e3 else \
            np.floor((25 if taumax <= 50 else 14 if taumax <= 500 else 10)
                     * atau3) + 1
    xmin_freq = -xmax_freq
    dxf = (xmax_freq - xmin_freq) / nxfreq
    Jout = np.zeros(nxfreq)
    nscatt_tot = 0.0

    def tau_to_edge(z, kz, x):
        """Optical depth from z to the slab edge along kz (uniform medium)."""
        if kz > 0:
            dist = (zmax - z) / kz
        elif kz < 0:
            dist = (-zmax - z) / (-abs(kz))
            dist = (z + zmax) / abs(kz)
        else:
            return np.inf
        return rhokap0 * voigt(x, a) * dist

    def fly(z, kz, x, tau_target):
        """Return (escaped, z_new).  Uniform static slab: opacity const."""
        if abs(kz) < 1e-12:
            return False, z
        rho = rhokap0 * voigt(x, a)
        dist = tau_target / rho
        zn = z + dist * kz
        if zn > zmax or zn < -zmax:
            return True, zn
        return False, zn

    for ip in range(nphotons):
        z = 0.0
        cost = 2 * rng.random() - 1
        kz = cost
        x = rand_voigt_freq(rng, a)
        wgt = 1.0
        nscatt = 0.0

        # forced first scattering
        tau0 = tau_to_edge(z, kz, x) if kz != 0 else np.inf
        ix = int(np.floor((x - xmin_freq) / dxf))
        if 0 <= ix < nxfreq:
            Jout[ix] += wgt * np.exp(-min(tau0, 700))
        wgt1 = 1 - np.exp(-min(tau0, 700))
        wgt *= wgt1
        tau = -np.log(1 - rng.random() * wgt1) if tau0 > 0 else np.inf

        inside = True
        while inside:
            escaped, z = fly(z, kz, x, tau)
            if escaped:
                ix = int(np.floor((x - xmin_freq) / dxf))
                if 0 <= ix < nxfreq:
                    Jout[ix] += wgt
                inside = False
                break
            # resonance scatter
            nscatt += wgt
            uz = rand_vz(rng, x, a)
            x_atom = x - uz
            # dipole E1=1
            xi = rng.random()
            p2 = np.sqrt(3.0)  # (4-1)/(3*1) = 1 -> sqrt(1)=1? careful below
            # P(mu) = 3/8 mu^2 + 3/8 for E1=1
            Q = (4 * xi - 2) / (1 * 1.0)
            # solve via Cardano with p2 = sqrt((4-E1)/(3E1)) = 1
            W = np.cbrt(Q + np.sqrt(Q * Q + 1))
            cost_s = (W - 1 / W)
            cost_s = max(-1.0, min(1.0, cost_s))
            sint_s = np.sqrt(1 - cost_s ** 2)
            phi = 2 * np.pi * rng.random()
            phi2 = 2 * np.pi * rng.random()
            uxy = np.sqrt(-np.log(rng.random()))
            ux, uy = uxy * np.cos(phi2), uxy * np.sin(phi2)
            x = x_atom + uz * cost_s + (ux * np.cos(phi) + uy * np.sin(phi)) * sint_s
            # new direction: only kz matters for the 1-D slab; rotate
            kz_old = kz
            kr = np.sqrt(max(1 - kz_old ** 2, 1e-30))
            kz = cost_s * kz_old - sint_s * np.cos(phi) * kr
            nrm = np.sqrt(kz ** 2 + (1 - kz ** 2))  # kz bounded anyway
            kz = max(-1.0, min(1.0, kz))
            tau = -np.log(rng.random())
        nscatt_tot += nscatt

    xf = xmin_freq + (np.arange(nxfreq) + 0.5) * dxf
    return xf, Jout, nscatt_tot / nphotons, dxf


def rand_voigt_freq(rng, a):
    return a * np.tan(np.pi * rng.random() - np.pi / 2) \
        + rng.normal() / np.sqrt(2)


if __name__ == '__main__':
    import sys
    nph = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    tau = float(sys.argv[2]) if len(sys.argv) > 2 else 1e4
    T = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    xf, J, ns, dxf = run_slab(nph, tau, T=T, seed=1)
    print(f"tau0={tau} T={T}: <N_scatt> = {ns:.2f}")
    print(f"escaped weight fraction = {J.sum() / nph:.4f}")


def run_sphere(nphotons, taumax, T=1e4, nxfreq=121, xmax_freq=None, seed=0,
               vtherm1=0.12895319011972164 / np.sqrt(1.00797),
               damping=6.2649e8, wavelength0=0.1215668237310):
    """Golden model: uniform static sphere (analytic boundary, no grid),
    point source at center, dipole resonance scattering, FFS.
    Returns (xfreq_centers, Jout_counts, mean_nscatt, dxf)."""
    rng = np.random.default_rng(seed)
    vtherm = vtherm1 * np.sqrt(T)
    Dfreq = vtherm / (wavelength0 * 1e-9)
    a = damping / (4 * np.pi) / Dfreq
    rmax = 1.0
    H0 = voigt(0.0, a)
    rhokap0 = taumax / (H0 * rmax)

    if xmax_freq is None:
        atau3 = (a * taumax) ** (1 / 3)
        xscale = 25 if taumax <= 50 else 14 if taumax <= 500 else \
            10 if taumax <= 5e3 else 5
        xmax_freq = np.floor(xscale * atau3) + 1
    xmin_freq = -xmax_freq
    dxf = (xmax_freq - xmin_freq) / nxfreq
    Jout = np.zeros(nxfreq)
    nscatt_tot = 0.0

    def dist_to_surface(p, k):
        b = p @ k
        det = b * b - (p @ p - rmax ** 2)
        return -b + np.sqrt(max(det, 0.0))

    def iso_dir(rng):
        c = 2 * rng.random() - 1
        s = np.sqrt(1 - c * c)
        ph = 2 * np.pi * rng.random()
        return np.array([s * np.cos(ph), s * np.sin(ph), c])

    for ip in range(nphotons):
        p = np.zeros(3)
        k = iso_dir(rng)
        x = rand_voigt_freq(rng, a)
        wgt = 1.0
        nscatt = 0.0

        tau0 = rhokap0 * voigt(x, a) * dist_to_surface(p, k)
        ix = int(np.floor((x - xmin_freq) / dxf))
        if 0 <= ix < nxfreq:
            Jout[ix] += wgt * np.exp(-min(tau0, 700))
        wgt1 = 1 - np.exp(-min(tau0, 700))
        wgt *= wgt1
        tau = -np.log(1 - rng.random() * wgt1) if tau0 > 0 else np.inf

        while True:
            rho = rhokap0 * voigt(x, a)
            dist = tau / rho
            dsurf = dist_to_surface(p, k)
            if dist >= dsurf:
                ix = int(np.floor((x - xmin_freq) / dxf))
                if 0 <= ix < nxfreq:
                    Jout[ix] += wgt
                break
            p = p + dist * k
            nscatt += wgt
            uz = rand_vz(rng, x, a)
            x_atom = x - uz
            xi = rng.random()
            Q = (4 * xi - 2)
            W = np.cbrt(Q + np.sqrt(Q * Q + 1))
            cost_s = max(-1.0, min(1.0, W - 1 / W))
            sint_s = np.sqrt(1 - cost_s ** 2)
            phi = 2 * np.pi * rng.random()
            phi2 = 2 * np.pi * rng.random()
            uxy = np.sqrt(-np.log(rng.random()))
            ux, uy = uxy * np.cos(phi2), uxy * np.sin(phi2)
            x = x_atom + uz * cost_s + (ux * np.cos(phi)
                                        + uy * np.sin(phi)) * sint_s
            # rotate direction about k (reference formula)
            cosp, sinp = np.cos(phi), np.sin(phi)
            kx1, ky1, kz1 = k
            if abs(kz1) >= 0.99999999999:
                k = np.array([sint_s * cosp, sint_s * sinp,
                              cost_s if kz1 > 0 else -cost_s])
            else:
                kr = np.sqrt(kx1 ** 2 + ky1 ** 2)
                k = np.array([
                    cost_s * kx1 + sint_s * (kz1 * kx1 * cosp - ky1 * sinp) / kr,
                    cost_s * ky1 + sint_s * (kz1 * ky1 * cosp + kx1 * sinp) / kr,
                    cost_s * kz1 - sint_s * cosp * kr])
            k /= np.linalg.norm(k)
            tau = -np.log(rng.random())
        nscatt_tot += nscatt

    xf = xmin_freq + (np.arange(nxfreq) + 0.5) * dxf
    return xf, Jout, nscatt_tot / nphotons, dxf
