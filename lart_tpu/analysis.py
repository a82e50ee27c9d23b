"""High-level output analysis: the equivalent of the reference's
python/read_lart.py (`read_lart('run.h5') -> LaRTOutput` with summary and
plot_* methods; reference python/read_lart.py:54-2600).

Reads the HDF5 outputs written by lart_tpu.io.writer (same section schema as
the reference Fortran code), discovers the per-observer `_peel3D` and `_tau`
side files, and provides the plotting utilities used by the reference's
example/benchmark scripts.  matplotlib is imported lazily so headless
pipelines can use the data accessors without a display stack.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np
import h5py

from .io.iofile import open_read

__all__ = ['read_lart', 'LaRTOutput', 'PeelObservation']


def _attrs(g) -> Dict:
    return {k: (v.item() if hasattr(v, 'item') and getattr(v, 'ndim', 0) == 0
                else v) for k, v in g.attrs.items()}


def _plt():
    import matplotlib
    if not os.environ.get('DISPLAY'):
        matplotlib.use('Agg', force=False)
    import matplotlib.pyplot as plt
    return plt


@dataclass
class PeelObservation:
    """One observer's peel cubes (PeelObservation,
    reference python/read_lart.py:54-219)."""
    filename: str
    header: Dict
    scatt: np.ndarray                    # (nxfreq, nxim, nyim) | (nxfreq, npix)
    direc: np.ndarray
    stokes: Dict[str, np.ndarray] = field(default_factory=dict)
    radial: Optional[Dict] = None
    healpix: bool = False

    @property
    def total(self) -> np.ndarray:
        return self.scatt + self.direc

    @property
    def npix(self) -> int:
        return int(np.prod(self.scatt.shape[1:]))

    @property
    def mu(self) -> Optional[float]:
        """Viewing-direction cosine of this observer (PeelObservation.mu,
        reference read_lart.py:103-111): z-component of the unit vector
        toward the observer, from the OBSX/Y/Z header keywords."""
        h = self.header or {}
        if 'OBSZ' not in h:
            return None
        v = np.array([h.get('OBSX', 0.0), h.get('OBSY', 0.0), h['OBSZ']],
                     np.float64)
        n = np.linalg.norm(v)
        return float(v[2] / n) if n > 0 else None

    def average_spectrum(self, component: str = 'total') -> np.ndarray:
        """Spatially integrated spectrum of a component
        ('total'|'scatt'|'direc')."""
        cube = getattr(self, 'total' if component == 'total' else component)
        return cube.reshape(cube.shape[0], -1).sum(axis=1)

    def moment0(self, component: str = 'total') -> np.ndarray:
        cube = getattr(self, 'total' if component == 'total' else component)
        return cube.sum(axis=0)

    def velocity_moment_map(self, velocity: np.ndarray, order: int = 1,
                            component: str = 'total') -> np.ndarray:
        """Flux-weighted velocity moment map (velocity_moment_map,
        read_lart.py:116-218)."""
        cube = getattr(self, 'total' if component == 'total' else component)
        m0 = cube.sum(axis=0)
        with np.errstate(invalid='ignore', divide='ignore'):
            m1 = np.tensordot(velocity, cube, axes=(0, 0)) / m0
            if order == 1:
                return np.where(m0 > 0, m1, np.nan)
            dv2 = np.tensordot(velocity[:, None, None] ** 2
                               if cube.ndim == 3 else velocity[:, None] ** 2,
                               cube, axes=(0, 0)) / m0 - m1 ** 2
            return np.where(m0 > 0, np.sqrt(np.maximum(dv2, 0.0)), np.nan)

    # --- spectral-cube helpers (the surface the reference's MUSE/DL2008
    #     example plot scripts consume: read_lart.py slicing +
    #     astropy.convolution usage in examples/SSH_MUSE/plot_muse_*.py)

    def sb_map(self, component: str = 'total', xsel=None) -> np.ndarray:
        """Surface-brightness map: the cube integrated over a frequency
        window.  xsel is a boolean mask or (i0, i1) slice pair over the
        frequency axis; None integrates everything (= moment0)."""
        cube = getattr(self, 'total' if component == 'total' else component)
        if xsel is None:
            return cube.sum(axis=0)
        if isinstance(xsel, tuple):
            return cube[xsel[0]:xsel[1]].sum(axis=0)
        return cube[np.asarray(xsel, bool)].sum(axis=0)

    def aperture_spectrum(self, r_pix: float,
                          component: str = 'total') -> np.ndarray:
        """Spectrum summed over pixels within ``r_pix`` of image center."""
        cube = getattr(self, 'total' if component == 'total' else component)
        if cube.ndim != 3:
            raise ValueError('aperture_spectrum needs an image cube')
        ny, nx = cube.shape[1:]
        yy, xx = np.indices((ny, nx)) + 0.5
        r = np.hypot(xx - nx / 2.0, yy - ny / 2.0)
        m = r <= r_pix
        return cube[:, m].sum(axis=1)

    def _psf_kernel(self, fwhm_pix: float, kind: str, beta: float):
        half = max(int(np.ceil(fwhm_pix * 3)), 2)
        yy, xx = np.indices((2 * half + 1, 2 * half + 1)) - half
        r2 = xx ** 2 + yy ** 2
        if kind == 'moffat':
            # core width alpha from FWHM = 2 alpha sqrt(2^(1/beta)-1)
            alpha = fwhm_pix / (2.0 * np.sqrt(2.0 ** (1.0 / beta) - 1.0))
            k = (1.0 + r2 / alpha ** 2) ** (-beta)
        else:
            sig = fwhm_pix / (2.0 * np.sqrt(2.0 * np.log(2.0)))
            k = np.exp(-0.5 * r2 / sig ** 2)
        return k / k.sum()

    def convolve_psf(self, fwhm_pix: float, kind: str = 'gaussian',
                     beta: float = 2.5) -> 'PeelObservation':
        """Return a copy with every plane convolved by a Gaussian or
        Moffat PSF (the seeing-matching step of the reference's MUSE
        comparison, examples/SSH_MUSE/plot_muse_profiles.py which uses
        Moffat2DKernel).  Flux-conserving; frequency axis untouched."""
        from scipy.signal import fftconvolve
        k = self._psf_kernel(fwhm_pix, kind, beta)
        # boundary renormalization by the kernel coverage, matching the
        # astropy convolve(normalize_kernel=True) behavior the reference
        # scripts rely on (flux is conserved, not lost off-frame)
        cov = None

        def conv(cube):
            nonlocal cov
            if cube is None or np.ndim(cube) != 3:
                return cube
            if cov is None:
                cov = fftconvolve(np.ones(cube.shape[1:]), k, mode='same')
                cov = np.maximum(cov, 1e-12)
            return fftconvolve(cube, k[None], mode='same') / cov[None]
        out = PeelObservation(
            filename=self.filename, header=dict(self.header),
            scatt=conv(self.scatt), direc=conv(self.direc),
            stokes={kk: conv(v) for kk, v in self.stokes.items()},
            radial=self.radial, healpix=self.healpix)
        return out

    def convolve_spectral(self, fwhm_bins: float) -> 'PeelObservation':
        """Return a copy smoothed along the frequency axis by a Gaussian
        of the given FWHM (in frequency bins) -- the instrument
        resolution-matching step (Gaussian1DKernel in the reference's
        MUSE scripts; R = lambda/dlambda converts to bins upstream)."""
        from scipy.ndimage import gaussian_filter1d
        sig = fwhm_bins / (2.0 * np.sqrt(2.0 * np.log(2.0)))

        def conv(cube):
            if cube is None:
                return cube
            return gaussian_filter1d(np.asarray(cube, np.float64), sig,
                                     axis=0, mode='constant')
        out = PeelObservation(
            filename=self.filename, header=dict(self.header),
            scatt=conv(self.scatt), direc=conv(self.direc),
            stokes={kk: conv(v) for kk, v in self.stokes.items()},
            radial=self.radial, healpix=self.healpix)
        return out

    def radial_sb_profile(self, component: str = 'total', xsel=None,
                          normalize: bool = True, whole_area: bool = False):
        """(r, I(r)) azimuthal average of the SB map (the reference's
        examples/SSH_MUSE/radial_profile.py contract)."""
        return radial_profile(self.sb_map(component, xsel),
                              normalize=normalize, whole_area=whole_area)

    def polarization_radial_profile(self):
        """(r, P) = sqrt(Q^2+U^2)/I from the Stokes radial table when the
        writer recorded one (the DL2008 figure's right panel,
        examples/DL2008/plot_fig.py), else from the Stokes cubes."""
        rad = self.radial or {}
        # writer flavor ('stokes_*', _load_peel) or plain 'r'/'I'/'Q'/'U'
        for rk, pre in (('stokes_radius', 'stokes_'), ('r', '')):
            ks = (rk, pre + 'I', pre + 'Q', pre + 'U')
            if all(k in rad for k in ks):
                r = np.asarray(rad[rk], np.float64)
                I = np.asarray(rad[pre + 'I'], np.float64)
                Q = np.asarray(rad[pre + 'Q'], np.float64)
                U = np.asarray(rad[pre + 'U'], np.float64)
                with np.errstate(invalid='ignore', divide='ignore'):
                    return r, np.where(I > 0, np.hypot(Q, U) / I, np.nan)
        if not all(k in self.stokes for k in ('I', 'Q', 'U')):
            raise ValueError('no Stokes information in this observation')
        rI, pI = radial_profile(self.stokes['I'].sum(axis=0),
                                normalize=False)
        _, pQ = radial_profile(self.stokes['Q'].sum(axis=0),
                               normalize=False)
        _, pU = radial_profile(self.stokes['U'].sum(axis=0),
                               normalize=False)
        with np.errstate(invalid='ignore', divide='ignore'):
            return rI, np.where(pI > 0, np.hypot(pQ, pU) / pI, np.nan)


def radial_profile(data, center=None, normalize: bool = True,
                   whole_area: bool = False):
    """Azimuthally averaged radial profile of a 2-D map.

    Same contract as the reference helper (examples/SSH_MUSE/
    radial_profile.py): pixel (i, j) has center (i+0.5, j+0.5); integer
    radial bins by floor(r); ``whole_area=False`` truncates at the
    largest fully-sampled annulus; ``normalize=True`` rescales r to
    [0, 1] by that maximum."""
    data = np.asarray(data, np.float64)
    ny, nx = data.shape
    if center is None:
        center = [nx / 2.0, ny / 2.0]
    roff = -0.5 if (nx % 2 == 1 and ny % 2 == 1) else 0.0
    yy, xx = np.indices(data.shape) + 0.5
    r = np.hypot(xx - center[0], yy - center[1])
    ridx = np.floor(r - roff).astype(np.int64)
    tbin = np.bincount(ridx.ravel(), weights=data.ravel())
    nbin = np.bincount(ridx.ravel())
    with np.errstate(invalid='ignore', divide='ignore'):
        prof = tbin / nbin
    rarr = np.arange(prof.size, dtype=np.float64)
    xmax = np.max(xx - center[0])
    ymax = np.max(yy - center[1])
    rmax = max(xmax, ymax)
    if not whole_area:
        rmax = min(xmax, ymax)
        keep = rarr <= rmax
        rarr, prof = rarr[keep], prof[keep]
    if normalize:
        rarr = rarr / rmax
    return rarr, prof


@dataclass
class LaRTOutput:
    """All sections of one run (LaRTOutput, read_lart.py:624-785)."""
    filename: str
    header: Dict
    xfreq: np.ndarray
    velocity: np.ndarray
    wavelength: np.ndarray
    Jout: np.ndarray
    Jin: Optional[np.ndarray] = None
    Jabs: Optional[np.ndarray] = None
    Jabs2: Optional[np.ndarray] = None
    Jout_Ha: Optional[np.ndarray] = None
    Jabs_Ha: Optional[np.ndarray] = None
    J2gam: Optional[np.ndarray] = None
    y_2gam: Optional[np.ndarray] = None
    Jmu: Optional[np.ndarray] = None
    Jmu_header: Optional[Dict] = None
    J1: Optional[np.ndarray] = None
    Pa: Optional[np.ndarray] = None
    Pnew: Optional[np.ndarray] = None
    r_JPa: Optional[np.ndarray] = None
    peel: List[PeelObservation] = field(default_factory=list)
    tau_maps: List[Dict] = field(default_factory=list)
    clumps: Optional['ClumpsOutput'] = None

    # ------------------------------------------------------------------
    @property
    def nphotons(self):
        return self.header.get('nphotons')

    @property
    def nscatt_tot(self):
        return self.header.get('Nsc_tot')

    def summary(self) -> str:
        h = self.header

        def fmt(k, f='{:.4g}'):
            v = h.get(k)
            return f.format(v) if v is not None else '-'
        lines = [
            f"file        : {self.filename}",
            f"nphotons    : {fmt('nphotons')}",
            f"temperature : {fmt('temp')} K",
            f"taumax      : {fmt('taumax')}   tauhomo: {fmt('tauhomo')}",
            f"N_gasmax    : {fmt('Ngasmax')}  DGR: {fmt('DGR')}",
            f"<N_scatt>   : {fmt('Nsc_tot', '{:.5g}')} "
            f"(gas {fmt('Nsc_gas')}, dust {fmt('Nsc_dust')})",
            f"exetime     : {fmt('ExeTime', '{:.3f}')} min  "
            f"(nproc {h.get('Nprocs', '-')})",
        ]
        if 'flux_factor' in h:
            lines.append(f"flux_factor : {fmt('flux_factor')}")
        if 'W_conv' in h:
            lines.append(
                f"ly_beta     : W_esc1 {fmt('W_esc1')} W_abs1 {fmt('W_abs1')}"
                f" W_conv {fmt('W_conv')} W_esc2 {fmt('W_esc2')}"
                f" W_abs2 {fmt('W_abs2')}")
        if self.peel:
            lines.append(f"peel        : {len(self.peel)} observer(s), "
                         f"{self.peel[0].scatt.shape}")
        return "\n".join(lines)

    # ------------------------------------------------------------------
    def plot_spectrum(self, ax=None, xaxis: str = 'xfreq', log: bool = False,
                      show_Jin: bool = False, show: bool = False):
        """Emergent spectrum Jout (+Jin/Jabs) vs xfreq|velocity|wavelength
        (plot_spectrum, read_lart.py:786-913)."""
        plt = _plt()
        if ax is None:
            _, ax = plt.subplots()
        x = {'xfreq': self.xfreq, 'velocity': self.velocity,
             'wavelength': self.wavelength}[xaxis]
        ax.step(x, self.Jout, where='mid', label='Jout')
        if show_Jin and self.Jin is not None:
            ax.step(x, self.Jin, where='mid', label='Jin', alpha=0.6)
        if self.Jabs is not None and np.any(self.Jabs > 0):
            ax.step(x, self.Jabs, where='mid', label='Jabs', alpha=0.6)
        if log:
            ax.set_yscale('log')
        ax.set_xlabel({'xfreq': r'$x$', 'velocity': 'velocity [km/s]',
                       'wavelength': r'wavelength [$\AA$]'}[xaxis])
        ax.set_ylabel(r'$J$')
        ax.legend()
        if show:
            plt.show()
        return ax

    def plot_lyb_budget(self, ax=None, show: bool = False):
        """Ly-beta weight budget bars: W_esc1 + W_abs1 + W_conv = 1 and
        W_esc2 + W_abs2 = W_conv (plot_lyb_budget, read_lart.py:981-1031)."""
        plt = _plt()
        if ax is None:
            _, ax = plt.subplots()
        h = self.header
        keys = ['W_esc1', 'W_abs1', 'W_conv', 'W_esc2', 'W_abs2']
        vals = [h.get(k, 0.0) for k in keys]
        ax.bar(keys, vals)
        ax.set_ylabel('weight fraction')
        ax.set_title(f"band-1 sum = {vals[0] + vals[1] + vals[2]:.4f}; "
                     f"band-2 sum/W_conv = "
                     f"{(vals[3] + vals[4]) / max(vals[2], 1e-30):.4f}")
        if show:
            plt.show()
        return ax

    def plot_jmu(self, ax=None, show: bool = False):
        """Angle-resolved spectra J(x, mu) (plot_jmu,
        read_lart.py:1032-1179)."""
        plt = _plt()
        if ax is None:
            _, ax = plt.subplots()
        if self.Jmu is None:
            raise ValueError('run had save_Jmu=False')
        nmu = self.Jmu.shape[1]
        for i in range(nmu):
            ax.step(self.xfreq, self.Jmu[:, i], where='mid',
                    label=f'mu bin {i}', alpha=0.8)
        ax.step(self.xfreq, self.Jout, 'k', where='mid', lw=2, label='Jout')
        ax.set_xlabel(r'$x$')
        ax.set_ylabel(r'$J(x,\mu)$')
        ax.legend(fontsize=6, ncol=2)
        if show:
            plt.show()
        return ax

    def plot_J_profile(self, ax=None, log: bool = True, show: bool = False):
        """CALCJ mean-intensity profile J(r) or J(z) (plot_J_profile,
        read_lart.py:1234-1262)."""
        plt = _plt()
        if ax is None:
            _, ax = plt.subplots()
        if self.J1 is None:
            raise ValueError('run had calcJ=False')
        prof = self.J1.sum(axis=0)
        x = self.r_JPa if self.r_JPa is not None \
            else np.arange(prof.shape[0])
        ax.plot(x, prof)
        if log:
            ax.set_yscale('log')
        ax.set_xlabel('r (or z) [code units]')
        ax.set_ylabel(r'$J$')
        if show:
            plt.show()
        return ax

    def plot_Pa_profile(self, ax=None, which: str = 'auto', log: bool = True,
                        show: bool = False):
        """CALCP scattering-rate profile P_alpha (plot_Pa_profile,
        read_lart.py:1263-1293)."""
        plt = _plt()
        if ax is None:
            _, ax = plt.subplots()
        prof = self.Pnew if (which in ('auto', 'new')
                             and self.Pnew is not None) else self.Pa
        if prof is None:
            raise ValueError('run had calcP/calcPnew=False')
        x = self.r_JPa if self.r_JPa is not None \
            else np.arange(prof.shape[0])
        ax.plot(x, prof)
        if log:
            ax.set_yscale('log')
        ax.set_xlabel('r (or z) [code units]')
        ax.set_ylabel(r'$P_\alpha$')
        if show:
            plt.show()
        return ax

    def plot_peeling_map(self, iobs: int = 0, component: str = 'total',
                         ax=None, log: bool = True, show: bool = False):
        """Frequency-integrated peel image (plot_peeling_map,
        read_lart.py:1699-1976)."""
        plt = _plt()
        if ax is None:
            _, ax = plt.subplots()
        p = self.peel[iobs]
        img = p.moment0(component)
        if p.healpix:
            ax.plot(img.ravel())
            ax.set_xlabel('HEALPix RING pixel')
            ax.set_ylabel('intensity')
        else:
            from matplotlib.colors import LogNorm
            pos = img[img > 0]
            norm = LogNorm(vmin=pos.min(), vmax=pos.max()) \
                if (log and pos.size) else None
            im = ax.imshow(img.T, origin='lower', norm=norm)
            plt.colorbar(im, ax=ax)
        if show:
            plt.show()
        return ax

    def plot_peeling_spectrum(self, iobs: int = 0, ax=None,
                              xaxis: str = 'xfreq', show: bool = False):
        """Spatially integrated peel spectrum vs the Jout spectrum
        (plot_peeling_spectrum, read_lart.py:1977-2215)."""
        plt = _plt()
        if ax is None:
            _, ax = plt.subplots()
        x = {'xfreq': self.xfreq, 'velocity': self.velocity,
             'wavelength': self.wavelength}[xaxis]
        p = self.peel[iobs]
        ax.step(x, p.average_spectrum('scatt'), where='mid', label='scatt')
        ax.step(x, p.average_spectrum('direc'), where='mid', label='direc')
        ax.step(x, p.average_spectrum('total'), where='mid', label='total')
        ax.legend()
        if show:
            plt.show()
        return ax

    def plot_peeling_radial_profile(self, iobs: int = 0, ax=None,
                                    log: bool = True, show: bool = False):
        """Radial surface-brightness profile from the peel image
        (plot_peeling_radial_profile, read_lart.py:2216-2438)."""
        plt = _plt()
        if ax is None:
            _, ax = plt.subplots()
        p = self.peel[iobs]
        if p.radial is not None:
            ax.plot(p.radial['radius'], p.radial['I'])
        else:
            img = p.moment0()
            ny, nx_ = img.shape
            yy, xx = np.indices(img.shape)
            r = np.hypot(xx - nx_ / 2.0 + 0.5, yy - ny / 2.0 + 0.5)
            nb = min(nx_, ny) // 2
            idx = np.clip(r.astype(int), 0, nb - 1)
            prof = np.bincount(idx.ravel(), img.ravel(), nb) \
                / np.maximum(np.bincount(idx.ravel(), None, nb), 1)
            ax.plot(np.arange(nb) + 0.5, prof)
        if log:
            ax.set_yscale('log')
        ax.set_xlabel('radius [pixels]')
        ax.set_ylabel('I')
        if show:
            plt.show()
        return ax

    def plot_velocity_moment_map(self, iobs: int = 0, order: int = 1,
                                 component: str = 'total', ax=None,
                                 show: bool = False):
        """Flux-weighted velocity-moment map of a peel cube
        (plot_velocity_moment_map, read_lart.py:1453-1698): order 1 =
        mean velocity (kinematics), order 2 = dispersion."""
        plt = _plt()
        if ax is None:
            _, ax = plt.subplots()
        p = self.peel[iobs]
        m = p.velocity_moment_map(self.velocity, order=order,
                                  component=component)
        im = ax.imshow(m.T, origin='lower',
                       cmap='RdBu_r' if order == 1 else 'viridis')
        plt.colorbar(im, ax=ax,
                     label=('<v> [km/s]' if order == 1
                            else 'sigma_v [km/s]'))
        ax.set_title(f'obs {iobs} moment-{order} ({component})')
        if show:
            plt.show()
        return ax

    def plot_peel_jmu_compare(self, iobs: int = 0, ax=None, log: bool = False,
                              show: bool = False):
        """Consistency check: the peel spectrum toward observer iobs vs
        the Jmu slice at the observer's mu (plot_peel_jmu_compare,
        read_lart.py:1294-1452) -- the two estimators of the same
        emergent intensity must agree to MC noise."""
        plt = _plt()
        if ax is None:
            _, ax = plt.subplots()
        p = self.peel[iobs]
        spec = p.average_spectrum()
        n1 = np.trapezoid(spec, self.xfreq)
        ax.plot(self.xfreq, spec / max(n1, 1e-300), label='peel')
        if self.Jmu is not None:
            jmu = self.Jmu if self.Jmu.ndim == 2 else \
                self.Jmu.reshape(len(self.xfreq), -1)
            nmu = jmu.shape[1]
            hdr = self.Jmu_header or {}
            mu_min = float(hdr.get('mu_min', -1.0))
            dmu = (1.0 - mu_min) / nmu
            mu_obs = float(np.clip(p.mu if hasattr(p, 'mu') and p.mu
                                   is not None else 1.0, mu_min, 1.0 - 1e-9))
            imu = int((mu_obs - mu_min) / dmu)
            sl = jmu[:, imu]
            n2 = np.trapezoid(sl, self.xfreq)
            ax.plot(self.xfreq, sl / max(n2, 1e-300), ':',
                    label=f'Jmu (mu bin {imu})')
        if log:
            ax.set_yscale('log')
        ax.set_xlabel('x')
        ax.legend()
        if show:
            plt.show()
        return ax


# ---------------------------------------------------------------------------

@dataclass
class ClumpsOutput:
    """A clump-population file loaded into arrays + attributes
    (ClumpsOutput, reference python/read_lart.py:220-623).  Standalone
    (no run output required) or attached to a LaRTOutput via `clumps`."""
    clumps_file: str
    pos: np.ndarray = None            # (N, 3) centers, code units
    radius: Optional[np.ndarray] = None
    rhokap: Optional[np.ndarray] = None
    vel: Optional[np.ndarray] = None
    attrs: Dict = field(default_factory=dict)

    def attr(self, name, default=None):
        for k, v in self.attrs.items():
            if k.upper() == name.upper():
                return v
        return default

    @property
    def n_clumps(self) -> int:
        return len(self.pos)

    @property
    def sphere_r(self) -> float:
        return float(self.attr('SPHERE_R', 0.0))

    def compute_f_vol(self) -> float:
        """Volume filling factor sum(4/3 pi r^3) / V_sphere (clump_mod.f90
        population diagnostics; ignores overlap like the reference)."""
        R = self.sphere_r
        if not R or self.radius is None:
            return float('nan')
        return float(np.sum(self.radius ** 3) / R ** 3)

    def compute_f_cov(self) -> float:
        """Mean number of clumps per central sightline sum(pi r^2)/(4 R^2)."""
        R = self.sphere_r
        if not R or self.radius is None:
            return float('nan')
        return float(np.sum(self.radius ** 2) / (4.0 * R ** 2))

    @property
    def f_vol(self) -> float:
        v = self.attr('F_VOL')
        return float(v) if v is not None else self.compute_f_vol()

    @property
    def f_cov(self) -> float:
        v = self.attr('F_COV')
        return float(v) if v is not None else self.compute_f_cov()

    def summary(self) -> str:
        return "\n".join([
            f"clumps file : {self.clumps_file}",
            f"n_clumps    : {self.n_clumps}",
            f"sphere_R    : {self.sphere_r:.4g}   "
            f"r_min: {float(self.attr('R_MIN', 0.0)):.4g}",
            f"radius      : mean {np.mean(self.radius):.4g}"
            if self.radius is not None else "radius      : -",
            f"f_vol       : {self.f_vol:.4g}   f_cov: {self.f_cov:.4g}",
        ])

    def plot_clump_slice(self, axis: str = 'z', coord: float = 0.0,
                         ax=None, color_by: Optional[str] = 'rhokap',
                         show: bool = False):
        """Clumps intersecting the plane <axis>=coord, drawn as circles of
        the chord radius (plot_clump_slice, read_lart.py:418-623)."""
        plt = _plt()
        if ax is None:
            _, ax = plt.subplots(figsize=(6, 6))
        iax = 'xyz'.index(axis)
        jax_, kax = [i for i in range(3) if i != iax]
        d = np.abs(self.pos[:, iax] - coord)
        r = self.radius if self.radius is not None \
            else np.full(self.n_clumps, float(self.attr('RCL', 0.0)))
        sel = d < r
        rr = np.sqrt(np.maximum(r[sel] ** 2 - d[sel] ** 2, 0.0))
        cvals = None
        if color_by is not None and getattr(self, color_by, None) is not None:
            cvals = np.asarray(getattr(self, color_by))[sel]
        from matplotlib.collections import PatchCollection
        from matplotlib.patches import Circle
        patches = [Circle((u, v), rad) for u, v, rad in
                   zip(self.pos[sel, jax_], self.pos[sel, kax], rr)]
        pc = PatchCollection(patches, alpha=0.6)
        if cvals is not None:
            pc.set_array(cvals)
        ax.add_collection(pc)
        R = self.sphere_r or np.abs(self.pos).max()
        ax.set_xlim(-R, R)
        ax.set_ylim(-R, R)
        ax.set_aspect('equal')
        ax.set_xlabel('xyz'[jax_])
        ax.set_ylabel('xyz'[kax])
        ax.set_title(f'{sel.sum()} clumps at {axis}={coord:g}')
        if show:
            plt.show()
        return ax


def read_clumps(path: str) -> ClumpsOutput:
    """Load a clump population file (read_clumps, read_lart.py)."""
    from .grid.clump import load_clumps
    d = load_clumps(path)
    return ClumpsOutput(clumps_file=path, pos=d['pos'],
                        radius=d.get('radius'), rhokap=d.get('rhokap'),
                        vel=d.get('vel'), attrs=d.get('attrs', {}))


def check_flux(out, verbose: bool = True) -> Dict:
    """Weight-conservation budget of a run (python/check_flux.py,
    flux_check.py; Ly-beta budgets README_HOWTO.md:408-410).

    Escaped + absorbed weight must equal the injected weight:
      integral(Jout + Jabs [+ Jabs2]) dx * 4pi == 1 (per photon), and for
      ly_beta runs W_esc1 + W_abs1 + W_conv == 1, W_esc2 + W_abs2 == W_conv.
    Accepts a LaRTOutput or a filename.
    """
    if isinstance(out, str):
        out = read_lart(out)
    h = out.header
    dx = float(h.get('dxfreq', out.xfreq[1] - out.xfreq[0]))
    budget = {}

    def tot(arr):
        return float(np.sum(arr) * dx * 4.0 * np.pi) if arr is not None \
            else 0.0
    budget['F_esc'] = tot(out.Jout)
    budget['F_abs'] = tot(out.Jabs)
    budget['F_abs2'] = tot(out.Jabs2)
    budget['F_in'] = tot(out.Jin)
    closure = budget['F_esc'] + budget['F_abs'] + budget['F_abs2']
    # prefer the raw per-photon weight keywords when the writer recorded
    # them: the normalized spectra carry geometry-dependent luminosity
    # denominators (sphere 2pi*4pi*r^2 vs slab 4pi; tally.normalize), so
    # the 4pi integral above closes to 1 only for slab-normalized runs
    if h.get('W_esc') is not None:
        budget['W_esc'] = float(h['W_esc'])
        budget['W_abs'] = float(h.get('W_abs', 0.0))
        closure = budget['W_esc'] + budget['W_abs']
    for k in ('W_esc1', 'W_abs1', 'W_conv', 'W_esc2', 'W_abs2',
              'W_H2abs', 'W_H2scat'):
        if h.get(k) is not None:
            budget[k] = float(h[k])
    if 'W_conv' in budget:
        # band-1 budget closes to 1; band-2 (Ha) closes to W_conv
        budget['closure_band1'] = (budget['W_esc1'] + budget['W_abs1']
                                   + budget['W_conv'])
        budget['closure_band2'] = (budget['W_esc2'] + budget['W_abs2']
                                   - budget['W_conv'])
        budget['closure'] = budget['closure_band1']
    else:
        budget['closure'] = closure
    if verbose:
        for k, v in budget.items():
            print(f'  {k:15s}: {v:12.6g}')
    return budget


def peel_flux(out, iobs: int = 0) -> Dict:
    """Total flux through a peel image by component, scaled to luminosity
    units (python/check_flux.py logic: scale = 4pi d^2 dOmega_pix bin)."""
    if isinstance(out, str):
        out = read_lart(out)
    p = out.peel[iobs]
    hdr = p.header
    dxim = float(hdr.get('CD1_1', 1.0))
    dyim = float(hdr.get('CD2_2', 1.0))
    dist_cm = float(hdr.get('DIST_CM', 1.0))
    distance = float(hdr.get('DISTANCE', 1.0))
    bin_unit = float(hdr.get('DXFREQ', 1.0))
    flux_factor = float(hdr.get('FLUXFAC', 1.0))
    scale = (4.0 * np.pi * (distance * dxim * np.pi / 180.0)
             * (distance * dyim * np.pi / 180.0) * dist_cm ** 2 * bin_unit)
    res = {'F_scatt': float(p.scatt.sum() * scale),
           'F_direct': float(p.direc.sum() * scale),
           'flux_factor': flux_factor}
    res['F_total'] = res['F_scatt'] + res['F_direct']
    res['F_transit'] = res['F_scatt'] * flux_factor + res['F_direct']
    return res


def _load_peel(path: str) -> PeelObservation:
    with open_read(path) as f:
        hdr = _attrs(f['Scattered'])
        sc = np.asarray(f['Scattered/data'], np.float64)
        dr = np.asarray(f['Direct/data'], np.float64)
        stokes = {}
        for nm in ('I', 'Q', 'U', 'V'):
            key = f'Stokes_{nm}'
            if key in f:
                stokes[nm] = np.asarray(f[f'{key}/data'], np.float64)
        radial = None
        if 'RadialI' in f:
            radial = {'radius': np.asarray(f['RadialI/radius']),
                      'I': np.asarray(f['RadialI/I'])}
        if 'Stokes_radial' in f:
            radial = radial or {}
            for nm in ('radius', 'I', 'Q', 'U', 'V', 'pol'):
                if nm in f['Stokes_radial']:
                    radial[f'stokes_{nm}'] = np.asarray(
                        f[f'Stokes_radial/{nm}'])
        healpix = hdr.get('PIXTYPE') == 'HEALPIX'
    return PeelObservation(filename=path, header=hdr, scatt=sc, direc=dr,
                           stokes=stokes, radial=radial, healpix=healpix)


def parse_input_file(infile: str) -> dict:
    """Parse a `&parameters` namelist into a plain dict of python values
    (parse_input_file, reference python/read_lart.py:2724-2742)."""
    import dataclasses
    from .config import Params
    p = Params.from_namelist(infile)
    return dataclasses.asdict(p)


def output_path_for(infile: str) -> str:
    """Output file named by an input namelist (fits_path_for, reference
    python/read_lart.py:2765-2808): par%out_file resolved relative to the
    input's directory, with the default '<input>.h5' fallback."""
    from .config import Params
    from .io.writer import output_filename
    par = Params.from_namelist(infile)
    out = output_filename(par)
    if not os.path.isabs(out):
        out = os.path.join(os.path.dirname(os.path.abspath(infile)), out)
    return out


def read_lart(path: str) -> LaRTOutput:
    """Load a run: the main output plus any per-observer _peel3D/_tau side
    files sharing its basename (read_lart, reference python/read_lart.py).

    Like the reference, also accepts the input NAMELIST: read_lart('x.in')
    resolves par%out_file and opens that."""
    if path.endswith('.in'):
        path = output_path_for(path)
    with open_read(path) as f:
        g = f['Spectrum']
        header = _attrs(g)
        out = LaRTOutput(
            filename=path, header=header,
            xfreq=np.asarray(g['Xfreq'], np.float64),
            velocity=np.asarray(g['velocity'], np.float64),
            wavelength=np.asarray(g['wavelength'], np.float64),
            Jout=np.asarray(g['Jout'], np.float64),
            Jin=np.asarray(g['Jin'], np.float64) if 'Jin' in g else None,
            Jabs=np.asarray(g['Jabs'], np.float64) if 'Jabs' in g else None,
            Jabs2=np.asarray(g['Jabs2'], np.float64)
            if 'Jabs2' in g else None,
        )
        if 'Jout_Ha' in f:
            out.Jout_Ha = np.asarray(f['Jout_Ha/data'], np.float64)
        if 'Jabs_Ha' in f:
            out.Jabs_Ha = np.asarray(f['Jabs_Ha/data'], np.float64)
        if 'J2gam' in f:
            out.J2gam = np.asarray(f['J2gam/data'], np.float64)
            out.y_2gam = np.asarray(f['J2gam/y'], np.float64)
        if 'Jmu' in f:
            out.Jmu = np.asarray(f['Jmu/data'], np.float64)
            out.Jmu_header = _attrs(f['Jmu'])
        for nm, ext in (('J1', 'Jx_1D'), ('Pa', 'Pa_1D'), ('Pa', 'Pa_3D'),
                        ('Pnew', 'Pa_1D_new')):
            if ext in f:
                setattr(out, nm, np.asarray(f[ext + '/data'], np.float64))
                if 'radius' in f[ext]:
                    out.r_JPa = np.asarray(f[ext + '/radius'], np.float64)
        if out.J1 is not None and out.J1.ndim == 1 and out.r_JPa is not None:
            nb = out.r_JPa.shape[0]
            out.J1 = out.J1.reshape(-1, nb)

    base, ext = os.path.splitext(path)
    for pf in sorted(glob.glob(f'{base}*_peel3D{ext}')
                     + [f'{base}_peel3D{ext}']):
        if os.path.exists(pf):
            out.peel.append(_load_peel(pf))
    # dedupe (the glob can match the suffix-less name twice)
    seen = set()
    out.peel = [p for p in out.peel
                if not (p.filename in seen or seen.add(p.filename))]
    for tf in sorted(glob.glob(f'{base}*_tau{ext}')):
        with open_read(tf) as f:
            out.tau_maps.append(
                {nm: np.asarray(f[nm + '/data'], np.float64)
                 for nm in ('tau_gas', 'N_gas', 'tau_dust') if nm in f})
    return out
