"""Tabulated Mueller-matrix dust scattering (WD01 dust, MW/LMC/SMC).

Rebuilds setup_scattering_matrix (reference: src/setup.f90:581-649) and the
table samplers (random_mt.f90 rand_alias_linear): load the (cos, S11, S12,
S33, S34) table, normalize S11 to unit integral over cos, build the per-bin
alias table for O(1) cos(theta) sampling with piecewise-linear inversion
inside the chosen bin, and interpolate S elements on device via uniform-grid
gathers (the tables are equally spaced in cos).
"""

from __future__ import annotations

import dataclasses
import os
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .samplers import build_alias_table

DATA_DIR = os.path.join(os.path.dirname(__file__), '..', 'data')


class MuellerDevice(NamedTuple):
    coss: jnp.ndarray       # (n,)
    S11: jnp.ndarray
    S12: jnp.ndarray
    S33: jnp.ndarray
    S34: jnp.ndarray
    bin_prob: jnp.ndarray   # (n-1,) alias prob
    bin_alias: jnp.ndarray  # (n-1,) alias index


@dataclasses.dataclass(frozen=True)
class MuellerMeta:
    n: int
    wavelength_um: float
    cext: float
    albedo: float
    hgg: float
    dcos: float


def load_mueller(path: str):
    """Parse a mueller_*.dat table -> (MuellerMeta, MuellerDevice)."""
    if not os.path.exists(path):
        cand = os.path.join(DATA_DIR, path)
        if os.path.exists(cand):
            path = cand
    with open(path) as fh:
        fh.readline()
        wl, cext, albedo, hgg, n = fh.readline().split()
        n = int(n)
        fh.readline()
        rows = np.loadtxt(fh, max_rows=n)
    coss = rows[:, 0]
    S11, S12, S33, S34 = rows[:, 1], rows[:, 2], rows[:, 3], rows[:, 4]
    # normalize so Integral S11 dcos = 1 (setup.f90:631-636)
    norm = np.trapezoid(S11, coss)
    S11, S12, S33, S34 = S11 / norm, S12 / norm, S33 / norm, S34 / norm
    pdf_bin = 0.5 * (S11[:-1] + S11[1:])
    pdf_bin = pdf_bin / pdf_bin.sum()
    prob, alias = build_alias_table(pdf_bin)
    meta = MuellerMeta(n=n, wavelength_um=float(wl), cext=float(cext),
                       albedo=float(albedo), hgg=float(hgg),
                       dcos=float(coss[1] - coss[0]))
    dev = MuellerDevice(
        coss=jnp.asarray(coss, jnp.float32),
        S11=jnp.asarray(S11, jnp.float32),
        S12=jnp.asarray(S12, jnp.float32),
        S33=jnp.asarray(S33, jnp.float32),
        S34=jnp.asarray(S34, jnp.float32),
        bin_prob=jnp.asarray(prob, jnp.float32),
        bin_alias=jnp.asarray(alias, jnp.int32))
    return meta, dev


def sample_cost(key, mdev: MuellerDevice, shape):
    """cos(theta) from the tabulated S11 phase function: alias over bins +
    linear-pdf inversion inside the bin (rand_alias_linear)."""
    from .samplers import alias_sample
    k1, k2 = jax.random.split(key)
    ib = alias_sample(k1, mdev.bin_prob, mdev.bin_alias, shape)
    c0 = jnp.take(mdev.coss, ib)
    c1 = jnp.take(mdev.coss, ib + 1)
    f0 = jnp.take(mdev.S11, ib)
    f1 = jnp.take(mdev.S11, ib + 1)
    u = jax.random.uniform(k2, shape, jnp.float32)
    # invert linear density between (c0,f0)-(c1,f1)
    df = f1 - f0
    flat = jnp.abs(df) < 1e-12 * jnp.maximum(f0, 1e-30)
    t_lin = u
    disc = jnp.maximum(f0 * f0 + u * (f1 * f1 - f0 * f0), 0.0)
    t_slope = (jnp.sqrt(disc) - f0) / jnp.where(flat, 1.0, df)
    t = jnp.where(flat, t_lin, t_slope)
    return jnp.clip(c0 + (c1 - c0) * t, -1.0, 1.0)


def interp_S(mdev: MuellerDevice, meta: MuellerMeta, cost):
    """Interpolate (S11, S12, S33, S34) at cost (uniform cos grid)."""
    f = (cost - mdev.coss[0]) / meta.dcos
    i = jnp.clip(jnp.floor(f).astype(jnp.int32), 0, meta.n - 2)
    w = jnp.clip(f - i.astype(jnp.float32), 0.0, 1.0)

    def lerp(arr):
        return jnp.take(arr, i) * (1 - w) + jnp.take(arr, i + 1) * w

    return lerp(mdev.S11), lerp(mdev.S12), lerp(mdev.S33), lerp(mdev.S34)


def default_mueller_file(wavelength_um: float, dust_type: str = 'MW') -> str:
    """Pick the bundled table closest in wavelength (data/mueller_*.dat)."""
    import glob
    import re
    suffix = '' if dust_type.upper() == 'MW' else f'_{dust_type.upper()}'
    best, best_d = None, 1e99
    for f in glob.glob(os.path.join(DATA_DIR, f'mueller_*{suffix}.dat')):
        m = re.search(r'mueller_([A-Za-z0-9]+?)(_LMC|_SMC)?\.dat$',
                      os.path.basename(f))
        if not m:
            continue
        if suffix == '' and m.group(2):
            continue
        tag = m.group(1)
        if tag == 'Lyalpha':
            wl = 0.12160
        else:
            try:
                wl = float(tag) * 1e-4
            except ValueError:
                continue
        d = abs(wl - wavelength_um)
        if d < best_d:
            best, best_d = f, d
    return best
