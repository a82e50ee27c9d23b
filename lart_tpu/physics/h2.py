"""Molecular-hydrogen (H2) pumping of Lyman-alpha.

Rebuilds h2_mod (reference: src/h2_mod.f90:1-307): the Neufeld (1990)
two-line B-X treatment -- R(6) at +14.1 km/s and P(5) at +99.2 km/s from
line center, with LTE level populations from the CLOUDY X-state energy table
(data/h2/energy_X.dat), opacity expressed as a dimensionless multiplier of
the local H I opacity, and the two-channel outcome per pumping event
(resonance scatter back to Ly-a with probability p_scat = A_ul/A_tot,
else fluorescent destruction).
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Tuple

import numpy as np

from ..constants import PI, SPEEDC, UM2M

DATA_DIR = os.path.join(os.path.dirname(__file__), '..', 'data', 'h2')

F_OSC_LYA = 0.4162
HC_OVER_K = 1.4387769          # [cm K]
F_OSC_CONST = 1.4992e-16       # f = const * (gu/gl) * lambda_A^2 * A_ul

# Phase-1 Neufeld two-line table (h2_mod.f90:144-155): CLOUDY energies,
# Abgrall+00 A-values
_LINES = (
    dict(dv_kms=14.140, vl=2, Jl=6, Ju=7, lambda_A=1215.72534,
         A_ul=1.36e8, A_tot_up=1.6825e9),
    dict(dv_kms=99.229, vl=2, Jl=5, Ju=4, lambda_A=1216.07038,
         A_ul=1.59e8, A_tot_up=1.7199e9),
)


@dataclasses.dataclass(frozen=True)
class H2Setup:
    """Static per-line constants (all Python floats -> trace-time consts)."""
    n_lines: int
    Dfreq_Hz: float                    # H2 Doppler width
    dnu_Hz: Tuple[float, ...]          # nu_line - nu_Lya
    strength: Tuple[float, ...]        # s_i relative to H I line-center
    a_damp: Tuple[float, ...]          # Voigt a in H2 Doppler units
    p_scat: Tuple[float, ...]          # return-to-Lya probability
    hi_width: bool                     # benchmark flag: use H I width


def read_energy_X(path: str = None):
    path = path or os.path.join(DATA_DIR, 'energy_X.dat')
    rows = []
    with open(path) as fh:
        for ln in fh:
            ln = ln.strip()
            if not ln or ln.startswith('#') or '//' in ln:
                continue
            parts = ln.split()
            if len(parts) < 3:
                continue
            try:
                rows.append((int(float(parts[0])), int(float(parts[1])),
                             float(parts[2])))
            except ValueError:
                continue
    return rows


def h2_init(par, line, data_dir: str = None) -> H2Setup:
    """Build the static H2 line table (h2_init, h2_mod.f90:118-210)."""
    nu_Lya = (SPEEDC * 1e5) / (line.wavelength0 * UM2M * 1e2)   # [Hz]
    vth1_H2 = line.vtherm1 * math.sqrt(line.mass_amu / (2.0 * line.mass_amu))
    T = par.h2_temperature
    b2 = par.bturb ** 2 if par.bturb > 0 else 0.0
    vth_H2 = math.sqrt((vth1_H2 * math.sqrt(T)) ** 2 + b2)
    Dfreq_Hz = nu_Lya * vth_H2 / SPEEDC

    levels = read_energy_X(os.path.join(data_dir, 'energy_X.dat')
                           if data_dir else None)
    Z = sum((3.0 if J % 2 else 1.0) * (2 * J + 1)
            * math.exp(-HC_OVER_K * E / T) for v, J, E in levels)

    def level_E(v, J):
        for vv, JJ, E in levels:
            if vv == v and JJ == J:
                return E
        raise KeyError((v, J))

    dnu, strength, a_damp, p_scat = [], [], [], []
    for ln in _LINES:
        dnu.append(-(ln['dv_kms'] / SPEEDC) * nu_Lya)
        f_osc = (F_OSC_CONST * (2 * ln['Ju'] + 1) / (2 * ln['Jl'] + 1)
                 * ln['lambda_A'] ** 2 * ln['A_ul'])
        E = level_E(ln['vl'], ln['Jl'])
        gns = 3.0 if ln['Jl'] % 2 else 1.0
        pop = gns * (2 * ln['Jl'] + 1) * math.exp(-HC_OVER_K * E / T) / Z
        strength.append(par.f_H2 * pop * f_osc / F_OSC_LYA)
        a_damp.append(ln['A_tot_up'] / (4.0 * PI * Dfreq_Hz))
        p_scat.append(0.0 if par.h2_pure_absorption
                      else ln['A_ul'] / ln['A_tot_up'])

    return H2Setup(n_lines=len(_LINES), Dfreq_Hz=Dfreq_Hz,
                   dnu_Hz=tuple(dnu), strength=tuple(strength),
                   a_damp=tuple(a_damp), p_scat=tuple(p_scat),
                   hi_width=par.h2_hi_width)


def h2_kappa(h2: H2Setup, xfreq, Dfreq_cell):
    """H2 opacity as a multiplier of the local H I rhokap
    (h2_kappa_D, h2_mod.f90:63-83)."""
    import jax.numpy as jnp
    from .voigt import voigt
    ratio = 1.0 if h2.hi_width else Dfreq_cell / h2.Dfreq_Hz
    kap = 0.0
    for i in range(h2.n_lines):
        dx = h2.dnu_Hz[i] / Dfreq_cell
        x_h2 = (xfreq - dx) * ratio
        kap = kap + h2.strength[i] * ratio * voigt(x_h2, h2.a_damp[i])
    return kap


def h2_line_weights(h2: H2Setup, xfreq, Dfreq_cell):
    """Per-line opacity contributions (for line selection)."""
    import jax.numpy as jnp
    from .voigt import voigt
    ratio = 1.0 if h2.hi_width else Dfreq_cell / h2.Dfreq_Hz
    ws = []
    for i in range(h2.n_lines):
        dx = h2.dnu_Hz[i] / Dfreq_cell
        x_h2 = (xfreq - dx) * ratio
        ws.append(h2.strength[i] * ratio * voigt(x_h2, h2.a_damp[i]))
    return ws
