"""Vectorized random samplers for resonance-line scattering.

The reference samples one photon at a time with branchy rejection loops
(reference: src/random_mt.f90:2562-2696 rand_resonance_vz_seon, :2974
rand_resonance, :3075 rand_voigt).  Here every sampler is reformulated as a
dense batched operation: per-lane envelope constants are precomputed once,
then a bounded number of masked rejection rounds run in lockstep.  Lanes that
fail to accept within the round budget simply report accepted=False and retry
on the next transport cycle -- the batch never waits for stragglers.

RNG: counter-based threefry via jax.random; a fresh scalar key per round,
lanes decorrelate by position.  Statistical (not bitwise) parity with the
reference's MT19937 stream is the design target.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

PI = math.pi
TWOPI = 2.0 * math.pi
TWO_OVER_PI = 2.0 / math.pi
XC_SEON = 1.0 + math.sqrt(2.0)   # piecewise-envelope switch (random_mt.f90:2570)
X0_CRIT = 1.0                    # core/wing switch (random_mt.f90:2569)


def _u01(key, shape):
    """Uniform in (0, 1] -- guard against log(0)."""
    u = jax.random.uniform(key, shape, jnp.float32)
    return jnp.maximum(u, 1e-12)


# ---------------------------------------------------------------------------
# Voigt-conditional parallel-velocity sampler
#   target: f(u) ~ exp(-u^2) / ((x0 - u)^2 + a^2)
# ---------------------------------------------------------------------------

class VzEnvelope(NamedTuple):
    """Per-lane envelope constants of the Seon composite-rejection scheme.

    The wing scheme decomposes the envelope into <=3 pieces over the level
    variable beta = exp(-pb^2/2):
      piece 0: beta = beta0*sqrt(xi),      Cb = beta/a
      piece 1: beta = lo1 + w1*xi,         Cb = C1
      piece 2: beta = lo2 + w2*xi,         Cb = C2
    chosen with probabilities (S0, S1, S2)/Stot.  `core` lanes use the plain
    Lorentzian envelope with exp(-u^2) acceptance instead.
    """
    core: jnp.ndarray
    x0: jnp.ndarray       # |x| (sign restored at the end)
    sgn: jnp.ndarray
    a: jnp.ndarray
    S0: jnp.ndarray
    S01: jnp.ndarray      # S0 + S1
    Stot: jnp.ndarray
    beta0: jnp.ndarray
    lo1: jnp.ndarray
    w1: jnp.ndarray
    C1: jnp.ndarray
    lo2: jnp.ndarray
    w2: jnp.ndarray
    C2: jnp.ndarray


def vz_envelope(xin: jnp.ndarray, a: jnp.ndarray) -> VzEnvelope:
    """Precompute per-lane envelope constants (random_mt.f90:2590-2686)."""
    x0 = jnp.abs(xin)
    sgn = jnp.where(xin < 0.0, -1.0, 1.0).astype(jnp.float32)
    core = x0 <= X0_CRIT

    x0s = jnp.maximum(x0, 1.001)          # safe x0 for wing-only formulas
    x0sq = x0s * x0s
    beta0 = jnp.exp(-0.5 * x0sq)
    h0 = beta0 / (2.0 * a)
    h0_two = beta0 / a

    # --- branch A constants (x0 < xc) and the h1 piece shared with B3
    dbeta = jnp.sqrt(TWO_OVER_PI * a * (1.0 - beta0) * beta0 * x0s)
    beta1 = beta0 + dbeta
    pb1sq = -2.0 * jnp.log(beta1)
    denom1 = jnp.maximum(x0sq - pb1sq, 1e-20)
    h1 = TWO_OVER_PI * beta1 * jnp.sqrt(jnp.maximum(pb1sq, 0.0)) / denom1

    # --- branch B constant
    h2 = 0.3861 / jnp.maximum(x0sq - 1.373, 1e-20)

    in_A = x0s < XC_SEON
    b1 = jnp.logical_and(~in_A, h0_two < h2)             # single flat piece
    b2 = jnp.logical_and(~in_A, jnp.logical_and(~b1, h0 < h2))
    b3 = jnp.logical_and(~in_A, jnp.logical_and(~b1, ~b2))
    hmax = jnp.maximum(h1, h2)

    # piece probabilities
    S0 = jnp.where(b1, 0.0, beta0 * h0)
    S1 = jnp.where(in_A, dbeta * h0,
                   jnp.where(b1, h2, jnp.where(b2, (1.0 - beta0) * h2,
                                               dbeta * h0)))
    S2 = jnp.where(in_A, (1.0 - beta1) * h1,
                   jnp.where(b3, (1.0 - beta1) * hmax, 0.0))

    lo1 = jnp.where(b1, 0.0, beta0)
    w1 = jnp.where(in_A | b3, dbeta, jnp.where(b1, 1.0, 1.0 - beta0))
    C1 = jnp.where(in_A | b3, h0, h2)
    lo2 = beta1
    w2 = 1.0 - beta1
    C2 = jnp.where(in_A, h1, hmax)

    Stot = S0 + S1 + S2
    return VzEnvelope(core=core, x0=x0.astype(jnp.float32), sgn=sgn,
                      a=jnp.broadcast_to(a, x0.shape).astype(jnp.float32),
                      S0=S0, S01=S0 + S1, Stot=jnp.maximum(Stot, 1e-30),
                      beta0=beta0, lo1=lo1, w1=w1, C1=C1,
                      lo2=lo2, w2=w2, C2=C2)


def vz_round(key, env: VzEnvelope, accepted: jnp.ndarray, vz: jnp.ndarray,
             active: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One masked rejection round for all lanes (jax.random stream)."""
    xi = _u01(key, (4,) + env.x0.shape)
    return vz_round_xi(xi, env, accepted, vz, active)


def vz_round_xi(xi, env: VzEnvelope, accepted: jnp.ndarray, vz: jnp.ndarray,
                active: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One masked rejection round for all lanes, RNG injected as xi.

    xi has shape (4,) + lanes; the split lets the identical math run under
    jax.random (engine) and the in-kernel TPU PRNG (pallas fast path).
    accepted/vz are carried state; `active` masks lanes that need a sample.
    Returns (accepted, vz) updated where a new acceptance occurred.
    """
    need = jnp.logical_and(active, ~accepted)

    # --- core path: Lorentzian proposal, accept exp(-u^2)
    vz_core = env.x0 + env.a * jnp.tan(PI * (xi[0] - 0.5))
    acc_core = xi[1] <= jnp.exp(-vz_core * vz_core)

    # --- wing path: composite envelope in beta
    r = xi[0] * env.Stot
    p0 = r < env.S0
    p1 = jnp.logical_and(~p0, r < env.S01)
    beta = jnp.where(p0, env.beta0 * jnp.sqrt(xi[1]),
                     jnp.where(p1, env.lo1 + env.w1 * xi[1],
                               env.lo2 + env.w2 * xi[1]))
    beta = jnp.clip(beta, 1e-35, 1.0)
    Cb = jnp.where(p0, beta / env.a, jnp.where(p1, env.C1, env.C2))
    pb = jnp.sqrt(jnp.maximum(-2.0 * jnp.log(beta), 0.0))
    u_hi = (pb - env.x0) / env.a
    u_lo = (-pb - env.x0) / env.a
    # atan(u_hi) - atan(u_lo) via the difference identity: for far-wing
    # lanes both angles sit at -pi/2 within f32 epsilon and the naive
    # difference cancels to 0, locking the rejection loop forever
    delt = jnp.arctan2(u_hi - u_lo, 1.0 + u_hi * u_lo)
    acc_wing = xi[2] * Cb < (beta / (env.a * PI)) * delt
    t1 = jnp.arctan(u_lo)
    vz_tan = env.x0 + env.a * jnp.tan(delt * xi[3] + t1)
    # far wing (the whole [-pb, pb] range is >> a away from x0): the
    # truncated Lorentzian is an inverse-square law in y = x0 - vz; sample
    # it by exact inverse CDF instead of the angle-domain tan, which has no
    # f32 resolution left near the pole
    far = env.x0 - pb > 1e3 * env.a
    y1 = jnp.maximum(env.x0 - pb, 1e-20)
    y2 = env.x0 + pb
    y = 1.0 / jnp.maximum(1.0 / y1 - xi[3] * (1.0 / y1 - 1.0 / y2), 1e-30)
    vz_wing = jnp.where(far, env.x0 - y, vz_tan)

    new_acc = jnp.where(env.core, acc_core, acc_wing)
    new_vz = jnp.where(env.core, vz_core, vz_wing) * env.sgn
    take = jnp.logical_and(need, new_acc)
    return jnp.logical_or(accepted, take), jnp.where(take, new_vz, vz)


def rand_resonance_vz(key, xin, a, n_rounds: int = 25):
    """Standalone draining sampler (used in tests and low-rate paths).

    Runs masked rounds until n_rounds; unaccepted lanes (probability
    ~(1-p)^n, p >~ 0.3) fall back to the Smith+05 Gaussian-wing
    approximation, which is accurate precisely in the large-|x| regime where
    acceptance is slowest (random_mt.f90:2551-2555).
    """
    env = vz_envelope(xin, a)
    shape = env.x0.shape
    accepted = jnp.zeros(shape, bool)
    vz = jnp.zeros(shape, jnp.float32)
    active = jnp.ones(shape, bool)

    def body(i, carry):
        acc, v = carry
        return vz_round(jax.random.fold_in(key, i), env, acc, v, active)

    accepted, vz = jax.lax.fori_loop(0, n_rounds, body, (accepted, vz))
    kf = jax.random.fold_in(key, n_rounds)
    xi = _u01(kf, (2,) + shape)
    x0safe = jnp.maximum(env.x0, 1.0)
    vz_fb = (1.0 / x0safe + jnp.sqrt(-jnp.log(xi[0]))
             * jnp.cos(TWOPI * xi[1])) * env.sgn
    return jnp.where(accepted, vz, vz_fb)


# ---------------------------------------------------------------------------
# Resonance phase-function scattering angle
#   P(mu) = (3/8) E1 mu^2 + (4 - E1)/8,  mu in (-1, 1)   (random_mt.f90:2965)
# ---------------------------------------------------------------------------

def rand_resonance_cost(xi, E1):
    """Direct inversion of the E1-weighted dipole phase function."""
    E1 = jnp.asarray(E1, jnp.float32)
    xi = jnp.asarray(xi, jnp.float32)
    iso = jnp.abs(E1) < 1e-12
    E1s = jnp.where(iso, 1.0, E1)          # safe value for unused lanes
    p2 = jnp.sqrt(jnp.abs((4.0 - E1s) / (3.0 * E1s)))
    Q = (4.0 * xi - 2.0) / (E1s * p2 ** 3)
    # E1 > 0: Cardano real root
    W = jnp.cbrt(Q + jnp.sqrt(Q * Q + 1.0))
    cost_pos = p2 * (W - 1.0 / W)
    # E1 < 0: trigonometric root
    Qc = jnp.clip(Q, -1.0, 1.0)
    cost_neg = 2.0 * p2 * jnp.cos((jnp.arccos(Qc) + 4.0 * PI) / 3.0)
    cost = jnp.where(iso, 2.0 * xi - 1.0,
                     jnp.where(E1 > 0.0, cost_pos, cost_neg))
    return jnp.clip(cost, -1.0, 1.0)


# ---------------------------------------------------------------------------
# Simple distributions
# ---------------------------------------------------------------------------

def rand_gauss(key, shape):
    return jax.random.normal(key, shape, jnp.float32)


def rand_voigt_x(key, a, shape):
    """Frequency drawn from the Voigt profile: Cauchy(a) + Gauss/sqrt(2)
    (random_mt.f90:3075-3083)."""
    xi = _u01(key, (2,) + shape)
    kg = jax.random.fold_in(key, 0x5EED)
    g = jax.random.normal(kg, shape, jnp.float32)
    cauchy = jnp.tan(PI * xi[0] - 0.5 * PI)
    return a * cauchy + g * (1.0 / math.sqrt(2.0))


def rand_henyey_greenstein(xi, g):
    """HG phase-function cosine by inversion (random_mt.f90:3008-3027)."""
    g = jnp.asarray(g, jnp.float32)
    iso = jnp.abs(g) < 1e-8
    gs = jnp.where(iso, 0.5, g)
    g2 = gs * gs
    val = ((1.0 + g2) - ((1.0 - g2) / (1.0 - gs + 2.0 * gs * xi)) ** 2) / (2.0 * gs)
    return jnp.where(iso, 2.0 * xi - 1.0, jnp.clip(val, -1.0, 1.0))


def rand_rayleigh_cost(xi):
    """Pure-Rayleigh special case (E1 = 1)."""
    return rand_resonance_cost(xi, jnp.ones_like(jnp.asarray(xi)))


# ---------------------------------------------------------------------------
# Vose alias tables (random_mt.f90:213-228) -- host build, device gather
# ---------------------------------------------------------------------------

def build_alias_table(probs):
    """Return (prob, alias) int/float arrays for O(1) categorical sampling."""
    import numpy as np
    p = np.asarray(probs, np.float64)
    n = p.size
    p = p / p.sum() * n
    prob = np.zeros(n)
    alias = np.zeros(n, np.int32)
    small = [i for i in range(n) if p[i] < 1.0]
    large = [i for i in range(n) if p[i] >= 1.0]
    while small and large:
        s, l = small.pop(), large.pop()
        prob[s] = p[s]
        alias[s] = l
        p[l] = p[l] - (1.0 - p[s])
        (small if p[l] < 1.0 else large).append(l)
    for i in large + small:
        prob[i] = 1.0
    return prob, alias


def alias_sample(key, prob, alias, shape):
    """Batched alias-method categorical draw (two uniforms, one gather)."""
    n = prob.shape[0]
    xi = jax.random.uniform(key, (2,) + shape, jnp.float32)
    idx = jnp.minimum((xi[0] * n).astype(jnp.int32), n - 1)
    take_alias = xi[1] >= prob[idx]
    return jnp.where(take_alias, alias[idx], idx)
