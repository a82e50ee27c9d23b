"""Distributional tests of the batched rejection samplers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lart_tpu.physics import samplers


def target_vz_pdf(u, x0, a):
    f = np.exp(-u ** 2) / ((x0 - u) ** 2 + a ** 2)
    return f / np.trapezoid(f, u)


@pytest.mark.parametrize("x0,a", [
    (0.0, 4.7e-4), (0.5, 4.7e-4), (1.5, 4.7e-4), (3.0, 4.7e-4),
    (3.5, 1.49e-2), (5.0, 1.49e-2), (8.0, 4.7e-4), (-2.5, 4.7e-4),
    (15.0, 1.49e-2),
])
def test_vz_sampler_distribution(x0, a):
    n = 200_000
    key = jax.random.PRNGKey(hash((x0, a)) & 0x7FFFFFFF)
    x = jnp.full((n,), x0, jnp.float32)
    out = np.asarray(samplers.rand_resonance_vz(key, x, jnp.float32(a)))
    assert np.all(np.isfinite(out))

    # exact conditional pdf on a two-scale grid: coarse everywhere + dense
    # around the Lorentzian resonance peak at u ~ x0 (width a)
    lim = max(abs(x0) + 6.0, 6.0)
    u = np.unique(np.concatenate([
        np.linspace(-lim, lim, 200_001),
        x0 + a * np.tan(np.linspace(-np.pi / 2 * 0.9999, np.pi / 2 * 0.9999,
                                    200_001)),
    ]))
    f = np.exp(-u ** 2) / ((x0 - u) ** 2 + a ** 2)
    cdf = np.concatenate([[0.0], np.cumsum(np.diff(u) * 0.5 * (f[1:] + f[:-1]))])
    cdf /= cdf[-1]

    # compare empirical vs exact CDF at quantile points (KS-style bound)
    qs = np.quantile(out, np.linspace(0.02, 0.98, 49))
    cdf_at_q = np.interp(qs, u, cdf)
    emp = np.linspace(0.02, 0.98, 49)
    err = np.max(np.abs(cdf_at_q - emp))
    assert err < 0.01, f"CDF error {err:.4f} at x0={x0}, a={a}"


def test_vz_sampler_acceptance_rate():
    """Envelope efficiency: most lanes should accept within a few rounds."""
    key = jax.random.PRNGKey(0)
    n = 50_000
    for x0 in [0.5, 2.0, 3.5, 6.0]:
        env = samplers.vz_envelope(jnp.full((n,), x0, jnp.float32),
                                   jnp.float32(4.7e-4))
        acc = jnp.zeros((n,), bool)
        vz = jnp.zeros((n,), jnp.float32)
        active = jnp.ones((n,), bool)
        for i in range(6):
            acc, vz = samplers.vz_round(jax.random.fold_in(key, i), env,
                                        acc, vz, active)
        frac = float(jnp.mean(acc))
        assert frac > 0.80, f"x0={x0}: only {frac:.2f} accepted in 6 rounds"


def test_resonance_cost_distribution():
    key = jax.random.PRNGKey(1)
    n = 400_000
    for E1 in [1.0, 0.5, 0.0, -0.4]:
        xi = jax.random.uniform(key, (n,))
        mu = np.asarray(samplers.rand_resonance_cost(xi, jnp.float32(E1)))
        assert np.all(np.abs(mu) <= 1.0)
        # P(mu) = (3/8) E1 mu^2 + (4-E1)/8 => <mu^2> = (E1*3/5/8*2 + (4-E1)/8*2/3)
        m2_exact = (3 * E1 / 8) * (2 / 5) + ((4 - E1) / 8) * (2 / 3)
        assert abs(np.mean(mu ** 2) - m2_exact) < 3e-3
        assert abs(np.mean(mu)) < 5e-3


def test_hg_distribution():
    key = jax.random.PRNGKey(2)
    n = 400_000
    for g in [0.0, 0.3, 0.6592]:
        xi = jax.random.uniform(key, (n,))
        mu = np.asarray(samplers.rand_henyey_greenstein(xi, jnp.float32(g)))
        assert abs(np.mean(mu) - g) < 4e-3  # <mu> = g for HG


def test_voigt_x_distribution():
    key = jax.random.PRNGKey(3)
    a = 4.7e-4
    out = np.asarray(samplers.rand_voigt_x(key, jnp.float32(a), (400_000,)))
    # bulk should be the Gaussian with sigma = 1/sqrt(2)
    core = out[np.abs(out) < 4]
    assert abs(np.std(core) - 1 / np.sqrt(2)) < 0.01
    # Lorentzian wings exist
    assert np.mean(np.abs(out) > 10) > 1e-5


def test_alias_table():
    probs = [0.1, 0.2, 0.3, 0.4]
    prob, alias = samplers.build_alias_table(probs)
    key = jax.random.PRNGKey(4)
    idx = np.asarray(samplers.alias_sample(
        key, jnp.asarray(prob, jnp.float32), jnp.asarray(alias), (400_000,)))
    freq = np.bincount(idx, minlength=4) / idx.size
    np.testing.assert_allclose(freq, probs, atol=4e-3)
