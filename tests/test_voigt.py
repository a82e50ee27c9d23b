"""Voigt function accuracy vs scipy.special.wofz (exact to ~1e-13)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.special import wofz

from lart_tpu.physics.voigt import voigt, voigt_profile_doublet


def exact_H(x, a):
    return wofz(np.asarray(x, np.float64) + 1j * np.asarray(a, np.float64)).real


@pytest.mark.parametrize("a", [4.7e-4, 1.49e-2, 1e-6, 1e-2, 0.1])
def test_voigt_accuracy_f64_grid(a):
    x = np.concatenate([
        np.linspace(0.0, 8.0, 1601),
        np.logspace(0.9, 3.5, 400),
        -np.logspace(-3, 3.5, 300),
    ])
    ours = np.asarray(voigt(jnp.asarray(x, jnp.float32), jnp.float32(a)))
    ref = exact_H(x, a)
    rel = np.abs(ours - ref) / np.abs(ref)
    # f32 evaluation: demand <2e-4 relative everywhere on the physical domain
    assert np.max(rel) < 2e-4, f"max rel err {np.max(rel):.2e} at x={x[np.argmax(rel)]}"


def test_voigt_symmetry_and_wing():
    a = 4.7e-4
    x = jnp.asarray([1.0, 5.0, 30.0, 300.0], jnp.float32)
    hp = np.asarray(voigt(x, a))
    hm = np.asarray(voigt(-x, a))
    np.testing.assert_allclose(hp, hm, rtol=1e-6)
    # far-wing asymptotic a/(sqrt(pi) x^2)
    wing = a / np.sqrt(np.pi) / np.asarray(x) ** 2
    np.testing.assert_allclose(hp[-1], wing[-1], rtol=1e-3)


def test_voigt_center_value():
    # H(a, 0) = exp(a^2) erfc(a) ~= 1 - 2a/sqrt(pi)
    for a in [1e-4, 1e-2]:
        got = float(voigt(jnp.float32(0.0), jnp.float32(a)))
        ref = float(exact_H(0.0, a))
        assert abs(got - ref) / ref < 1e-4


def test_doublet_profile_weights():
    a = 1e-3
    dn = 12.0
    x = jnp.asarray([0.0], jnp.float32)
    got = float(voigt_profile_doublet(x, a, dn)[0])
    ref = exact_H(dn, a) / 3.0 + exact_H(0.0, a) * 2.0 / 3.0
    assert abs(got - ref) / ref < 2e-4


def test_voigt_jittable_and_no_nan():
    f = jax.jit(voigt)
    x = jnp.asarray(np.random.RandomState(0).uniform(-2000, 2000, 4096), jnp.float32)
    out = np.asarray(f(x, jnp.float32(3e-4)))
    assert np.all(np.isfinite(out))
    assert np.all(out > 0)
