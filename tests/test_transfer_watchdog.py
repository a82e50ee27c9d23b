"""Transfer watchdog semantics (utils/transfer.py): a wedged batched
transfer must fail the run after its attempt budget, NOT fall through to
the per-leaf path and pay the budget again for every tally leaf
(advisor r3 finding)."""
import time

import numpy as np
import jax.numpy as jnp
import pytest

from lart_tpu.utils import transfer


@pytest.fixture
def fast_watchdog(monkeypatch):
    monkeypatch.setattr(transfer, 'TRANSFER_TIMEOUT_S', 0.15)
    monkeypatch.setattr(transfer, 'TRANSFER_ATTEMPTS', 2)
    monkeypatch.setattr(transfer, '_on_tpu', lambda: True)
    return monkeypatch


def test_watchdog_retries_then_raises(fast_watchdog):
    calls = []

    def wedged():
        calls.append(1)
        time.sleep(10.0)

    t0 = time.time()
    with pytest.raises(RuntimeError, match='failed after 2 attempts'):
        transfer._with_watchdog(wedged)
    # two attempts, each bounded by the (patched) timeout
    assert len(calls) == 2
    assert time.time() - t0 < 5.0


def test_watchdog_returns_result(fast_watchdog):
    assert transfer._with_watchdog(lambda: 42) == 42


def test_tree_to_host_reraises_on_wedge(fast_watchdog, monkeypatch):
    """The batched path must NOT swallow the watchdog exhaustion."""
    import jax

    def hang(*a, **kw):
        time.sleep(10.0)

    monkeypatch.setattr(jax, 'device_put', hang)
    tree = {'a': jnp.ones(4), 'b': jnp.zeros(3), 'c': None}
    t0 = time.time()
    with pytest.raises(RuntimeError):
        transfer.tree_to_host(tree)
    # ONE shared budget: 2 attempts x 0.15 s, not 2 x N_leaves
    assert time.time() - t0 < 5.0


def test_tree_to_host_normal_path():
    tree = {'a': jnp.arange(4.0), 'b': None,
            'c': np.array([1.0, 2.0])}
    out = transfer.tree_to_host(tree)
    assert isinstance(out['a'], np.ndarray)
    np.testing.assert_array_equal(out['a'], [0.0, 1.0, 2.0, 3.0])
    assert out['b'] is None
