"""Multi-host distributed backend: 2 processes x 4 CPU devices each.

Realizes SURVEY.md section 2.7's MPI -> multi-controller mapping: the same
driver runs unmodified on every process, the ('data',) mesh spans global
devices, tallies psum across the process boundary (DCN on a real pod).
The acceptance criterion is VERDICT round-1 item 7: the 2x4-process run
must reproduce the single-process 8-device run -- the device mesh and
per-device RNG folds are identical in both, so tallies agree to collective
reduction rounding, not just MC noise.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, 'tools', 'mp_worker.py')


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_run_matches_single_process(tmp_path):
    out = tmp_path / 'mp_out.json'
    coord = f'127.0.0.1:{_free_port()}'
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)   # worker sets its own device count (4)
    procs = [subprocess.Popen(
        [sys.executable, WORKER, coord, '2', str(i), str(out)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]
    with open(out) as fh:
        mp = json.load(fh)
    assert mp['n_global_devices'] == 8

    # identical config on this process's own 8 virtual devices
    from lart_tpu.config import Params
    from lart_tpu import driver
    par = Params(nphotons=600, temperature=1e4, taumax=30.0,
                 geometry='sphere', rmax=1.0, nx=17, ny=17, nz=17,
                 spectral_type='voigt', source_geometry='point',
                 batch_size=128, fly_substeps=8, scatter_rounds=4,
                 chunk_cycles=8, refill_every=2)
    res = driver.run(par, seed=42)

    # same global mesh + same RNG folds => same photons; only the
    # reduction order differs (f32 psum), so tight tolerances hold
    assert mp['nscatt'] == pytest.approx(res.nscatt_tot, rel=1e-5)
    np.testing.assert_allclose(np.asarray(mp['Jout']), res.Jout,
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(mp['Jin']), res.Jin,
                               rtol=1e-4, atol=1e-7)
