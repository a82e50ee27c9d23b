#!/usr/bin/env python
"""Assert the reference's h2 on/off flag contract (README_HOWTO.md:214):
h2_model='none' is bit-identical to a run with no H2 parameters at all
(the disabled branch must be traced out of the kernel, not masked at
runtime -- masking would still consume RNG draws and shift the stream).

Runs both configs in-process at the same seed and compares every tally
array exactly.
"""
import sys

import numpy as np

from lart_tpu.config import Params
from lart_tpu import driver

# scaled down from the example inputs (tau0=1e5) so the check runs in
# ~a minute on CPU; bit-identity is config-independent
common = dict(nphotons=1000, temperature=1e4, taumax=3e2, DGR=0.0,
              spectral_type='voigt', source_geometry='point',
              nx=33, ny=33, nz=33, rmax=1.0, core_skip=True,
              xfreq_min=-12.0, xfreq_max=12.0, nxfreq=241,
              batch_size=1 << 10, chunk_cycles=16, n_devices=1)

res_none = driver.run(Params(h2_model='none', **common), seed=21)
res_bare = driver.run(Params(**common), seed=21)

bad = []
for k in ('Jout', 'Jin', 'Jabs'):
    a, b = getattr(res_none, k, None), getattr(res_bare, k, None)
    if a is None or b is None:
        continue
    if not np.array_equal(np.asarray(a), np.asarray(b)):
        bad.append(k)
if bad:
    print(f'BIT-IDENTITY FAILED: {bad}')
    sys.exit(1)
print('h2_model=none is bit-identical to the bare run: OK')
