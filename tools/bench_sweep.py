"""Generic-DDA throughput sweep: batch size x cycle-shape knobs.

The generic transport path has sat at ~10M scatterings/s/chip since
round 1 (BENCH_r01/r02) while the analytic fast path reaches 31M.  This
sweeps the engine-shape knobs on the forced-generic north-star slab to
find where the generic cycle loses its 3x: lane count (fixed per-op
overhead amortization), fly_substeps (DDA steps per cycle vs idle
scatter lanes), scatter_rounds (rejection rounds vs idle fly lanes).

Writes results/bench_sweep.json.  Run on the TPU:
    python tools/bench_sweep.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lart_tpu.utils.transfer import to_host_scalar

BASE = dict(nphotons=1_000_000_000, temperature=1e4, taumax=1e6,
            xy_periodic=True, nx=1, ny=1, nz=201,
            spectral_type='voigt', source_geometry='point',
            force_generic_kernel=True,
            chunk_cycles=32, refill_every=4)


def bench(tag, warm=2, timed=4, **kw):
    import jax
    from lart_tpu.config import Params
    from lart_tpu import driver

    par = Params(**{**BASE, **kw})
    t0 = time.time()
    p = driver.prepare(par)
    key0 = jax.random.PRNGKey(99)
    for i in range(warm):
        tl, alive, launched = p.run_chunk(jax.random.fold_in(key0, i))
        jax.block_until_ready(tl)
    compile_s = time.time() - t0
    t0 = time.time()
    ns = 0.0
    for i in range(warm, warm + timed):
        tl, alive, launched = p.run_chunk(jax.random.fold_in(key0, i))
        ns += float(to_host_scalar(tl.nscatt_gas))
    jax.block_until_ready(tl)
    dt = time.time() - t0
    out = {'tag': tag, 'scatt_per_s_chip': ns / dt / p.n_dev,
           'wall_s': dt, 'compile_s': compile_s, **kw}
    print(json.dumps(out), flush=True)
    return out


def main():
    os.makedirs('results', exist_ok=True)
    rows = []
    # batch-size sweep at default cycle shape
    for b in (1 << 16, 1 << 17, 1 << 18, 1 << 19):
        rows.append(bench(f'batch_{b}', batch_size=b,
                          fly_substeps=8, scatter_rounds=4))
    # cycle-shape sweep at the best-looking batch (128k default)
    for fs, sr in ((4, 2), (4, 4), (8, 2), (16, 4), (16, 8), (32, 4)):
        rows.append(bench(f'shape_f{fs}_s{sr}', batch_size=1 << 17,
                          fly_substeps=fs, scatter_rounds=sr))
    with open('results/bench_sweep.json', 'w') as fh:
        json.dump(rows, fh, indent=1)
    best = max(rows, key=lambda r: r['scatt_per_s_chip'])
    print('best:', json.dumps(best), flush=True)


if __name__ == '__main__':
    main()
