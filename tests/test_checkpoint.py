"""Mid-run checkpoint/resume (SURVEY.md section 5 'cheap win': the
reference's only resume is out_merge at run granularity,
write_output_rect.f90:74-241; the TPU build adds device-state checkpoints
at chunk granularity)."""
import json
import os

import numpy as np
import pytest

from lart_tpu.config import Params
from lart_tpu import driver


def _par(tmp_path, **kw):
    return Params(nphotons=3000, geometry='sphere', rmax=1.0,
                  nx=17, ny=17, nz=17, taumax=5.0, temperature=1e4,
                  xfreq_min=-30.0, xfreq_max=30.0, n_devices=1,
                  batch_size=1024, chunk_cycles=8, refill_every=2, **kw)


def test_checkpoint_resume_matches_uninterrupted(tmp_path):
    ck = str(tmp_path / 'run.ckpt.h5')

    # uninterrupted reference run
    res_ref = driver.run(_par(tmp_path), seed=13)

    # interrupted: stop after 4 chunks (checkpoint saved at chunk 4)
    par_ck = _par(tmp_path, checkpoint_file=ck, checkpoint_every=2)
    driver.run(par_ck, seed=13, max_chunks=4)
    assert os.path.exists(ck)

    # resume from the checkpoint: must reproduce the uninterrupted run
    par_rs = _par(tmp_path, checkpoint_file=ck, resume_checkpoint=True)
    res_rs = driver.run(par_rs, seed=13)

    np.testing.assert_allclose(res_rs.Jout, res_ref.Jout, rtol=1e-6)
    assert res_rs.nscatt_tot == pytest.approx(res_ref.nscatt_tot, rel=1e-6)


def test_metrics_jsonl(tmp_path):
    mf = str(tmp_path / 'metrics.jsonl')
    driver.run(_par(tmp_path, metrics_file=mf), seed=3)
    rows = [json.loads(l) for l in open(mf)]
    assert len(rows) >= 2
    for r in rows:
        assert {'chunk', 'wall_s', 'nscatt_gas', 'scatt_per_s', 'alive',
                'launched', 'batch'} <= set(r)
    # chunks are sequential and the run drained
    assert rows[-1]['alive'] == 0
    assert rows[-1]['launched'] == 3000
