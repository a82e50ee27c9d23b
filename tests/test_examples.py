"""Every committed example input must parse and resolve (the examples
tree is the reference's de-facto test suite, SURVEY.md section 4)."""
import glob
import os
import shutil
import subprocess
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'examples')

ALL_IN = sorted(glob.glob(os.path.join(EXAMPLES, '*', '*.in')))


@pytest.mark.parametrize('path', ALL_IN, ids=[
    os.path.relpath(p, EXAMPLES) for p in ALL_IN])
def test_example_parses_and_resolves(path):
    from lart_tpu.config import Params
    par = Params.from_namelist(path)
    cfg = par.resolve()          # mode vetoes / geometry normalization
    assert cfg.par.nphotons > 0


def test_generators_produce_parseable_inputs(tmp_path):
    """generate_inputs.py / mk_inputs.py scripts emit valid namelists."""
    from lart_tpu.config import Params
    for gen in ('HeI_coherent_test/generate_inputs.py',
                'SiII_1193/generate_inputs.py',
                'SiII_1527/generate_inputs.py',
                'FeII_turb/generate_inputs.py',
                'HeI_sphere_cont/generate_inputs.py',
                'SSH_MUSE/mk_inputs.py'):
        src = os.path.join(EXAMPLES, gen)
        d = tmp_path / gen.split('/')[0]
        d.mkdir()
        dst = d / 'gen.py'
        shutil.copy(src, dst)
        subprocess.run([sys.executable, str(dst)], check=True,
                       cwd=str(d), capture_output=True)
        made = sorted(glob.glob(str(d / '*.in')))
        assert made, gen
        for p in made:
            Params.from_namelist(p).resolve()


def test_h2_bit_identity_example():
    """The committed example check runs and passes (h2_model='none' ==
    no-H2 run bitwise; reference README_HOWTO.md:214)."""
    script = os.path.join(EXAMPLES, 'h2_test', 'check_bit_identity.py')
    env = dict(os.environ, JAX_PLATFORMS='cpu',
               PYTHONPATH=os.path.dirname(EXAMPLES))
    r = subprocess.run([sys.executable, script], capture_output=True,
                       text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr


def _tiny_run(par, **over):
    from lart_tpu import driver
    small = dict(nphotons=400, batch_size=256, chunk_cycles=8,
                 nx=25, ny=25, nz=25, nxim=17, nyim=17)
    small.update(over)
    for k, v in small.items():
        setattr(par, k, v)
    return driver.run(par, seed=11)


def test_feii_turb_example_end_to_end(tmp_path):
    """FeII_turb: lognormal cube file -> line_type-5 multiplet transfer
    with bturb Doppler broadening and Stokes peel (scaled down)."""
    import importlib.util
    import numpy as np
    from lart_tpu.config import Params

    def load(mod, rel):
        spec = importlib.util.spec_from_file_location(
            mod, os.path.join(EXAMPLES, rel))
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        return m

    mk = load('mk_turb_cube', 'FeII_turb/mk_turb_cube.py')
    rho = mk.make_cube(n=25)
    import h5py
    cube = tmp_path / 'turb_cube.h5'
    with h5py.File(cube, 'w') as fh:
        fh.create_dataset('density', data=rho)
    par = Params.from_namelist(
        os.path.join(EXAMPLES, 'FeII_turb', 'FeII_UV1_V100.in'))
    par.dens_file = str(cube)
    res = _tiny_run(par)
    assert res.nscatt_tot > 0
    assert np.sum(res.peel['scatt'][0]) >= 0
    assert np.trapezoid(np.abs(res.Jout), res.xfreq) > 0


def test_star_planet_example_end_to_end(tmp_path):
    """star_planet: profile tables + line_prof_file + stellar
    illumination through the spherical atmosphere (scaled down)."""
    import importlib.util
    import shutil
    import numpy as np
    from lart_tpu.config import Params

    d = tmp_path / 'sp'
    d.mkdir()
    shutil.copy(os.path.join(EXAMPLES, 'star_planet', 'mk_input_data.py'),
                d / 'mk.py')
    subprocess.run([sys.executable, str(d / 'mk.py')], check=True,
                   capture_output=True)
    par = Params.from_namelist(
        os.path.join(EXAMPLES, 'star_planet', 'star_planet.in'))
    for k in ('dens_file', 'temp_file', 'velo_file', 'line_prof_file'):
        setattr(par, k, str(d / os.path.basename(getattr(par, k))))
    res = _tiny_run(par, nx=33, ny=33, nz=33)
    assert res.flux_factor > 0
    assert 'direc' in res.peel
    assert np.sum(res.peel['direc'][0]) >= 0
