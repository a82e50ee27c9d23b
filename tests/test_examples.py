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
