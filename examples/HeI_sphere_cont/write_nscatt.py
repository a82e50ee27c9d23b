"""Tabulate <N_scatt>(tau0) for the HeI continuum-injection spheres
(reference: examples/HeI_sphere_cont/write_nscatt2.py ->
Nscatt_sphere_uniform_voigt.txt)."""
import glob
import os

from lart_tpu import analysis

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    rows = []
    for path in sorted(glob.glob(os.path.join(HERE, 't4tau*.h5'))):
        out = analysis.read_lart(path)
        rows.append((out.attr('taumax'), out.nscatt_tot))
    with open(os.path.join(HERE, 'Nscatt_sphere_uniform_cont.txt'),
              'w') as fh:
        fh.write('# tau0      <N_scatt>\n')
        for tau, ns in sorted(rows):
            fh.write(f'{tau:.4e}  {ns:.6e}\n')
    for tau, ns in sorted(rows):
        print(f'tau0={tau:.1e}  <N_scatt>={ns:.4e}')


if __name__ == '__main__':
    main()
