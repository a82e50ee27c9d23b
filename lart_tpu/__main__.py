"""CLI: python -m lart_tpu input.in  (same usage as the reference LaRT.x)."""

import os
import sys
import time

# LART_CPU=1 routes a CLI run onto the virtual CPU mesh (this image's
# sitecustomize force-registers the TPU plugin in every interpreter,
# overriding JAX_PLATFORMS).  Must happen before the engine import below:
# module-level jnp constants initialize the backend at import time.
if os.environ.get('LART_CPU'):
    from .utils.platform import force_cpu
    force_cpu(int(os.environ.get('LART_CPU_DEVICES', '8')))

from .config import Params
from . import driver
from .io.writer import write_output, output_filename


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m lart_tpu <input.in> [output.h5]")
        return 1
    par = Params.from_namelist(argv[0])
    if not par.out_file.strip():
        from .io.iofile import default_extension
        base = argv[0]
        for ext in ('.in', '.txt'):
            if base.endswith(ext):
                base = base[:-len(ext)]
        par.out_file = (argv[1] if len(argv) > 1
                        else base + default_extension(par.file_format))

    t_last = [time.time()]

    def progress(launched, nphotons, alive):
        now = time.time()
        if now - t_last[0] > 10.0:
            print(f"{launched:.5e} photons launched, {alive} lanes alive",
                  flush=True)
            t_last[0] = now

    res = driver.run(par, progress=progress)
    print(f"Average Number of scattering : {res.nscatt_tot:.4e}")
    print(f"Total Execution Time : {res.exetime_s/60.0:.3f} mins")
    import jax
    fn = write_output(par.out_file, res, nproc=len(jax.devices()))
    print(f"output written: {fn}")
    return 0


if __name__ == '__main__':
    sys.exit(main())
