"""FITS<->HDF5 LaRT output converter CLI (the reference's
python/lart_io.py:122-506).  Thin alias over the io/iofile.py converter:

    python -m lart_tpu.tools.lart_io out.h5 out.fits.gz
"""
from ..io.iofile import main

if __name__ == '__main__':
    raise SystemExit(main())
