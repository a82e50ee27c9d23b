#!/usr/bin/env python
"""Surface-brightness radial profile from the peel image of an SSH halo
run (reference examples/SSH_MUSE/radial_profile.py): azimuthally averaged
I(r) from the scattered+direct peel map, for comparison against the
MUSE/Leclercq+2017 halo profiles."""
import sys

import numpy as np

from lart_tpu.analysis import read_lart


def radial_profile(img, nbin=30):
    ny, nx = img.shape[-2:]
    yy, xx = np.indices((ny, nx))
    r = np.hypot(xx - (nx - 1) / 2.0, yy - (ny - 1) / 2.0)
    edges = np.linspace(0.0, r.max(), nbin + 1)
    idx = np.clip(np.digitize(r.ravel(), edges) - 1, 0, nbin - 1)
    flat = img.reshape(-1, img.shape[-1] * img.shape[-2]) \
        if img.ndim > 2 else img.ravel()[None]
    prof = np.zeros(nbin)
    cnt = np.bincount(idx, minlength=nbin)
    prof = np.bincount(idx, weights=img.sum(axis=0).ravel()
                       if img.ndim > 2 else img.ravel(),
                       minlength=nbin) / np.maximum(cnt, 1)
    rmid = 0.5 * (edges[:-1] + edges[1:])
    return rmid, prof


if __name__ == '__main__':
    for fn in sys.argv[1:] or ['halo_1185.h5']:
        o = read_lart(fn)
        peel = o.sections.get('Peel_0') if o.sections else None
        if peel is None:
            print(f'{fn}: no peel section; run with save_peeloff')
            continue
        img = np.asarray(peel.get('scatt')) + np.asarray(peel.get('direc'))
        rmid, prof = radial_profile(img)
        for r, p in zip(rmid, prof):
            print(f'{fn} {r:8.2f} {p:.5e}')
