#!/usr/bin/env python
"""AMR grid for the rotating-halo parity pair (reference builds it with
make_amr_sphere_radial.x; velocities are assigned at grid build from
par%velocity_type='rotating_galaxy_halo')."""
from lart_tpu.grid.amr import make_amr_sphere, write_generic_amr

data = make_amr_sphere(n_base=32, levels_extra=2, rmax=1.0, T=1e4)
write_generic_amr('halo_amr.h5', data)
print('wrote halo_amr.h5')
