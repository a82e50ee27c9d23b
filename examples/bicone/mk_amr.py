#!/usr/bin/env python
"""Build the generic-AMR file for the biconical-outflow AMR variant
(reference examples/bicone/bicone_amr.in): an AMR sphere whose density is
later masked to a 45-degree double cone by par%cone_opening
(grid geometry override, reference grid_mod_amr.f90:183-200).  The
Hubble outflow is assigned at grid build by par%velocity_type in the
input (assign_amr_velocities_from_type, grid_mod_amr.f90:1134)."""
from lart_tpu.grid.amr import make_amr_sphere, write_generic_amr

data = make_amr_sphere(n_base=32, levels_extra=2, rmax=1.0, T=1e4)
write_generic_amr('bicone_amr.h5', data)
print('wrote bicone_amr.h5')
