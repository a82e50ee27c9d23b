#!/usr/bin/env python
"""Generate 1-D radial profiles (density, temperature, emissivity vs r)
for the AlII 1671 diffuse-emission example -- a planetary-nebula-like
ionized shell (reference examples/emiss_1D_AlII uses measured profiles;
here we synthesize the same shapes: a density shell peaking at r~6 pc,
T ~ 8000 K, and line emissivity ~ n^2)."""
import numpy as np

r = np.linspace(0.0, 12.0, 121)
dens = 4e-8 * np.exp(-0.5 * ((r - 6.0) / 2.0) ** 2) + 1e-9
temp = 8000.0 - 150.0 * (r - 6.0)
emiss = dens ** 2 / dens.max() ** 2

np.savetxt('AlII_dens_profile.txt', np.c_[r, dens], fmt='%10.4f %.4e')
np.savetxt('AlII_temp_profile.txt', np.c_[r, temp], fmt='%10.4f %.1f')
np.savetxt('AlII_emiss_profile.txt', np.c_[r, emiss], fmt='%10.4f %.4e')
print('wrote AlII_{dens,temp,emiss}_profile.txt')
