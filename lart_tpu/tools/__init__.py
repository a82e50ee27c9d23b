"""Standalone CLI tools (the reference's extra Makefile targets:
make_sightline_tau.x, make_amr_sphere_radial.x, make_clumps.x,
convert_ramses_to_generic.x; reference Makefile:200-240)."""
