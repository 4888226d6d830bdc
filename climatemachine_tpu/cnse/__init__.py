"""Compressible Navier-Stokes equation (CNSE) test models.

Scope of reference test/Numerics/DGMethods/
compressible_navier_stokes_equations/: self-contained 2-D/3-D
rho-rhou-rhotheta fluids used for the Bickley-jet / buoyancy
cross-implementation regression tables.
"""

from climatemachine_tpu.cnse.two_dimensional import (  # noqa: F401
    BickleyJet, CNSE2DModel, CNSERoeNumericalFlux)
