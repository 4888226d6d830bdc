"""Physical-constant parameter sets.

TPU-native re-provision of the external CLIMAParameters.jl package (a
de-facto component of the reference; see reference
``src/Driver/Driver.jl:12`` and ``Manifest.toml:82``).  A parameter set is
a frozen dataclass of plain Python floats — static under ``jit``, so every
constant folds into the compiled program.

Values follow the CLIMAParameters.jl Earth defaults.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class PlanetParameterSet:
    """Earth parameter set (CLIMAParameters.Planet equivalent)."""

    # universal
    gas_constant: float = 8.3144598        # J/mol/K
    light_speed: float = 2.99792458e8      # m/s
    k_Boltzmann: float = 1.38064852e-23
    Stefan: float = 5.670367e-8            # W/m^2/K^4
    astro_unit: float = 1.4959787e11       # m

    # planet
    grav: float = 9.81                     # m/s^2
    planet_radius: float = 6.371e6         # m
    day: float = 86400.0                   # s
    Omega: float = 7.2921159e-5            # 1/s planetary rotation rate
    MSLP: float = 1.01325e5                # Pa mean sea-level pressure

    # dry air
    molmass_dryair: float = 28.97e-3       # kg/mol
    kappa_d: float = 2.0 / 7.0             # R_d / cp_d

    # water
    molmass_water: float = 18.01528e-3     # kg/mol
    cp_v: float = 1859.0                   # J/kg/K vapor isobaric heat cap
    cp_l: float = 4181.0                   # liquid
    cp_i: float = 2100.0                   # ice
    T_0: float = 273.16                    # K thermodynamic reference temp
    T_min: float = 150.0                   # K saturation-adjust lower bound
    T_max: float = 1000.0                  # K saturation-adjust upper bound
    T_freeze: float = 273.15               # K freezing point
    T_icenuc: float = 233.0                # K homogeneous ice nucleation
    T_triple: float = 273.16               # K triple point
    press_triple: float = 611.657          # Pa triple-point vapor pressure
    LH_v0: float = 2.5008e6                # J/kg latent heat vaporization @T_0
    LH_s0: float = 2.8344e6                # J/kg latent heat sublimation @T_0

    # reference profile surface values (CLIMAParameters T_surf_ref/T_min_ref)
    T_surf_ref: float = 290.0
    T_min_ref: float = 220.0

    # subgrid scale (CLIMAParameters.Atmos.SubgridScale)
    C_smag: float = 0.21
    Prandtl_turb: float = 1.0 / 3.0

    # surface bulk-transfer coefficient (CLIMAParameters C_drag)
    C_drag: float = 0.0044

    @property
    def inv_Pr_turb(self) -> float:
        return 1.0 / self.Prandtl_turb

    # --- derived (dry air) --------------------------------------------------
    @property
    def R_d(self) -> float:
        return self.gas_constant / self.molmass_dryair

    @property
    def cp_d(self) -> float:
        return self.R_d / self.kappa_d

    @property
    def cv_d(self) -> float:
        return self.cp_d - self.R_d

    # --- derived (moist) ----------------------------------------------------
    @property
    def R_v(self) -> float:
        return self.gas_constant / self.molmass_water

    @property
    def molmass_ratio(self) -> float:
        return self.molmass_dryair / self.molmass_water

    @property
    def cv_v(self) -> float:
        return self.cp_v - self.R_v

    @property
    def cv_l(self) -> float:
        return self.cp_l

    @property
    def cv_i(self) -> float:
        return self.cp_i

    @property
    def LH_f0(self) -> float:
        return self.LH_s0 - self.LH_v0

    @property
    def e_int_v0(self) -> float:
        """Vapor specific internal energy at T_0."""
        return self.LH_v0 - self.R_v * self.T_0

    @property
    def e_int_i0(self) -> float:
        """Ice specific internal energy offset (fusion) at T_0."""
        return self.LH_f0


EARTH = PlanetParameterSet()
