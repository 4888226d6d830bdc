"""One-import user API facade (the role of ``using ClimateMachine`` +
submodule re-exports in the reference): everything a typical experiment
script needs.

>>> from climatemachine_tpu import driver_api as cm
>>> cm.init()
>>> dc = cm.AtmosLESConfiguration(...)
>>> sc = cm.make_solver_configuration(0.0, 3600.0, dc)
>>> cm.invoke(sc)
"""

# flake8: noqa: F401

from climatemachine_tpu.physics import thermodynamics as td
from climatemachine_tpu.physics.parameters import EARTH, PlanetParameterSet
from climatemachine_tpu.physics.temperature_profiles import (
    DecayingTemperatureProfile, DryAdiabaticProfile,
    IsothermalProfile)

from climatemachine_tpu.atmos import (AtmosModel, AtmosPhysics, Coriolis,
                                      GeostrophicForcing, Gravity,
                                      HydrostaticState, RayleighSponge)
from climatemachine_tpu.atmos.sources import Subsidence
from climatemachine_tpu.atmos.boundaryconditions import (
    AtmosBC, BulkFormulaEnergy, BulkFormulaMoisture, DragLaw, FreeSlip,
    Impenetrable, Impermeable, InitStateBC, Insulating, NoSlip,
    PrescribedEnergyFlux, PrescribedMoistureFlux, PrescribedTemperature)
from climatemachine_tpu.atmos.compressibility import (Anelastic1D,
                                                      Compressible)
from climatemachine_tpu.atmos.edmf import EDMF
from climatemachine_tpu.atmos.radiation import (DYCOMSRadiationModel,
                                                NoRadiation)
from climatemachine_tpu.atmos.energy import ThetaModel, TotalEnergyModel
from climatemachine_tpu.atmos.hyperdiffusion import (DryBiharmonic,
                                                     EquilMoistBiharmonic)
from climatemachine_tpu.atmos.lsforcing import HadGEMVertical
from climatemachine_tpu.atmos.model import AtmosProblem
from climatemachine_tpu.atmos.moisture import (DryModel, EquilMoist,
                                               NonEquilMoist)
from climatemachine_tpu.atmos.precipitation import (RainModel,
                                                    RainSnowModel)
from climatemachine_tpu.atmos.tracers import NTracers

from climatemachine_tpu.common.orientations import (FlatOrientation,
                                                    NoOrientation,
                                                    SphericalOrientation)
from climatemachine_tpu.common.turbulence import (AnisoMinDiss,
                                                  ConstantDynamicViscosity,
                                                  ConstantKinematicViscosity,
                                                  Deardorff,
                                                  SmagorinskyLilly,
                                                  UpperAtmosSponge, Vreman)

from climatemachine_tpu.dg.spatial import (DGModel, init_ode_state,
                                           remainder_DGModel)
from climatemachine_tpu.dg.numerical_fluxes import (
    CentralNumericalFluxFirstOrder, CentralNumericalFluxGradient,
    CentralNumericalFluxSecondOrder, RusanovNumericalFlux)
from climatemachine_tpu.atmos.numerical_fluxes import (HLLCNumericalFlux,
                                                       LMARSNumericalFlux,
                                                       RoeNumericalFlux)

from climatemachine_tpu.mesh.grid import make_grid, min_node_distance
from climatemachine_tpu.mesh import topology

from climatemachine_tpu.ode.lsrk import (LSRK54CarpenterKennedy,
                                         LSRK144NiegemannDiehlBusch)
from climatemachine_tpu.ode.ssprk import SSPRK33ShuOsher
from climatemachine_tpu.ode.solve import solve

from climatemachine_tpu.driver.configs import (
    AtmosGCMConfiguration, AtmosLESConfiguration, DriverConfiguration,
    MultiColumnLandModelConfiguration, SingleStackConfiguration)
from climatemachine_tpu.driver.driver import SETTINGS, init, invoke
from climatemachine_tpu.driver.solver_configs import (
    SolverConfiguration, make_solver_configuration)
from climatemachine_tpu.driver.solver_types import (ExplicitSolverType,
                                                    IMEXSolverType,
                                                    MISSolverType,
                                                    MultirateSolverType)

from climatemachine_tpu.ocean.hydrostatic_boussinesq import (
    HydrostaticBoussinesqModel)
from climatemachine_tpu.ocean.problems import (OceanGyre, SimpleBox,
                                               ocean_box_grid)
from climatemachine_tpu.ocean.shallow_water import ShallowWaterModel
from climatemachine_tpu.ocean.super_model import (
    HydrostaticBoussinesqSuperModel, InitialConditions, RectangularDomain)

from climatemachine_tpu.land import (LandModel, SoilHeatModel, SoilModel,
                                     SoilParams, SoilWaterModel,
                                     vanGenuchten)

from climatemachine_tpu.diagnostics.machine import (DiagnosticsGroup,
                                                    HorizontalAverage,
                                                    PointwiseDiagnostic,
                                                    atmos_default_vars,
                                                    atmos_les_profiles)
