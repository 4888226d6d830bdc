from climatemachine_tpu.ocean.core import (Coupled, FreeSlip, Impenetrable,
                                           Insulating, KinematicStress,
                                           NoSlip, OceanBC, Penetrable,
                                           TemperatureFlux, Uncoupled)
from climatemachine_tpu.ocean.hydrostatic_boussinesq import (
    HydrostaticBoussinesqModel, LinearHBModel)
from climatemachine_tpu.ocean.shallow_water import ShallowWaterModel
