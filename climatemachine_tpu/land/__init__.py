from climatemachine_tpu.land.model import (LandModel, SoilHeatModel,
                                           SoilModel, SoilWaterModel)
from climatemachine_tpu.land.soil_params import (BrooksCorey, SoilParams,
                                                 vanGenuchten)
