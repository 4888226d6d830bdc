from climatemachine_tpu.atmos.model import AtmosModel, AtmosPhysics
from climatemachine_tpu.atmos.ref_state import (HydrostaticState,
                                                NoReferenceState)
from climatemachine_tpu.atmos.sources import (Coriolis, GeostrophicForcing,
                                              Gravity, RayleighSponge)
from climatemachine_tpu.atmos.radiation import (DYCOMSRadiationModel,
                                                NoRadiation)
