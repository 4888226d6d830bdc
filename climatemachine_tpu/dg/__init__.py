from climatemachine_tpu.dg.spatial import DGModel
from climatemachine_tpu.dg.fv import DGFVModel, FVConstant, FVLinear
from climatemachine_tpu.dg.esdg import (
    ESDGModel, EntropyConservativeSurfaceFlux, EntropyStableRusanov)
from climatemachine_tpu.dg import numerical_fluxes
