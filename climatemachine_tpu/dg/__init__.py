from climatemachine_tpu.dg.spatial import DGModel
from climatemachine_tpu.dg import numerical_fluxes
