from climatemachine_tpu.balance_laws.interface import BalanceLaw
from climatemachine_tpu.balance_laws.state_types import (
    Prognostic, Auxiliary, Gradient, GradientFlux, GradientLaplacian,
    Hyperdiffusive, UpwardIntegrals, DownwardIntegrals, Primitive, Entropy,
)
