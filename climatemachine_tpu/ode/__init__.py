from climatemachine_tpu.ode.lsrk import (
    LSRK54CarpenterKennedy, LSRK144NiegemannDiehlBusch, LSRKEulerMethod,
    LowStorageRungeKutta2N,
)
from climatemachine_tpu.ode.ssprk import SSPRK33ShuOsher, SSPRK34SpiteriRuuth
from climatemachine_tpu.ode.mrigark import (
    MRIGARKERK33aSandu, MRIGARKERK45aSandu, MRIGARKIRK21aSandu,
    MRIGARKESDIRK34aSandu, MRIGARKESDIRK46aSandu,
    MRIGARKExplicit, MRIGARKDecoupledImplicit,
)
from climatemachine_tpu.ode.solve import solve
from climatemachine_tpu.ode import callbacks
from climatemachine_tpu.ode.external import DiffraxSolver, ExternalODESolver
