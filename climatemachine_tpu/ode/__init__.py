from climatemachine_tpu.ode.lsrk import (
    LSRK54CarpenterKennedy, LSRK144NiegemannDiehlBusch, LSRKEulerMethod,
    LowStorageRungeKutta2N,
)
from climatemachine_tpu.ode.ssprk import SSPRK33ShuOsher, SSPRK34SpiteriRuuth
from climatemachine_tpu.ode.solve import solve
from climatemachine_tpu.ode import callbacks
