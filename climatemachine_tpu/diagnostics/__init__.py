from climatemachine_tpu.diagnostics.machine import (DiagnosticsGroup,
                                                    HorizontalAverage,
                                                    PointwiseDiagnostic)
from climatemachine_tpu.diagnostics.state_check import StateCheck
from climatemachine_tpu.diagnostics.atmos_les import (AtmosLESDefaultGroup,
                                                      AtmosLESCoreGroup)
