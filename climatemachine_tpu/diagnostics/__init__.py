from climatemachine_tpu.diagnostics.machine import (DiagnosticsGroup,
                                                    HorizontalAverage,
                                                    PointwiseDiagnostic)
from climatemachine_tpu.diagnostics.state_check import StateCheck
