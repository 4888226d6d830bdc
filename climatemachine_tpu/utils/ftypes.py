"""Float-type policy.

The Julia reference runs Float64 everywhere. On TPU, f64 is emulated and
slow; the framework therefore computes grid geometry in numpy float64 and
runs device kernels in a configurable dtype (float32 by default, float64
available for validation when ``jax.config.update('jax_enable_x64', True)``
is set before use).
"""

import numpy as np

_DEFAULT_FLOAT = np.float32


def default_float():
    """Device dtype used for state arrays and geometry uploaded to device."""
    return _DEFAULT_FLOAT


def set_default_float(dtype):
    global _DEFAULT_FLOAT
    _DEFAULT_FLOAT = np.dtype(dtype).type
