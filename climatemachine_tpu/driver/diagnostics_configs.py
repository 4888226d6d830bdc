"""Diagnostics configuration for the driver.

Scope of reference ``src/Driver/diagnostics_configs.jl``
(DiagnosticsConfiguration :11, InterpolationConfiguration :19-95).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

import numpy as np


@dataclass
class DiagnosticsConfiguration:
    """Bundle of DiagnosticsGroups fired on step intervals."""
    groups: Sequence = ()
    every_steps: int = 100

    def make_callbacks(self, solver_config, dt):
        return [g.make_callback(self.every_steps) for g in self.groups]


def InterpolationConfiguration(driver_config, resolution=None,
                               boundaries=None):
    """Build an interpolator matching the config's grid (reference
    diagnostics_configs.jl:19-95): brick -> regular x-y-z, cubed sphere ->
    lat-lon-level."""
    from climatemachine_tpu.driver.configs import (AtmosGCMConfigType,
                                                   AtmosLESConfigType)
    from climatemachine_tpu.mesh import interpolation as interp

    grid = driver_config.grid
    if isinstance(driver_config.config_type, AtmosGCMConfigType):
        info = driver_config.config_info
        nlat, nlon, nlev = resolution or (91, 180, info.get("n_vert", 4) * 4)
        a = driver_config.model.param_set.planet_radius
        H = info.get("domain_height", 30e3)
        lats = np.linspace(-89.5, 89.5, nlat)
        lons = np.linspace(-180.0, 179.0, nlon)
        rads = a + np.linspace(0.0, H, nlev + 1)[:-1] + H / (2 * nlev)
        return interp.InterpolationCubedSphere(grid, lats, lons, rads)
    # brick / LES
    coords = np.asarray(grid.coords).reshape(-1, grid.coords.shape[-1])
    mins, maxs = coords.min(axis=0), coords.max(axis=0)
    if resolution is None:
        resolution = (16, 16, 16)
    axes = [np.linspace(mins[d], maxs[d], resolution[d]) for d in range(3)]
    return interp.InterpolationBrick(grid, *axes)
