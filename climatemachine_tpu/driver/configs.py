"""Driver configurations: topology+grid+model assembly per config type.

Scope of reference ``src/Driver/driver_configs.jl``: DriverConfiguration
(:109), AtmosLESConfiguration (:193), AtmosGCMConfiguration (:344),
SingleStackConfiguration (:555), OceanBoxGCMConfiguration (:470) and
``src/Driver/ConfigTypes`` singletons.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence, Tuple

import numpy as np

from climatemachine_tpu.dg.numerical_fluxes import (
    CentralNumericalFluxGradient, CentralNumericalFluxSecondOrder,
    RusanovNumericalFlux)
from climatemachine_tpu.mesh.grid import Grid, make_grid
from climatemachine_tpu.mesh import topology as topo_mod


# --- config types (reference ConfigTypes.jl) -------------------------------
class AtmosLESConfigType:  pass
class AtmosGCMConfigType:  pass
class OceanBoxGCMConfigType:  pass
class OceanSplitExplicitConfigType:  pass
class SingleStackConfigType:  pass
class MultiColumnLandConfigType:  pass


@dataclass
class DriverConfiguration:
    """(reference driver_configs.jl:109)"""
    config_type: object
    name: str
    polyorder: object
    grid: Grid
    model: object                      # BalanceLaw
    numerical_flux_first_order: object = field(
        default_factory=RusanovNumericalFlux)
    numerical_flux_gradient: object = field(
        default_factory=CentralNumericalFluxGradient)
    numerical_flux_second_order: object = field(
        default_factory=CentralNumericalFluxSecondOrder)
    config_info: dict = field(default_factory=dict)


def grid_stretching_1d(x0: float, x1: float, n: int,
                       stretch: Optional[float] = None) -> np.ndarray:
    """Element interfaces, optionally tanh-stretched toward x0 (reference
    SingleExponentialStretching in Mesh/Topologies grid stretching)."""
    s = np.linspace(0.0, 1.0, n + 1)
    if stretch:
        s = (np.exp(stretch * s) - 1) / (np.exp(stretch) - 1)
    return x0 + (x1 - x0) * s


def AtmosLESConfiguration(name: str, polyorder, resolution: Tuple,
                          xmax: float, ymax: float, zmax: float,
                          model, periodicity=(True, True, False),
                          boundary=((0, 0), (0, 0), (1, 2)),
                          dtype=None) -> DriverConfiguration:
    """LES box: StackedBrickTopology with (Δx, Δy, Δz) resolution
    (reference driver_configs.jl:193)."""
    dx, dy, dz = resolution
    N = polyorder if isinstance(polyorder, int) else polyorder[0]
    # effective resolution: element size = Δ * N (reference spacing logic)
    nex = max(int(round(xmax / (dx * max(N, 1)))), 1)
    ney = max(int(round(ymax / (dy * max(N, 1)))), 1)
    nez = max(int(round(zmax / (dz * max(N, 1)))), 1)
    ranges = [np.linspace(0.0, xmax, nex + 1),
              np.linspace(0.0, ymax, ney + 1),
              np.linspace(0.0, zmax, nez + 1)]
    topology = topo_mod.stacked_brick_topology(
        ranges, periodicity=periodicity, boundary=np.asarray(boundary))
    grid = make_grid(topology, polyorder, dtype=dtype)
    return DriverConfiguration(AtmosLESConfigType(), name, polyorder, grid,
                               model,
                               config_info=dict(resolution=resolution))


def AtmosGCMConfiguration(name: str, polyorder, resolution: Tuple[int, int],
                          domain_height: float, model,
                          planet_radius: Optional[float] = None,
                          dtype=None, meshwarp=None) -> DriverConfiguration:
    """GCM cubed sphere: (n_horz, n_vert) elements (reference
    driver_configs.jl:344).  ``meshwarp`` overrides the shell warp (a
    callable or warp name — e.g. a topography warp, reference
    solid_body_rotation_mountain.jl:94 set_topofun)."""
    n_horz, n_vert = resolution
    a = planet_radius
    if a is None:
        a = model.param_set.planet_radius
    vert_range = a + np.linspace(0.0, domain_height, n_vert + 1)
    topology = topo_mod.stacked_cubed_sphere_topology(
        n_horz, vert_range,
        **(dict(warp=meshwarp) if meshwarp is not None else {}))
    grid = make_grid(topology, polyorder, dtype=dtype)
    return DriverConfiguration(AtmosGCMConfigType(), name, polyorder, grid,
                               model,
                               config_info=dict(n_horz=n_horz,
                                                n_vert=n_vert,
                                                domain_height=domain_height))


def SingleStackConfiguration(name: str, polyorder, nelem_vert: int,
                             zmax: float, model, hmax: float = 1.0,
                             dtype=None) -> DriverConfiguration:
    """1-column config (reference driver_configs.jl:555)."""
    z = np.linspace(0.0, zmax, nelem_vert + 1)
    topology = topo_mod.single_stack_topology(hmax, hmax, z)
    grid = make_grid(topology, polyorder, dtype=dtype)
    return DriverConfiguration(SingleStackConfigType(), name, polyorder,
                               grid, model,
                               config_info=dict(zmax=zmax))


def MultiColumnLandModelConfiguration(
        name: str, polyorder, resolution: Tuple,
        xmax: float, ymax: float, zmax: float, model,
        zmin: float = 0.0, periodicity=(False, False, False),
        boundary=((3, 4), (5, 6), (1, 2)),
        dtype=None) -> DriverConfiguration:
    """Multi-column land configuration (reference driver_configs.jl:659
    MultiColumnLandModel): a stacked brick [0,xmax]x[0,ymax]x[zmin,zmax]
    with per-face boundary tags and element size Delta*N, defaulting to
    central numerical fluxes (land physics is diffusion-dominated)."""
    dx, dy, dz = resolution
    if isinstance(polyorder, int):
        N_h = N_v = polyorder
    else:
        N_h, N_v = polyorder
    nex = max(int(round(xmax / (dx * max(N_h, 1)))), 1)
    ney = max(int(round(ymax / (dy * max(N_h, 1)))), 1)
    nez = max(int(round((zmax - zmin) / (dz * max(N_v, 1)))), 1)
    ranges = [np.linspace(0.0, xmax, nex + 1),
              np.linspace(0.0, ymax, ney + 1),
              np.linspace(zmin, zmax, nez + 1)]
    topology = topo_mod.stacked_brick_topology(
        ranges, periodicity=periodicity, boundary=np.asarray(boundary))
    grid = make_grid(topology, polyorder, dtype=dtype)
    from climatemachine_tpu.dg.numerical_fluxes import (
        CentralNumericalFluxFirstOrder)
    return DriverConfiguration(
        MultiColumnLandConfigType(), name, polyorder, grid, model,
        numerical_flux_first_order=CentralNumericalFluxFirstOrder(),
        config_info=dict(resolution=resolution))
