"""Diagnostics engine: declared variables -> collect -> reduce -> write.

Scope of reference ``src/DiagnosticsMachine/`` (@diagnostics_group codegen
:127, DiagnosticVar kinds ``PointwiseDiagnostic``/``HorizontalAverage``,
variables.jl:332) and ``src/Diagnostics/`` hand-written groups
(atmos_les_default, atmos_gcm_default) — the macro codegen is replaced by
plain declarative Python objects whose collect step is jitted once.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class PointwiseDiagnostic:
    """fn(model, q, aux, grid) -> [E, Np] nodal values (reference
    PointwiseDiagnostic)."""
    name: str
    fn: Callable
    units: str = ""


@dataclass
class HorizontalAverage:
    """Mass-weighted horizontal average per vertical level (reference
    HorizontalAverage): fn -> [E, Np]; result [nlevels]."""
    name: str
    fn: Callable
    units: str = ""


def horizontal_average(grid, f):
    """[E, Np] -> [n_vert*Nq3] M-weighted average per level."""
    Nq1, Nq2, Nq3 = grid.Nq
    nv, nh = grid.n_vert, grid.n_horz
    fs = f.reshape(nh, nv, Nq3, Nq2 * Nq1)
    Ms = grid.M.reshape(nh, nv, Nq3, Nq2 * Nq1)
    num = jnp.sum(fs * Ms, axis=(0, 3))
    den = jnp.sum(Ms, axis=(0, 3))
    return (num / den).reshape(nv * Nq3)


class DiagnosticsGroup:
    """(reference DiagnosticsGroup, groups.jl:20) A named set of
    diagnostic variables collected on an interval and written out.

    ``interpolator``: optional mesh.interpolation interpolator applied to
    pointwise fields before writing (reference interpolate+gather path).
    """

    def __init__(self, name: str, model, grid,
                 variables: Sequence, writer=None, out_path: str = None,
                 interpolator=None):
        self.name = name
        self.model = model
        self.grid = grid
        self.variables = list(variables)
        self.writer = writer
        self.out_path = out_path
        self.interpolator = interpolator
        self._collect = jax.jit(self._build_collect())
        self._initialized = False

    def _build_collect(self):
        def collect(q, aux):
            out = {}
            for var in self.variables:
                vals = var.fn(self.model, q, aux, self.grid)
                if isinstance(var, HorizontalAverage):
                    out[var.name] = horizontal_average(self.grid, vals)
                elif self.interpolator is not None:
                    out[var.name] = self.interpolator(vals)
                else:
                    out[var.name] = vals
            return out
        return collect

    def collect(self, q, aux):
        return {k: np.asarray(v) for k, v in self._collect(q, aux).items()}

    # --- writer integration -------------------------------------------------
    def _dims(self):
        dims = {}
        g = self.grid
        if self.interpolator is not None and hasattr(self.interpolator,
                                                     "latlon"):
            lats, lons, rads = self.interpolator.latlon
            dims = {"lat": np.asarray(lats), "lon": np.asarray(lons),
                    "level": np.asarray(rads)}
        elif any(isinstance(v, HorizontalAverage) for v in self.variables):
            dims["zlevel"] = np.arange(g.n_vert * g.Nq[2], dtype=np.float64)
        return dims

    def write(self, q, aux, t):
        vals = self.collect(q, aux)
        if self.writer is None:
            return vals
        if not self._initialized:
            dims = self._dims()
            vars_ = {}
            for var in self.variables:
                v = vals[var.name]
                if isinstance(var, HorizontalAverage):
                    vars_[var.name] = (("zlevel",), np.float64)
                elif self.interpolator is not None:
                    vars_[var.name] = (tuple(dims.keys()), np.float64)
                else:
                    # raw nodal dump: flatten to one dim
                    dims.setdefault("node", np.arange(v.size,
                                                      dtype=np.float64))
                    vars_[var.name] = (("node",), np.float64)
            self.writer.init_data(self.out_path, dims, vars_)
            self._initialized = True
        flat = {}
        for var in self.variables:
            v = vals[var.name]
            if (self.interpolator is None
                    and not isinstance(var, HorizontalAverage)):
                v = v.reshape(-1)
            flat[var.name] = v
        self.writer.append_data(self.out_path, flat, t)
        return vals

    def make_callback(self, every_steps: int):
        from climatemachine_tpu.driver.callbacks import EveryXSimulationSteps

        def fn(state):
            self.write(state.q, state.aux, state.t)

        return EveryXSimulationSteps(fn, every_steps)


# --- standard variable sets -------------------------------------------------

def atmos_default_vars(model):
    """Reference StdDiagnostics AtmosLES/GCMDefault core subset."""
    def rho(m, q, aux, g):
        return m.prog(q, "rho")

    def u_(i):
        def f(m, q, aux, g):
            return m.prog(q, "rhou")[..., i] / m.prog(q, "rho")
        return f

    def temp(m, q, aux, g):
        T, p, u = m.recover_thermo(q, aux)
        return T

    def pres(m, q, aux, g):
        T, p, u = m.recover_thermo(q, aux)
        return p

    def thetav(m, q, aux, g):
        ps = m.param_set
        T, p, u = m.recover_thermo(q, aux)
        return T * (ps.MSLP / p) ** ps.kappa_d

    out = [
        PointwiseDiagnostic("rho", rho, "kg/m^3"),
        PointwiseDiagnostic("u", u_(0), "m/s"),
        PointwiseDiagnostic("v", u_(1), "m/s"),
        PointwiseDiagnostic("w", u_(2), "m/s"),
        PointwiseDiagnostic("temp", temp, "K"),
        PointwiseDiagnostic("pres", pres, "Pa"),
        PointwiseDiagnostic("thv", thetav, "K"),
    ]
    if model.physics.moisture.vars_prognostic().num:
        def qt(m, q, aux, g):
            return m.prog(q, "moisture.rhoq_tot") / m.prog(q, "rho")
        out.append(PointwiseDiagnostic("qt", qt, "kg/kg"))
    return out


def atmos_les_profiles(model):
    """Horizontal-average profiles (reference atmos_les_default)."""
    pw = atmos_default_vars(model)
    return [HorizontalAverage(v.name + "_avg", v.fn, v.units) for v in pw]
