"""Remaining standard diagnostics groups.

Scope of reference ``src/Diagnostics/``:
- ``atmos_mass_energy_loss.jl`` — "AtmosMassEnergyLoss": relative drift of
  total mass and total energy since initialization (weightedsum-based);
- ``atmos_turbulence_stats.jl`` — "AtmosTurbulenceStats": volume-averaged
  dimensionless kinetic energy E_k and its dissipation rate dE;
- ``atmos_refstate_perturbations.jl`` — "AtmosRefStatePerturbations":
  pointwise (rho, pres, temp, et, qt) perturbations from the hydrostatic
  reference state on an interpolated grid;
- ``atmos_les_spectra.jl`` / ``atmos_gcm_spectra.jl`` — KE power spectra
  on interpolated grids;
- ``dump_state.jl`` / ``dump_aux.jl`` / ``dump_tendencies.jl`` — raw
  flattened-variable dumps.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.common.spectra import (power_spectrum_1d,
                                               power_spectrum_3d)
from climatemachine_tpu.dg.reductions import weightedsum


class _ScalarGroup:
    """Scalar time-series group: subclass provides _collect_impl
    (jit-compiled) and _names."""

    name = "Scalars"

    def __init__(self, dg, writer=None, out_path: Optional[str] = None):
        self.dg = dg
        self.model = dg.balance_law
        self.grid = dg.grid
        self.writer = writer
        self.out_path = out_path
        self._initialized = False
        self._collect = jax.jit(self._collect_impl)

    def collect(self, q, aux, t=0.0):
        return {k: np.asarray(v)
                for k, v in self._collect(q, aux, t).items()}

    def write(self, q, aux, t):
        vals = self.collect(q, aux, t)
        vals = self._post(vals)
        if self.writer is None:
            return vals
        if not self._initialized:
            self.writer.init_data(self.out_path, self._dims(),
                                  {k: (self._var_dims(k), np.float64)
                                   for k in vals})
            self._initialized = True
        self.writer.append_data(self.out_path, vals, t)
        return vals

    def _post(self, vals):
        return vals

    def _dims(self):
        return {}

    def _var_dims(self, name):
        return ()

    def make_callback(self, every_steps: int):
        from climatemachine_tpu.driver.callbacks import EveryXSimulationSteps

        def fn(state):
            self.write(state.q, state.aux, state.t)

        return EveryXSimulationSteps(fn, every_steps)


class AtmosMassEnergyLossGroup(_ScalarGroup):
    """Relative mass/energy drift since the first collect (reference
    atmos_mass_energy_loss.jl:67-112: delta = (S - S0)/S0 with
    S = weightedsum over rho / rhoe)."""

    name = "AtmosMassEnergyLoss"

    def __init__(self, dg, writer=None, out_path=None):
        super().__init__(dg, writer, out_path)
        self._sum0 = None

    def _collect_impl(self, q, aux, t):
        s = self.model.prog_spec
        i_rho = s.index("rho").start
        i_rhoe = s.index("rhoe").start
        return {"mass": weightedsum(self.grid, q, i_rho),
                "energy": weightedsum(self.grid, q, i_rhoe)}

    def _post(self, vals):
        if self._sum0 is None:
            self._sum0 = dict(vals)
        return {"delta_mass":
                (vals["mass"] - self._sum0["mass"]) / self._sum0["mass"],
                "delta_energy": (vals["energy"] - self._sum0["energy"])
                / self._sum0["energy"]}


class AtmosTurbulenceStatsGroup(_ScalarGroup):
    """Volume-averaged dimensionless KE and its dissipation (reference
    atmos_turbulence_stats.jl: E_k = <|u/nor|^2>/2 quadrature-averaged;
    dE = (E_k_prev - E_k)/iter)."""

    name = "AtmosTurbulenceStats"

    def __init__(self, dg, nor: float, iter_: float, writer=None,
                 out_path=None):
        super().__init__(dg, writer, out_path)
        self.nor = nor
        self.iter = iter_
        self._prev = None

    def _collect_impl(self, q, aux, t):
        bl, g = self.model, self.grid
        rho = bl.prog(q, "rho")
        u = bl.prog(q, "rhou") / rho[..., None] / self.nor
        ke = 0.5 * jnp.sum(u * u, axis=-1)
        M = jnp.asarray(g.M, dtype=q.dtype)
        return {"E_k": jnp.sum(M * ke) / jnp.sum(M)}

    def _post(self, vals):
        ek = vals["E_k"]
        de = 0.0 if self._prev is None else (self._prev - ek) / self.iter
        self._prev = ek
        return {"E_k": ek, "dE": np.float64(de)}


class AtmosRefStatePerturbationsGroup(_ScalarGroup):
    """Pointwise perturbations from the hydrostatic reference state on an
    interpolated grid (reference atmos_refstate_perturbations.jl: rho,
    pres, temp, et, qt)."""

    name = "AtmosRefStatePerturbations"

    def __init__(self, dg, interpolator, writer=None, out_path=None):
        self.interpolator = interpolator
        super().__init__(dg, writer, out_path)

    def _collect_impl(self, q, aux, t):
        bl = self.model
        a = bl.aux_spec
        rho = bl.prog(q, "rho")
        T, p, _, pp = bl.thermo_full(q, aux)
        out = {
            "rho": rho - a.get(aux, "ref_state.rho"),
            "pres": p - a.get(aux, "ref_state.p"),
            "temp": T - a.get(aux, "ref_state.T"),
            "et": (bl.prog(q, "rhoe") - a.get(aux, "ref_state.rhoe")) / rho,
        }
        if pp is not None:
            try:
                qt_ref = a.get(aux, "ref_state.rhoq_tot") / \
                    a.get(aux, "ref_state.rho")
            except KeyError:
                qt_ref = jnp.zeros_like(rho)
            out["qt"] = pp.tot - qt_ref
        return {k: self.interpolator(v) for k, v in out.items()}

    def _dims(self):
        itp = self.interpolator
        if hasattr(itp, "latlon"):
            lats, lons, rads = itp.latlon
            return {"lat": np.asarray(lats), "long": np.asarray(lons),
                    "level": np.asarray(rads)}
        return {d: np.asarray(v)
                for d, v in zip(("x", "y", "z"), itp.xyz)}

    def _var_dims(self, name):
        return tuple(self._dims().keys())


class AtmosLESSpectraGroup:
    """3-D KE power spectrum on an interpolated equispaced box (reference
    atmos_les_spectra.jl: "spectrum" on the k dimension)."""

    name = "AtmosLESSpectra"

    def __init__(self, dg, interpolator, L: float, nor: float = 1.0,
                 writer=None, out_path=None):
        self.dg = dg
        self.model = dg.balance_law
        self.interpolator = interpolator
        self.L = L
        self.nor = nor
        self.writer = writer
        self.out_path = out_path
        self._initialized = False

        bl = self.model

        def vel(q):
            return bl.prog(q, "rhou") / bl.prog(q, "rho")[..., None]

        self._vel = jax.jit(
            lambda q: tuple(interpolator(vel(q)[..., i]) for i in range(3)))

    def collect(self, q, aux=None, t=0.0):
        u, v, w = (np.asarray(x) / self.nor for x in self._vel(q))
        k, spec = power_spectrum_3d(u, v, w, self.L)
        return {"k": k, "spectrum": spec}

    def write(self, q, aux, t):
        vals = self.collect(q, aux, t)
        if self.writer is None:
            return vals
        if not self._initialized:
            self.writer.init_data(self.out_path, {"k": vals["k"]},
                                  {"spectrum": (("k",), np.float64)})
            self._initialized = True
        self.writer.append_data(self.out_path,
                                {"spectrum": vals["spectrum"]}, t)
        return vals

    def make_callback(self, every_steps: int):
        from climatemachine_tpu.driver.callbacks import EveryXSimulationSteps

        def fn(state):
            self.write(state.q, state.aux, state.t)

        return EveryXSimulationSteps(fn, every_steps)


class AtmosGCMSpectraGroup:
    """Zonal KE spectrum on an interpolated lat-lon-level grid (reference
    atmos_gcm_spectra.jl: "spectrum_1d" of 0.5(u^2+v^2) per zonal
    wavenumber, latitude-weighted average).

    When the interpolation latitudes are Gauss-Legendre nodes (use
    ``spectra.gaussian_lats_deg``), additionally emits the full
    spherical-harmonic spectrum "spectrum_2d" [m, n, level] (reference
    power_spectrum_gcm.jl:78 power_spectrum_2d)."""

    name = "AtmosGCMSpectra"

    def __init__(self, dg, interpolator, writer=None, out_path=None):
        self.dg = dg
        self.model = dg.balance_law
        self.interpolator = interpolator
        self.writer = writer
        self.out_path = out_path
        self._initialized = False
        lats, lons, rads = interpolator.latlon
        self.lats, self.lons, self.rads = (np.asarray(lats),
                                           np.asarray(lons),
                                           np.asarray(rads))
        from climatemachine_tpu.common.spectra import (gaussian_latitudes,
                                                       legendre_table)
        sin_g, w_g = gaussian_latitudes(len(self.lats))
        self._sph = None
        if np.allclose(np.sin(np.deg2rad(self.lats)), sin_g, atol=1e-8):
            num_four = max((len(self.lons) - 1) // 2, 1)
            num_sph = min(len(self.lats) - 1, 2 * num_four)
            P = legendre_table(num_four, num_sph, sin_g)
            self._sph = (P, w_g)

        bl = self.model

        def vel(q, aux):
            u = bl.prog(q, "rhou") / bl.prog(q, "rho")[..., None]
            return tuple(interpolator(u[..., i]) for i in range(3))

        self._vel = jax.jit(vel)

    def collect(self, q, aux, t=0.0):
        from climatemachine_tpu.mesh.interpolation import \
            project_cubed_sphere
        ux, uy, uz = (np.asarray(x) for x in self._vel(q, aux))
        vec = np.stack([ux, uy, uz], axis=-1)      # [lat, lon, lev, 3]
        sph = project_cubed_sphere((self.lats, self.lons), vec)
        u_zon, u_mer = sph[..., 0], sph[..., 1]
        ke = 0.5 * (u_zon ** 2 + u_mer ** 2)
        w = np.cos(np.deg2rad(self.lats))
        spec = power_spectrum_1d(ke, lat_weights=w)  # [nk, nlev]
        out = {"spectrum_1d": spec}
        if self._sph is not None:
            from climatemachine_tpu.common.spectra import power_spectrum_2d
            P, w_g = self._sph
            # [lat, lon, lev] -> [lon, lat, lev] for the transform
            out["spectrum_2d"] = power_spectrum_2d(
                np.moveaxis(ke, 0, 1), P, w_g)
        return out

    def write(self, q, aux, t):
        vals = self.collect(q, aux, t)
        if self.writer is None:
            return vals
        if not self._initialized:
            nk = vals["spectrum_1d"].shape[0]
            dims = {"k": np.arange(1, nk + 1, dtype=np.float64),
                    "level": self.rads}
            varspec = {"spectrum_1d": (("k", "level"), np.float64)}
            if "spectrum_2d" in vals:
                m, n = vals["spectrum_2d"].shape[:2]
                dims["m"] = np.arange(m, dtype=np.float64)
                dims["n"] = np.arange(n, dtype=np.float64)
                varspec["spectrum_2d"] = (("m", "n", "level"), np.float64)
            self.writer.init_data(self.out_path, dims, varspec)
            self._initialized = True
        self.writer.append_data(
            self.out_path,
            {k: v for k, v in vals.items() if k.startswith("spectrum")}, t)
        return vals

    def make_callback(self, every_steps: int):
        from climatemachine_tpu.driver.callbacks import EveryXSimulationSteps

        def fn(state):
            self.write(state.q, state.aux, state.t)

        return EveryXSimulationSteps(fn, every_steps)


class DumpGroup(_ScalarGroup):
    """Raw flattened-variable dump, optionally interpolated (reference
    dump_state.jl / dump_aux.jl / dump_tendencies.jl).

    which: 'state' (prognostic), 'aux', or 'tendencies' (the full DG RHS
    per prognostic variable)."""

    def __init__(self, dg, which: str = "state", interpolator=None,
                 writer=None, out_path=None):
        self.which = which
        self.interpolator = interpolator
        self.name = "Dump" + which.capitalize()
        super().__init__(dg, writer, out_path)

    def _names_spec(self):
        bl = self.model
        if self.which == "aux":
            return bl.aux_spec
        return bl.prog_spec

    def _collect_impl(self, q, aux, t):
        bl = self.model
        spec = self._names_spec()
        if self.which == "state":
            arr = q
        elif self.which == "aux":
            arr = aux
        else:
            arr, _ = self.dg(q, aux, t)
        names = spec.flattened_names()
        out = {}
        for i, nm in enumerate(names):
            key = nm.replace(".", "_").replace("[", "_").rstrip("]")
            if self.which == "tendencies":
                key = "tend_" + key
            f = arr[..., i]
            out[key] = (self.interpolator(f) if self.interpolator is not None
                        else f)
        return out

    def _dims(self):
        if self.interpolator is None:
            return {"elem": np.arange(self.grid.nelem, dtype=np.float64),
                    "node": np.arange(self.grid.Np, dtype=np.float64)}
        itp = self.interpolator
        if hasattr(itp, "latlon"):
            lats, lons, rads = itp.latlon
            return {"lat": np.asarray(lats), "long": np.asarray(lons),
                    "level": np.asarray(rads)}
        return {d: np.asarray(v)
                for d, v in zip(("x", "y", "z"), itp.xyz)}

    def _var_dims(self, name):
        if self.interpolator is None:
            return ("elem", "node")
        return tuple(self._dims().keys())
