"""AtmosLESDefault / AtmosLESCore diagnostics groups.

Scope of reference ``src/Diagnostics/atmos_les_default.jl`` (simple +
higher-order horizontal averages, cloud diagnostics, docs :20-67) and
``src/Diagnostics/atmos_les_core.jl`` (cloud-core conditional averages,
docs :18-45).  One jitted collect computes every nodal field once and
reduces per vertical level with the quadrature measure.

Averaging convention: the reference accumulates ``MH * rho * x`` per level
and divides by ``Sum MH`` only (atmos_les_default.jl:146-191, :688-689),
so its "u" is <rho*u> etc.; here profiles are the self-consistent Favre
(density-weighted) averages x~ = <M rho x>/<M rho>, fluctuations are taken
about x~, and second moments are <M rho x'y'>/<M rho>.  ``avg_rho`` is the
plain area average <M rho>/<M> and ``rho`` the density-weighted one, as in
the reference.  SGS fluxes follow the reference exactly:
``w_ht_sgs = -(D_t grad h_tot)_z``, ``w_qt_sgs = -(D_t grad q_tot)_z``
(atmos_les_default.jl:168-170,:218-219), Favre-averaged.

Cloud diagnostics (reference :668-745,:776-792):
- ``cld_frac(z)``: area fraction of nodes with condensate per level;
- ``cld_cover``: area fraction of vertical node-columns containing any
  condensate;
- ``cld_top`` / ``cld_base``: max/min altitude with condensate (NaN when
  the domain is cloud-free);
- ``lwp``/``iwp``/``rwp``/``swp``: vertical integral of <rho q_x>(z) using
  the per-level vertical measure (Sum_level M) / A_horz.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.physics import thermodynamics as th


# --- per-level reduction helpers ---------------------------------------------

def _lev_reshape(grid, f):
    """[E, Np] -> [nh, nv, Nq3, Nq1*Nq2] (level = (nv, Nq3))."""
    Nq1, Nq2, Nq3 = grid.Nq
    return f.reshape(grid.n_horz, grid.n_vert, Nq3, Nq2 * Nq1)


def _lev_sum(grid, f):
    """Sum over the horizontal per vertical level: [E, Np] -> [nlev]."""
    fs = _lev_reshape(grid, f)
    nlev = grid.n_vert * grid.Nq[2]
    return jnp.sum(fs, axis=(0, 3)).reshape(nlev)


def _column_any(grid, mask):
    """any() over each vertical node-column: [E, Np] -> [nh, Nq1*Nq2]."""
    ms = _lev_reshape(grid, mask)
    return jnp.any(ms, axis=(1, 2))


class _ProfileGroup:
    """Shared machinery: jitted collect -> {name: profile [nlev] or
    scalar}; NetCDF writing with a ``z`` dimension; step-interval
    callback (reference DiagnosticsGroup, groups.jl:20)."""

    name = "AtmosLES"

    def __init__(self, dg, writer=None, out_path: Optional[str] = None):
        grid = dg.grid
        if grid.n_vert is None or grid.n_horz is None:
            raise ValueError(f"{self.name} diagnostics need a stacked grid")
        self.dg = dg
        self.model = dg.balance_law
        self.grid = grid
        self.writer = writer
        self.out_path = out_path
        self._collect = jax.jit(self._collect_impl)
        self._initialized = False
        # z per level (area average of nodal z; exact for flat stacks)
        z = np.asarray(grid.coords[..., grid.dim - 1], dtype=np.float64)
        M = np.asarray(grid.M, dtype=np.float64)
        Mz = np.sum(_lev_reshape(grid, jnp.asarray(M)), axis=(0, 3))
        zz = np.sum(np.asarray(_lev_reshape(grid, jnp.asarray(M * z))),
                    axis=(0, 3))
        self.z_levels = (zz / np.asarray(Mz)).reshape(-1)

    # -- nodal fields shared by default and core groups -----------------------
    def _nodal(self, q, aux, t):
        bl, g = self.model, self.grid
        ps = bl.param_set
        rho = bl.prog(q, "rho")
        rhou = bl.prog(q, "rhou")
        u = rhou / rho[..., None]
        T, p, _, pp = bl.thermo_full(q, aux)
        e_int = th.internal_energy(ps, T, pp)
        Phi = bl.aux_get(aux, "orientation.Phi")
        e_kin = 0.5 * jnp.sum(u * u, axis=-1)
        if bl.physics.energy.is_theta:
            e_tot = e_int + e_kin + Phi
        else:
            e_tot = bl.prog(q, "rhoe") / rho
        R_m = th.gas_constant_air(ps, pp)
        out = {
            "rho": rho, "u": u[..., 0], "v": u[..., 1], "w": u[..., 2],
            "temp": T, "pres": p,
            "thd": th.dry_pottemp(ps, T, p, pp),
            "et": e_tot, "ei": e_int,
            "ht": e_tot + R_m * T, "hi": e_int + R_m * T,
            "z": jnp.asarray(g.coords[..., g.dim - 1], dtype=rho.dtype),
        }
        if pp is not None:
            out.update({
                "qt": pp.tot, "ql": pp.liq, "qi": pp.ice, "qv": pp.vap,
                "thv": th.virtual_pottemp(ps, T, p, pp),
                "thl": th.liquid_ice_pottemp(ps, T, p, pp),
            })
        s = bl.prog_spec
        for nm, key in (("qr", "precipitation.rhoq_rai"),
                        ("qs", "precipitation.rhoq_sno")):
            try:
                out[nm] = s.get(q, key) / rho
            except KeyError:
                pass
        # SGS vertical fluxes (reference :168-170, :218-219)
        turb = bl.physics.turbulence
        if turb is not None:
            grad = self.dg.spatial_gradient(q, aux, t)
            gf = bl.compute_gradient_flux(grad, q, aux, t)
            _, D_t = turb.viscosity(bl, q, gf, aux, t)
            d_h = -D_t * bl.gf_spec.get(gf, "d_h_tot")
            out["w_ht_sgs"] = d_h[..., 2]
            if pp is not None:
                try:
                    d_q = -D_t * bl.gf_spec.get(gf, "moisture.d_q_tot")
                    out["w_qt_sgs"] = d_q[..., 2]
                except KeyError:
                    pass
        return out

    # -- writer integration ----------------------------------------------------
    def collect(self, q, aux, t=0.0):
        return {k: np.asarray(v) for k, v in self._collect(q, aux, t).items()}

    def write(self, q, aux, t):
        vals = self.collect(q, aux, t)
        if self.writer is None:
            return vals
        if not self._initialized:
            dims = {"z": self.z_levels}
            vars_ = {k: (("z",) if np.ndim(v) else (), np.float64)
                     for k, v in vals.items()}
            self.writer.init_data(self.out_path, dims, vars_)
            self._initialized = True
        self.writer.append_data(self.out_path, vals, t)
        return vals

    def make_callback(self, every_steps: int):
        from climatemachine_tpu.driver.callbacks import EveryXSimulationSteps

        def fn(state):
            self.write(state.q, state.aux, state.t)

        return EveryXSimulationSteps(fn, every_steps)


class AtmosLESDefaultGroup(_ProfileGroup):
    """Reference "AtmosLESDefault" group (atmos_les_default.jl).

    Profiles (z): u v w avg_rho rho temp pres thd et ei ht hi w_ht_sgs,
    var_u var_v var_w w3 tke var_ei cov_w_u cov_w_v cov_w_rho cov_w_thd
    cov_w_ei; with moisture also qt ql qi qv thv thl w_qt_sgs var_qt
    var_thl cov_w_qt cov_w_ql cov_w_qi cov_w_qv cov_w_thv cov_w_thl
    cov_qt_thl cov_qt_ei, and qr/qs with precipitation; plus cld_frac.
    Scalars: cld_cover, cld_top, cld_base, lwp, iwp (rwp, swp with
    precipitation)."""

    name = "AtmosLESDefault"

    def _collect_impl(self, q, aux, t):
        g = self.grid
        nd = self._nodal(q, aux, t)
        rho = nd["rho"]
        M = jnp.asarray(g.M, dtype=rho.dtype)
        MH_z = _lev_sum(g, M)
        Mrho_z = _lev_sum(g, M * rho)

        def area_avg(x):
            return _lev_sum(g, M * x) / MH_z

        def favre(x):
            return _lev_sum(g, M * rho * x) / Mrho_z

        out = {"avg_rho": area_avg(rho), "rho": favre(rho)}
        simple = ["u", "v", "w", "temp", "pres", "thd", "et", "ei", "ht",
                  "hi", "w_ht_sgs", "qt", "ql", "qi", "qv", "thv", "thl",
                  "w_qt_sgs", "qr", "qs"]
        means = {}
        for k in simple:
            if k in nd:
                means[k] = favre(nd[k])
                out[k] = means[k]

        # nodal fluctuations about the Favre means, broadcast per level
        def per_node(prof):
            # [nlev] -> [E, Np] matching _lev_reshape layout
            Nq1, Nq2, Nq3 = g.Nq
            p4 = prof.reshape(g.n_vert, Nq3)[None, :, :, None]
            return jnp.broadcast_to(
                p4, (g.n_horz, g.n_vert, Nq3, Nq2 * Nq1)).reshape(rho.shape)

        fl = {k: nd[k] - per_node(means[k])
              for k in ("u", "v", "w", "ei", "thd") if k in means}
        rp = rho - per_node(out["avg_rho"])
        out["var_u"] = favre(fl["u"] ** 2)
        out["var_v"] = favre(fl["v"] ** 2)
        out["var_w"] = favre(fl["w"] ** 2)
        out["w3"] = favre(fl["w"] ** 3)
        out["tke"] = 0.5 * (out["var_u"] + out["var_v"] + out["var_w"])
        out["var_ei"] = favre(fl["ei"] ** 2)
        out["cov_w_u"] = favre(fl["w"] * fl["u"])
        out["cov_w_v"] = favre(fl["w"] * fl["v"])
        out["cov_w_rho"] = favre(fl["w"] * rp)
        out["cov_w_thd"] = favre(fl["w"] * fl["thd"])
        out["cov_w_ei"] = favre(fl["w"] * fl["ei"])

        if "qt" in nd:
            flm = {k: nd[k] - per_node(means[k])
                   for k in ("qt", "ql", "qi", "qv", "thv", "thl")}
            out["var_qt"] = favre(flm["qt"] ** 2)
            out["var_thl"] = favre(flm["thl"] ** 2)
            for k in ("qt", "ql", "qi", "qv", "thv", "thl"):
                out["cov_w_" + k] = favre(fl["w"] * flm[k])
            out["cov_qt_thl"] = favre(flm["qt"] * flm["thl"])
            out["cov_qt_ei"] = favre(flm["qt"] * fl["ei"])

            # cloud diagnostics (reference :668-745, :776-792)
            has_cond = (nd["ql"] + nd["qi"]) > 0.0
            z = nd["z"]
            out["cld_frac"] = area_avg(has_cond.astype(rho.dtype))
            colM = jnp.sum(_lev_reshape(g, M), axis=(1, 2))  # [nh, nq12]
            col_cld = _column_any(g, has_cond).astype(rho.dtype)
            out["cld_cover"] = (jnp.sum(colM * col_cld) / jnp.sum(colM))
            big = jnp.asarray(jnp.inf, dtype=rho.dtype)
            any_cld = jnp.any(has_cond)
            top = jnp.max(jnp.where(has_cond, z, -big))
            base = jnp.min(jnp.where(has_cond, z, big))
            nan = jnp.asarray(jnp.nan, dtype=rho.dtype)
            out["cld_top"] = jnp.where(any_cld, top, nan)
            out["cld_base"] = jnp.where(any_cld, base, nan)

            # water paths: integral of <rho q>(z) dz; per-level vertical
            # measure Mvert = Sum_level(M)/A, A = Sum(M)/H
            H = jnp.max(z) - jnp.min(z)
            A = jnp.sum(M) / H
            Mvert = _lev_sum(g, M) / A
            for nm, qk in (("lwp", "ql"), ("iwp", "qi"),
                           ("rwp", "qr"), ("swp", "qs")):
                if qk in nd:
                    out[nm] = jnp.sum(area_avg(rho * nd[qk]) * Mvert)
        return out


class AtmosLESDefaultPerturbationsGroup(_ProfileGroup):
    """Reference "AtmosLESDefaultPerturbations"
    (atmos_les_default_perturbations.jl): pointwise deviations of
    u v w avg_rho temp pres thd et ei ht hi (+ qt ql qv thv thl with
    moisture) from their horizontal (Favre) averages, written on an
    interpolated x-y-z grid."""

    name = "AtmosLESDefaultPerturbations"

    def __init__(self, dg, interpolator, writer=None, out_path=None):
        self.interpolator = interpolator
        super().__init__(dg, writer, out_path)

    def _collect_impl(self, q, aux, t):
        g = self.grid
        nd = self._nodal(q, aux, t)
        rho = nd["rho"]
        M = jnp.asarray(g.M, dtype=rho.dtype)
        Mrho_z = _lev_sum(g, M * rho)

        def favre(x):
            return _lev_sum(g, M * rho * x) / Mrho_z

        def per_node(prof):
            Nq1, Nq2, Nq3 = g.Nq
            p4 = prof.reshape(g.n_vert, Nq3)[None, :, :, None]
            return jnp.broadcast_to(
                p4, (g.n_horz, g.n_vert, Nq3, Nq2 * Nq1)).reshape(rho.shape)

        keys = ["u", "v", "w", "temp", "pres", "thd", "et", "ei", "ht",
                "hi", "qt", "ql", "qv", "thv", "thl"]
        out = {"avg_rho_prime":
               self.interpolator(rho - per_node(_lev_sum(g, M * rho)
                                                / _lev_sum(g, M)))}
        for k in keys:
            if k in nd:
                out[k + "_prime"] = self.interpolator(
                    nd[k] - per_node(favre(nd[k])))
        return out

    def write(self, q, aux, t):
        vals = self.collect(q, aux, t)
        if self.writer is None:
            return vals
        if not self._initialized:
            itp = self.interpolator
            dims = {d: np.asarray(v)
                    for d, v in zip(("x", "y", "z"), itp.xyz)}
            self.writer.init_data(self.out_path, dims,
                                  {k: (tuple(dims.keys()), np.float64)
                                   for k in vals})
            self._initialized = True
        self.writer.append_data(self.out_path, vals, t)
        return vals


class AtmosLESCoreGroup(_ProfileGroup):
    """Reference "AtmosLESCore" group (atmos_les_core.jl): conditional
    (cloud-core: q_liq > 0 and w > 0) horizontal averages.

    Profiles: core_frac, u_core v_core w_core avg_rho_core rho_core
    qt_core ql_core thv_core thl_core ei_core, var_{u,v,w,qt,thl,ei}_core,
    cov_w_{rho,qt,thl,ei}_core, cov_qt_{thl,ei}_core.  Conditional means
    are <M rho x ind>/<M rho ind>; levels with no core nodes report 0."""

    name = "AtmosLESCore"

    def _collect_impl(self, q, aux, t):
        g = self.grid
        nd = self._nodal(q, aux, t)
        if "ql" not in nd:
            raise ValueError("AtmosLESCore requires a moisture model")
        rho = nd["rho"]
        M = jnp.asarray(g.M, dtype=rho.dtype)
        ind = ((nd["ql"] > 0.0) & (nd["w"] > 0.0)).astype(rho.dtype)
        MH_z = _lev_sum(g, M)
        Mi_z = _lev_sum(g, M * ind)
        Mrhoi_z = _lev_sum(g, M * rho * ind)
        eps = jnp.asarray(1e-300 if rho.dtype == jnp.float64 else 1e-30,
                          dtype=rho.dtype)

        def carea(x):
            return _lev_sum(g, M * ind * x) / jnp.maximum(Mi_z, eps)

        def cfavre(x):
            return _lev_sum(g, M * rho * ind * x) / jnp.maximum(Mrhoi_z,
                                                                eps)

        out = {"core_frac": Mi_z / MH_z,
               "avg_rho_core": carea(rho), "rho_core": cfavre(rho)}
        means = {}
        for k in ("u", "v", "w", "qt", "ql", "thv", "thl", "ei"):
            means[k] = cfavre(nd[k])
            out[k + "_core"] = means[k]

        def per_node(prof):
            Nq1, Nq2, Nq3 = g.Nq
            p4 = prof.reshape(g.n_vert, Nq3)[None, :, :, None]
            return jnp.broadcast_to(
                p4, (g.n_horz, g.n_vert, Nq3, Nq2 * Nq1)).reshape(rho.shape)

        fl = {k: nd[k] - per_node(means[k]) for k in means}
        rp = rho - per_node(out["avg_rho_core"])
        for k in ("u", "v", "w", "qt", "thl", "ei"):
            out[f"var_{k}_core"] = cfavre(fl[k] ** 2)
        out["cov_w_rho_core"] = cfavre(fl["w"] * rp)
        for k in ("qt", "thl", "ei"):
            out[f"cov_w_{k}_core"] = cfavre(fl["w"] * fl[k])
        out["cov_qt_thl_core"] = cfavre(fl["qt"] * fl["thl"])
        out["cov_qt_ei_core"] = cfavre(fl["qt"] * fl["ei"])
        return out
