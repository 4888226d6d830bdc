"""Derived diagnostic fields needing DG derivatives.

Scope of reference ``src/Diagnostics/diagnostic_fields.jl`` (396 LoC:
``VectorGradients`` via a mini balance law + ``Vorticity``) — here the
existing central-flux LDG helpers on DGModel provide the same
face-corrected gradients directly, no auxiliary balance law required.
"""

from __future__ import annotations

import jax.numpy as jnp

from climatemachine_tpu.diagnostics.machine import (DiagnosticsGroup,
                                                    PointwiseDiagnostic)


def vector_gradients(dg, u):
    """Face-corrected DG gradient of a vector field: u [E, Np, 3] →
    G [E, Np, 3, 3] with G[..., j, k] = ∂u_k/∂x_j (reference
    VectorGradients, diagnostic_fields.jl)."""
    return dg.dg_gradient_of(u, direction="every")


def vorticity(dg, u):
    """Relative vorticity ∇×u [E, Np, 3] (reference Vorticity,
    diagnostic_fields.jl / vorticity_balancelaw.jl)."""
    G = vector_gradients(dg, u)
    wx = G[..., 1, 2] - G[..., 2, 1]
    wy = G[..., 2, 0] - G[..., 0, 2]
    wz = G[..., 0, 1] - G[..., 1, 0]
    return jnp.stack([wx, wy, wz], axis=-1)


def atmos_gcm_default_vars(model, dg):
    """Full "AtmosGCMDefault" variable set (reference
    atmos_gcm_default.jl:105-135 vars_atmos_gcm_default_simple_3d):
    u/v/w, rho, temp, pres, thd, et, ei, ht, hi, vort, vort2, and — with
    a moisture model — qt, ql, qv, qi, thv, thl.  Velocities are emitted
    Cartesian on the DG grid; the NetCDF writer projects them to
    (zonal, meridional, radial) at interpolation time
    (mesh/interpolation.py project_cubed_sphere)."""
    from climatemachine_tpu.physics import thermodynamics as td

    def rho_(m, q, aux, g):
        return m.prog(q, "rho")

    def u_(i):
        def f(m, q, aux, g):
            return m.prog(q, "rhou")[..., i] / m.prog(q, "rho")
        return f

    def thermo_scalar(fn):
        def f(m, q, aux, g):
            T, p, u, pp = m.thermo_full(q, aux)
            return fn(m, q, aux, T, p, u, pp)
        return f

    ps = model.param_set

    def e_tot(m, q, aux):
        return m.prog(q, "rhoe") / m.prog(q, "rho")

    def e_int(m, q, aux, T, pp):
        return td.internal_energy(ps, T, pp)

    out = [
        PointwiseDiagnostic("u", u_(0), "m/s"),
        PointwiseDiagnostic("v", u_(1), "m/s"),
        PointwiseDiagnostic("w", u_(2), "m/s"),
        PointwiseDiagnostic("rho", rho_, "kg/m^3"),
        PointwiseDiagnostic("temp", thermo_scalar(
            lambda m, q, aux, T, p, u, pp: T), "K"),
        PointwiseDiagnostic("pres", thermo_scalar(
            lambda m, q, aux, T, p, u, pp: p), "Pa"),
        PointwiseDiagnostic("thd", thermo_scalar(
            lambda m, q, aux, T, p, u, pp: td.dry_pottemp(ps, T, p, pp)),
            "K"),
        PointwiseDiagnostic("et", thermo_scalar(
            lambda m, q, aux, T, p, u, pp: e_tot(m, q, aux)), "J/kg"),
        PointwiseDiagnostic("ei", thermo_scalar(
            lambda m, q, aux, T, p, u, pp: e_int(m, q, aux, T, pp)),
            "J/kg"),
        PointwiseDiagnostic("ht", thermo_scalar(
            lambda m, q, aux, T, p, u, pp: td.total_specific_enthalpy(
                ps, e_tot(m, q, aux), T, pp)), "J/kg"),
        PointwiseDiagnostic("hi", thermo_scalar(
            lambda m, q, aux, T, p, u, pp: td.total_specific_enthalpy(
                ps, e_int(m, q, aux, T, pp), T, pp)), "J/kg"),
    ]

    # two independent vorticity estimates, as the reference emits
    # vort (kernel gradient) and vort2 (mini balance law): here the
    # face-corrected LDG gradient vs the element-local strong-form
    # gradient — agreement is a consistency check on the DG derivative
    def vort(m, q, aux, g):
        rho = m.prog(q, "rho")
        u = m.prog(q, "rhou") / rho[..., None]
        w = vorticity(dg, u)
        khat = m._vertical_unit(aux)
        return jnp.sum(w * khat, axis=-1)

    def vort2(m, q, aux, g):
        from climatemachine_tpu.dg.spatial import strong_gradient
        rho = m.prog(q, "rho")
        u = m.prog(q, "rhou") / rho[..., None]
        G = strong_gradient(dg.grid, u, (0, 1, 2))  # [E,Np,3(coord),3(comp)]
        w = jnp.stack([G[..., 1, 2] - G[..., 2, 1],
                       G[..., 2, 0] - G[..., 0, 2],
                       G[..., 0, 1] - G[..., 1, 0]], axis=-1)
        khat = m._vertical_unit(aux)
        return jnp.sum(w * khat, axis=-1)

    out += [PointwiseDiagnostic("vort", vort, "1/s"),
            PointwiseDiagnostic("vort2", vort2, "1/s")]

    if model.physics.moisture.vars_prognostic().num:
        def moist_scalar(fn):
            def f(m, q, aux, g):
                T, p, u, pp = m.thermo_full(q, aux)
                return fn(T, p, pp)
            return f

        out += [
            PointwiseDiagnostic("qt", moist_scalar(
                lambda T, p, pp: pp.tot), "kg/kg"),
            PointwiseDiagnostic("ql", moist_scalar(
                lambda T, p, pp: pp.liq), "kg/kg"),
            PointwiseDiagnostic("qv", moist_scalar(
                lambda T, p, pp: pp.tot - pp.liq - pp.ice), "kg/kg"),
            PointwiseDiagnostic("qi", moist_scalar(
                lambda T, p, pp: pp.ice), "kg/kg"),
            PointwiseDiagnostic("thv", moist_scalar(
                lambda T, p, pp: td.virtual_pottemp(ps, T, p, pp)), "K"),
            PointwiseDiagnostic("thl", moist_scalar(
                lambda T, p, pp: td.liquid_ice_pottemp(ps, T, p, pp)), "K"),
        ]
    return out


class AtmosGCMDefaultGroup(DiagnosticsGroup):
    """The "AtmosGCMDefault" group on the interpolated lat-lon-level grid
    (reference atmos_gcm_default.jl setup_atmos_default_diagnostics):
    full variable set, with velocities projected to (zonal, meridional,
    radial) after interpolation (reference project_cubed_sphere!)."""

    def __init__(self, dg, interpolator, writer=None, out_path=None):
        super().__init__("AtmosGCMDefault", dg.balance_law, dg.grid,
                         atmos_gcm_default_vars(dg.balance_law, dg),
                         writer=writer, out_path=out_path,
                         interpolator=interpolator)

    def collect(self, q, aux):
        import numpy as np

        from climatemachine_tpu.mesh.interpolation import \
            project_cubed_sphere

        vals = super().collect(q, aux)
        itp = self.interpolator
        if itp is not None and hasattr(itp, "latlon"):
            lats, lons, _ = itp.latlon
            vec = np.stack([vals["u"], vals["v"], vals["w"]], axis=-1)
            sph = project_cubed_sphere(
                (np.asarray(lats), np.asarray(lons)), vec)
            vals["u"], vals["v"], vals["w"] = (sph[..., 0], sph[..., 1],
                                               sph[..., 2])
        return vals
