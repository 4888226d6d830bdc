"""Equation-table introspection (reference
src/BalanceLaws/show_tendencies.jl show_tendencies: prints, per
prognostic variable, the first-order fluxes, second-order fluxes, and
sources of ∂_t Y + ∇·F₁(Y) + ∇·F₂(Y, G) = S(Y, G)).

The reference reads its declarative ``eq_tends`` lists; here the
composition is config-driven, so the F₁/F₂ columns are derived from the
same physics switches the flux methods use, and the Source column is
discovered by ``jax.eval_shape`` of each source's ``contributions`` (no
computation, just which variables it touches)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _source_vars(model, src):
    """Which prognostic variables a Source contributes to."""
    n = model.prog_spec.num
    na = model.aux_spec.num
    q = jax.ShapeDtypeStruct((2, 3, n), jnp.float64)
    aux = jax.ShapeDtypeStruct((2, 3, na), jnp.float64)
    ng = model.num_gradient_flux if hasattr(model, "num_gradient_flux") \
        else model.gf_spec.num if hasattr(model, "gf_spec") else 0
    gf = (jax.ShapeDtypeStruct((2, 3, 3, ng), jnp.float64)
          if ng else None)
    try:
        out = jax.eval_shape(
            lambda qq, aa, gg: src.contributions(model, qq, gg, aa, 0.0),
            q, aux, gf)
    except Exception:
        return ("?",)
    return tuple(out.keys())


def show_tendencies(model) -> str:
    """Formatted equation table for an AtmosModel-style balance law."""
    ph = model.physics
    names = list(model.prog_spec.names())
    F1 = {k: [] for k in names}
    F2 = {k: [] for k in names}
    S = {k: [] for k in names}

    anel = ph.compressibility.is_anelastic
    if not anel:
        F1["rho"].append("Advect")
    F1["rhou"] += ["Advect", "PressureGradient"]
    F1["rhoe"].append("Advect")
    if not ph.energy.is_theta:
        F1["rhoe"].append("Pressure")
    if ph.radiation is not None and hasattr(ph.radiation, "energy_flux"):
        F1["rhoe"].append("Radiation")
    for grp in ("moisture", "tracers", "precipitation", "sgstke",
                "turbconv"):
        if grp in names:
            F1[grp].append("Advect")
    if ph.precipitation is not None and "precipitation" in names:
        F1["precipitation"].append("Sedimentation")

    if ph.turbulence is not None:
        F2["rhou"].append("ViscousStress")
        F2["rhoe"].append("DiffEnthalpyFlux")
        if "moisture" in names:
            F2["moisture"].append("MoistureDiffusion")
        if "tracers" in names:
            F2["tracers"].append("TracerDiffusion")
        if ph.sgstke is not None:
            F2["sgstke"].append("SGSTKEDiffusion")
    if ph.hyperdiffusion is not None:
        F2["rhou"].append("Hyperdiffusion")
        F2["rhoe"].append("Hyperdiffusion")
        gl_names = ph.hyperdiffusion.vars_gradient_laplacian().names()
        if "moisture" in names and "q_tot" in gl_names:
            F2["moisture"].append("Hyperdiffusion")

    for src in model.sources:
        label = type(src).__name__
        for var in _source_vars(model, src):
            top = var.split(".")[0]
            if top in S:
                S[top].append(label)

    rows = [("Equation (Y_i)", "Flux{FirstOrder} (F_1)",
             "Flux{SecondOrder} (F_2)", "Source (S)")]
    for k in names:
        rows.append((k, ", ".join(F1[k]) or "—",
                     ", ".join(F2[k]) or "—",
                     ", ".join(dict.fromkeys(S[k])) or "—"))
    widths = [max(len(r[i]) for r in rows) for i in range(4)]
    lines = ["PDE: ∂_t Y_i + (∇•F_1(Y))_i + (∇•F_2(Y,G))_i = (S(Y,G))_i"]
    for j, r in enumerate(rows):
        lines.append("  ".join(c.ljust(w) for c, w in zip(r, widths)))
        if j == 0:
            lines.append("-" * (sum(widths) + 6))
    return "\n".join(lines)
