"""Moist baroclinic wave on the cubed sphere — DCMIP2016 test case
(reference experiments/AtmosGCM/moist_baroclinic_wave_bulksfcflux.jl and
experiments/TestCase/baroclinic_wave.jl).

Ullrich et al. balanced base state with a low-level zonal perturbation
and low-latitude moisture; the wave breaks over ~10 simulated days.
Short smoke run::

    python examples/baroclinic_wave.py --timeend 300 --platform cpu
"""

import argparse
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu import driver_api as cm
from climatemachine_tpu.experiments.baroclinic_wave import \
    baroclinic_wave_config
from climatemachine_tpu.dg.spatial import init_ode_state
from climatemachine_tpu.dg.reductions import weightedsum
from climatemachine_tpu.mesh.grid import min_node_distance
from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-horz", type=int, default=8)
    p.add_argument("--n-vert", type=int, default=4)
    p.add_argument("--poly", type=int, default=4)
    p.add_argument("--timeend", type=float, default=3600.0)
    p.add_argument("--dry", action="store_true")
    p.add_argument("--cfl", type=float, default=0.3)
    p.add_argument("--bulk-sfcflux", action="store_true",
                   help="TJ16 varying-SST bulk surface fluxes (reference "
                   "moist_baroclinic_wave_bulksfcflux.jl)")
    p.add_argument("--diagnostics-every", type=int, default=0,
                   help="write the AtmosGCMDefault NetCDF group (full "
                   "reference variable set on lat-lon-level) every N steps")
    p.add_argument("--diagnostics-out", default="bcwave_gcm_default.nc")
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.platform == "cpu":
        jax.config.update("jax_enable_x64", True)

    cfg = baroclinic_wave_config(n_horz=args.n_horz, n_vert=args.n_vert,
                                 poly_order=args.poly,
                                 moist=not args.dry,
                                 dtype=np.float64 if args.platform == "cpu"
                                 else np.float32)
    if args.bulk_sfcflux:
        # Thatcher & Jablonowski (2016) varying-SST bulk surface fluxes
        # (reference moist_baroclinic_wave_bulksfcflux.jl:174-266:
        # Varying_SST_TJ16 + BulkFormulaEnergy/Moisture, C_drag 0.0044)
        assert not args.dry, "--bulk-sfcflux needs the moist wave"
        ps = cfg.model.param_set
        C_drag = 0.0044

        def T_sfc(m, q, aux, t):
            from climatemachine_tpu.common.orientations import latitude
            phi = latitude(m.aux_get(aux, "coord"))
            dphi = 26.0 * np.pi / 180.0
            return 29.0 * jnp.exp(-phi ** 2 / (2 * dphi ** 2)) + 271.0

        def q_sfc(m, q, aux, t):
            from climatemachine_tpu.physics import thermodynamics as td
            rho = m.prog(q, "rho")
            ru = m.prog(q, "rhou")
            Phi = m.aux_get(aux, "orientation.Phi")
            e_int = (m.prog(q, "rhoe")
                     - 0.5 * jnp.sum(ru * ru, axis=-1) / rho) / rho - Phi
            qt = m.prog(q, "moisture.rhoq_tot") / rho
            T = td.air_temperature(ps, e_int)
            p = td.air_pressure(ps, T, rho)
            Ts = T_sfc(m, q, aux, t)
            return (0.622 / p * ps.press_triple
                    * jnp.exp(-ps.LH_v0 / ps.R_v
                              * (1.0 / Ts - 1.0 / ps.T_triple)))

        bc_sfc = cm.AtmosBC(
            energy=cm.BulkFormulaEnergy(C_h=C_drag, T_sfc=T_sfc),
            moisture=cm.BulkFormulaMoisture(C_q=C_drag, q_tot_sfc=q_sfc))
        from climatemachine_tpu.atmos.model import AtmosProblem
        problem = AtmosProblem(init_state=cfg.model.problem.init_state,
                               boundary_conditions=(bc_sfc, cm.AtmosBC()))
        cfg.model = cm.AtmosModel(cfg.model.physics, problem,
                                  sources=cfg.model.sources)
    dg = cm.DGModel(cfg.model, cfg.grid)
    q, aux = init_ode_state(dg)
    dt = args.cfl * float(min_node_distance(cfg.grid)) / 350.0
    nsteps = max(int(args.timeend / dt), 1)
    print(f"dt = {dt:.2f} s, elements = {cfg.grid.nelem}, "
          f"steps = {nsteps}")

    step = jax.jit(LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t),
                                          dt).step)

    group = None
    if args.diagnostics_every:
        from climatemachine_tpu.diagnostics.fields import \
            AtmosGCMDefaultGroup
        from climatemachine_tpu.io.writers import NetCDFWriter
        from climatemachine_tpu.mesh.interpolation import \
            InterpolationCubedSphere

        a = cfg.model.param_set.planet_radius
        H = 30e3
        nlev = args.n_vert * (args.poly + 1)
        lats = np.linspace(-89.0, 89.0, 46)
        lons = np.linspace(-180.0, 178.0, 90)
        rads = a + np.linspace(0.0, H, nlev + 1)[:-1] + H / (2 * nlev)
        itp = InterpolationCubedSphere(cfg.grid, lats, lons, rads)
        group = AtmosGCMDefaultGroup(dg, itp, writer=NetCDFWriter(),
                                     out_path=args.diagnostics_out)

    m0 = float(weightedsum(cfg.grid, q, 0))
    t = 0.0
    for i in range(nsteps):
        if group is not None and i % args.diagnostics_every == 0:
            group.write(q, aux, t)
        q, aux = step(q, aux, t)
        t += dt
    if group is not None:
        group.write(q, aux, t)
        print(f"AtmosGCMDefault NetCDF written to {args.diagnostics_out} "
              f"({len(group.variables)} variables)")
    q.block_until_ready()
    m1 = float(weightedsum(cfg.grid, q, 0))
    u = q[..., 1:4] / q[..., :1]
    print(f"finite: {bool(jnp.all(jnp.isfinite(q)))}   "
          f"mass rel drift: {abs(m1 - m0) / abs(m0):.2e}   "
          f"max |u|: {float(jnp.max(jnp.abs(u))):.1f} m/s")


if __name__ == "__main__":
    main()
