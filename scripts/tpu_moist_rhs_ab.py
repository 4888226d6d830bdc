"""Moist (EquilMoist + EquilMoistBiharmonic) vs dry var-major RHS cost
at bench scale (VERDICT r3 #3: moist per-point RHS within ~1.3x of
dry)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from _bench_util import titer

def build(moist):
    from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
    from climatemachine_tpu.experiments.held_suarez import held_suarez_config
    cfg = held_suarez_config(n_horz=16, n_vert=8, poly_order=4,
                             dtype=np.float32)
    model = cfg.model
    if moist:
        from climatemachine_tpu.atmos import AtmosPhysics
        from climatemachine_tpu.atmos.hyperdiffusion import \
            EquilMoistBiharmonic
        from climatemachine_tpu.atmos.model import AtmosModel, AtmosProblem
        from climatemachine_tpu.atmos.moisture import EquilMoist
        ph = model.physics
        physics = AtmosPhysics(**{**ph.__dict__,
                                  "moisture": EquilMoist(),
                                  "hyperdiffusion": EquilMoistBiharmonic(
                                      ph.hyperdiffusion.tau_timescale)})
        base_init = model.problem.init_state
        def init_moist(m, coords, aux, t):
            q5 = base_init(m, coords, aux, t)
            rho = m.prog_spec.get(q5, "rho")
            z = m.aux_get(aux, "orientation.Phi") / m.param_set.grav
            return m.prog_spec.set(q5, "moisture.rhoq_tot",
                                   rho * 0.005 * jnp.exp(-z / 2e3))
        model = AtmosModel(physics,
                           AtmosProblem(init_state=init_moist,
                                        boundary_conditions=model.problem
                                        .boundary_conditions),
                           sources=model.sources)
    dg = DGModel(model, cfg.grid)
    q, aux = init_ode_state(dg)
    return dg, q, aux

def main():
    from climatemachine_tpu.dg.fast_rhs import VarMajorRHS
    eps = 1e-12
    res = {}
    for moist in (False, True):
        dg, q, aux = build(moist)
        vm = VarMajorRHS(dg)
        qv, auxv = vm.to_vm(q), vm.aux_to_vm(aux)
        def body(y):
            dq, a2 = vm(y[0], y[1], 0.0)
            return (y[0] + eps * dq, a2)
        ms = titer(lambda: body, (qv, auxv), k_lo=2, k_hi=8)
        res[moist] = ms
        print(f"moist={moist}: RHS {ms:6.2f} ms", flush=True)
    # per-point: moist carries 6 prognostic vars vs 5
    print(f"moist/dry RHS ratio: {res[True]/res[False]:.3f} "
          f"(per-variable {res[True]/res[False]*5/6:.3f})", flush=True)

if __name__ == "__main__":
    main()
