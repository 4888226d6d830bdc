"""Parity of the var-major full RHS (dg/fast_rhs.py) with the generic
DGModel on the benchmark family: dry Held-Suarez (hyperdiffusion chain +
HS sources) and a moist variant (EquilMoist + EquilMoistBiharmonic).

The var-major path must reproduce the generic RHS at round-off: faces
are nodal subsets and thermo is evaluated with identical formulas, so
the only differences are summation orders inside matmuls.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climatemachine_tpu.dg.fast_rhs import VarMajorRHS, supports
from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.experiments.held_suarez import held_suarez_config


def _hs_dg(moist=False, n_horz=2, n_vert=2, poly=3):
    cfg = held_suarez_config(n_horz=n_horz, n_vert=n_vert, poly_order=poly,
                             dtype=np.float64)
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
            # small moisture load (well below saturation aloft)
            z = m.aux_get(aux, "orientation.Phi") / m.param_set.grav
            q_tot = 0.005 * jnp.exp(-z / 2e3)
            return m.prog_spec.set(q5, "moisture.rhoq_tot", rho * q_tot)

        problem = AtmosProblem(init_state=init_moist,
                               boundary_conditions=model.problem
                               .boundary_conditions)
        model = AtmosModel(physics, problem, sources=model.sources)
    return DGModel(model, cfg.grid)


@pytest.mark.parametrize("moist", [False, True], ids=["dry", "moist"])
def test_fast_rhs_parity(moist):
    dg = _hs_dg(moist=moist)
    assert supports(dg)
    q, aux = init_ode_state(dg)
    # perturb the state so the tendency is non-trivial
    key = jax.random.PRNGKey(0)
    q = q * (1 + 1e-3 * jax.random.normal(key, q.shape, dtype=q.dtype))

    dq_ref, aux_ref = dg(q, aux, 0.0)

    vm = VarMajorRHS(dg)
    dqv, auxv = vm(vm.to_vm(q), vm.aux_to_vm(aux), 0.0)
    dq = vm.from_vm(dqv)
    aux2 = vm.aux_from_vm(auxv)

    scale = jnp.max(jnp.abs(dq_ref), axis=(0, 1))
    err = jnp.max(jnp.abs(dq - dq_ref), axis=(0, 1)) / scale
    assert float(err.max()) < 1e-11, np.asarray(err)
    ascale = jnp.maximum(jnp.max(jnp.abs(aux_ref), axis=(0, 1)), 1e-300)
    aerr = jnp.max(jnp.abs(aux2 - aux_ref), axis=(0, 1)) / ascale
    assert float(aerr.max()) < 1e-11, np.asarray(aerr)


def test_fast_rhs_parity_remainder():
    """Fused-remainder (IMEX explicit stage) parity: full − vertical
    acoustic-gravity linear model."""
    from climatemachine_tpu.atmos.linear import \
        AtmosAcousticGravityLinearModel
    from climatemachine_tpu.dg.spatial import remainder_DGModel

    dg = _hs_dg()
    lin = AtmosAcousticGravityLinearModel(dg.balance_law)
    dg_lin = DGModel(lin, dg.grid, direction="vertical", update_aux=False)
    dg_rem = remainder_DGModel(dg, dg_lin)
    assert supports(dg_rem)
    q, aux = init_ode_state(dg)
    key = jax.random.PRNGKey(1)
    q = q * (1 + 1e-3 * jax.random.normal(key, q.shape, dtype=q.dtype))

    dq_ref, _ = dg_rem(q, aux, 0.0)
    vm = VarMajorRHS(dg_rem)
    dqv, _ = vm(vm.to_vm(q), vm.aux_to_vm(aux), 0.0)
    dq = vm.from_vm(dqv)
    scale = jnp.max(jnp.abs(dq_ref), axis=(0, 1))
    err = jnp.max(jnp.abs(dq - dq_ref), axis=(0, 1)) / scale
    assert float(err.max()) < 1e-11, np.asarray(err)


def test_fast_rhs_imex_step_parity():
    """IMEX ARK2GKC with var-major state (VMColumnLayout + fast_rhs as
    rhs_full) matches the grid-layout step at round-off."""
    from climatemachine_tpu.driver.solver_types import IMEXSolverType
    from climatemachine_tpu.mesh.grid import min_node_distance

    dg = _hs_dg()
    q, aux = init_ode_state(dg)
    dt = 0.1 * float(min_node_distance(dg.grid, "horizontal")) / 350.0

    ref = IMEXSolverType(state_layout="grid").make(dg, q, aux, dt)
    assert ref.vm is None
    q1, _ = ref.step(q, aux, 0.0)

    fast = IMEXSolverType().make(dg, q, aux, dt)
    assert fast.vm is not None
    vm = fast.vm
    q1v, _ = fast.step(vm.to_vm(q), vm.aux_to_vm(aux), 0.0)
    q2 = vm.from_vm(q1v)
    scale = jnp.max(jnp.abs(q1), axis=(0, 1))
    err = jnp.max(jnp.abs(q2 - q1), axis=(0, 1)) / scale
    # round-off accumulates over 3 ARK stages + 2 columnwise solves
    assert float(err.max()) < 5e-12, np.asarray(err)


def test_fast_rhs_step_parity():
    """A jitted LSRK54 step in var-major layout matches the generic step
    (integrators are layout-agnostic)."""
    from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy

    dg = _hs_dg()
    q, aux = init_ode_state(dg)
    dt = 10.0
    ref = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
    q_ref, _ = jax.jit(ref.step)(q, aux, 0.0)

    vm = VarMajorRHS(dg)
    sol = LSRK54CarpenterKennedy(vm, dt)
    qv, auxv = jax.jit(sol.step)(vm.to_vm(q), vm.aux_to_vm(aux), 0.0)
    q2 = vm.from_vm(qv)
    scale = jnp.max(jnp.abs(q_ref), axis=(0, 1))
    err = jnp.max(jnp.abs(q2 - q_ref), axis=(0, 1)) / scale
    assert float(err.max()) < 1e-12, np.asarray(err)


def test_solve_loop_vm_transparent():
    """solve() integrates in the solver's internal var-major layout but
    presents node-major q/aux at its boundary and to callbacks
    (ExplicitSolverType state_layout='auto' → solver.vm; the loop
    converts once, SolveState converts lazily for callbacks)."""
    from climatemachine_tpu.driver.solver_types import ExplicitSolverType
    from climatemachine_tpu.ode.solve import solve

    dg = _hs_dg()
    q, aux = init_ode_state(dg)
    dt = 10.0

    ref = ExplicitSolverType(state_layout="grid").make(dg, q, aux, dt)
    assert ref.vm is None
    st_ref = solve(q, aux, ref, timeend=3 * dt)

    fast = ExplicitSolverType().make(dg, q, aux, dt)
    assert fast.vm is not None
    seen = []

    class Probe:
        def call(self, state):
            # callbacks must observe the public node-major layout
            seen.append((state.step, np.asarray(state.q)))
            return False

    st = solve(q, aux, fast, timeend=3 * dt, callbacks=[Probe()])
    assert st.q.shape == q.shape and st.aux.shape == aux.shape
    scale = float(jnp.max(jnp.abs(st_ref.q)))
    assert float(jnp.max(jnp.abs(st.q - st_ref.q))) / scale < 1e-12
    assert len(seen) == 3
    assert seen[0][1].shape == q.shape
    np.testing.assert_allclose(seen[-1][1], np.asarray(st.q), rtol=0)


@pytest.mark.parametrize("case", ["dry", "moist", "remainder"])
def test_fast_rhs_pallas_kernels_parity(case):
    """chain_kernel='pallas' (fused 4-kernel chain + fused post-gather
    surface/lift kernel) reproduces the XLA path at round-off (interpret
    mode on CPU) for the dry, moist, and fused-remainder configs."""
    if case == "remainder":
        from climatemachine_tpu.atmos.linear import \
            AtmosAcousticGravityLinearModel
        from climatemachine_tpu.dg.spatial import remainder_DGModel
        base = _hs_dg()
        lin = AtmosAcousticGravityLinearModel(base.balance_law)
        dg_lin = DGModel(lin, base.grid, direction="vertical",
                         update_aux=False)
        dg = remainder_DGModel(base, dg_lin)
        q, aux = init_ode_state(base)
    else:
        dg = _hs_dg(moist=(case == "moist"))
        q, aux = init_ode_state(dg)
    key = jax.random.PRNGKey(2)
    q = q * (1 + 1e-3 * jax.random.normal(key, q.shape, dtype=q.dtype))
    vm_x = VarMajorRHS(dg)
    dx, _ = vm_x(vm_x.to_vm(q), vm_x.aux_to_vm(aux), 0.0)
    scale = jnp.max(jnp.abs(dx), axis=(0, 2))
    # "pallas" = fused extract+trace bundle + fused flux/lift kernel;
    # "hybrid" = fused bundle kernel + XLA gather/flux/lift (both
    # opt-in: hardware A/Bs keep the XLA surface as default —
    # scripts/out/surface_ab2.log, hybrid_probe2.log)
    for skind in ("pallas", "hybrid"):
        vm_p = VarMajorRHS(dg, chain_kernel="pallas")
        vm_p.surface_kernel = skind
        dp, _ = vm_p(vm_p.to_vm(q), vm_p.aux_to_vm(aux), 0.0)
        err = jnp.max(jnp.abs(dp - dx), axis=(0, 2)) / scale
        assert float(err.max()) < 1e-11, (skind, np.asarray(err))
