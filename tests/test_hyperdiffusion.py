"""Hyperdiffusion (biharmonic) tests: LDG chain accuracy vs analytic ∇⁴
(reference test/Numerics/DGMethods/advection_diffusion hyperdiffusion
variants)."""

import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.atmos import AtmosModel, AtmosPhysics
from climatemachine_tpu.atmos.model import AtmosProblem
from climatemachine_tpu.atmos.boundaryconditions import AtmosBC
from climatemachine_tpu.atmos.hyperdiffusion import DryBiharmonic
from climatemachine_tpu.common.orientations import NoOrientation
from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.mesh.grid import make_grid
from climatemachine_tpu.mesh.topology import brick_topology
from climatemachine_tpu.physics import thermodynamics as td
from climatemachine_tpu.physics.parameters import EARTH


def test_biharmonic_tendency_matches_analytic():
    """Momentum hyperdiffusion tendency ≈ -ρ ν₄ k⁴ u for u = sin(kx)."""
    ps = EARTH
    L = 1000.0
    n, poly = 6, 5
    r = [np.linspace(0, L, n + 1)] * 3
    topo = brick_topology(r, periodicity=(True, True, True))
    grid = make_grid(topo, poly, dtype=np.float64)

    tau = 3600.0
    physics = AtmosPhysics(orientation=NoOrientation(),
                           hyperdiffusion=DryBiharmonic(tau))
    k = 2 * np.pi / L
    T0, u0 = 300.0, 1.0

    def init(m, coords, aux, t):
        x = coords[..., 0]
        rho = jnp.ones_like(x)
        u = u0 * jnp.sin(k * x)
        rhou = jnp.stack([u, jnp.zeros_like(u), jnp.zeros_like(u)], axis=-1)
        e_int = td.internal_energy(ps, jnp.full_like(x, T0))
        q = m.prog_spec.pack({"rho": rho,
                              "rhoe": rho * (e_int + 0.5 * u ** 2)},
                             batch_shape=rho.shape)
        return m.prog_spec.set(q, "rhou", rhou)

    model = AtmosModel(physics, AtmosProblem(
        init_state=init, boundary_conditions=(AtmosBC(), AtmosBC())),
        sources=())
    # NoOrientation => grad_Phi = 0 => u_h = u (no vertical projection)
    dg = DGModel(model, grid)
    q, aux = init_ode_state(dg)

    delta = model.aux_get(aux, "hyperdiffusion.delta")
    nu4 = (delta / 2) ** 4 / (2 * tau)
    assert float(jnp.std(delta)) / float(jnp.mean(delta)) < 0.3

    # isolate the hyperdiffusive tendency: RHS(with) - RHS(inviscid)
    tend, _ = dg(q, aux, 0.0)
    model2 = AtmosModel(AtmosPhysics(orientation=NoOrientation()),
                       model.problem, sources=())
    dg2 = DGModel(model2, grid)
    q2, aux2 = init_ode_state(dg2)
    tend2, _ = dg2(q2, aux2, 0.0)

    hyper_tend = model.prog(tend, "rhou")[..., 0] - \
        model2.prog(tend2, "rhou")[..., 0]
    x = grid.coords[..., 0]
    expected = -jnp.mean(nu4) * k ** 4 * u0 * jnp.sin(k * x)
    # L2 comparison (the 4th derivative carries pointwise Gibbs noise)
    M = grid.M
    l2 = lambda f: float(jnp.sqrt(jnp.sum(M * f * f)))
    assert l2(hyper_tend - expected) < 0.05 * l2(expected)


def test_hyperdiffusion_damps_gridscale_noise():
    ps = EARTH
    L = 1000.0
    r = [np.linspace(0, L, 4)] * 3
    topo = brick_topology(r, periodicity=(True, True, True))
    grid = make_grid(topo, 4, dtype=np.float64)
    physics = AtmosPhysics(orientation=NoOrientation(),
                           hyperdiffusion=DryBiharmonic(100.0))

    rng = np.random.RandomState(0)
    noise = jnp.asarray(rng.randn(grid.nelem, grid.Np))

    def init(m, coords, aux, t):
        rho = jnp.ones_like(coords[..., 0])
        u = 0.01 * noise
        rhou = jnp.stack([u, jnp.zeros_like(u), jnp.zeros_like(u)], axis=-1)
        e_int = td.internal_energy(ps, jnp.full_like(rho, 300.0))
        q = m.prog_spec.pack({"rho": rho, "rhoe": rho * e_int},
                             batch_shape=rho.shape)
        return m.prog_spec.set(q, "rhou", rhou)

    model = AtmosModel(physics, AtmosProblem(
        init_state=init, boundary_conditions=(AtmosBC(), AtmosBC())),
        sources=())
    dg = DGModel(model, grid)
    q, aux = init_ode_state(dg)

    from climatemachine_tpu.mesh.grid import min_node_distance
    from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy
    dt = 0.2 * min_node_distance(grid) / 360.0
    solver = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
    step = jax.jit(solver.step)
    ke0 = float(jnp.sum(model.prog(q, "rhou") ** 2))
    t = 0.0
    for _ in range(30):
        q, aux = step(q, aux, t)
        t += dt
    assert bool(jnp.all(jnp.isfinite(q)))
    assert float(jnp.sum(model.prog(q, "rhou") ** 2)) < ke0


def test_scalar_hyper_face_flux_matches_generic():
    """The scalar n·F2 exchange equals the generic hyM/hyP central flux
    (same RHS to round-off) on the Held-Suarez config."""
    import numpy as np
    from climatemachine_tpu.atmos.model import AtmosModel
    from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
    from climatemachine_tpu.experiments.held_suarez import held_suarez_config

    cfg = held_suarez_config(n_horz=2, n_vert=2, poly_order=3,
                             dtype=np.float64)
    dg = DGModel(cfg.model, cfg.grid)
    q, aux = init_ode_state(dg)
    t1, _ = dg(q, aux, 0.0)          # scalar path (turbulence is None)

    orig = AtmosModel.has_boundary_flux_second_order
    try:
        AtmosModel.has_boundary_flux_second_order = property(
            lambda self: True)       # force the generic bundled path
        t2, _ = DGModel(cfg.model, cfg.grid)(q, aux, 0.0)
    finally:
        AtmosModel.has_boundary_flux_second_order = orig

    scale = float(jnp.max(jnp.abs(t2)))
    assert float(jnp.max(jnp.abs(t1 - t2))) < 1e-12 * scale


def test_rows_ldg_matches_legacy_and_retrace():
    """ldg_kernel='legacy' (4-D face tensors) equals the rows path, and
    the SAME DGModel can be traced by two different jits (regression:
    cached jnp constants leaked tracers across traces)."""
    import jax
    import numpy as np
    from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
    from climatemachine_tpu.experiments.held_suarez import held_suarez_config

    cfg = held_suarez_config(n_horz=2, n_vert=2, poly_order=3,
                             dtype=np.float64)
    dg = DGModel(cfg.model, cfg.grid, ldg_kernel="rows")
    q, aux = init_ode_state(dg)
    t1, _ = jax.jit(lambda a, b: dg(a, b, 0.0))(q, aux)
    # second, distinct trace of the same model object must not leak
    t1b, _ = jax.jit(lambda a, b, t: dg(a, b, t))(q, aux, 0.0)
    t2, _ = DGModel(cfg.model, cfg.grid, ldg_kernel="legacy")(q, aux, 0.0)
    scale = float(jnp.max(jnp.abs(t2)))
    assert float(jnp.max(jnp.abs(t1 - t2))) < 1e-12 * scale
    assert float(jnp.max(jnp.abs(t1b - t1))) == 0.0


def test_pallas_ldg_matches_legacy():
    """ldg_kernel='pallas' (dg/pallas_ldg.py: fused VMEM chain kernels,
    interpret mode off-TPU) equals the legacy 4-D chain."""
    import numpy as np
    from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
    from climatemachine_tpu.experiments.held_suarez import held_suarez_config

    cfg = held_suarez_config(n_horz=2, n_vert=2, poly_order=3,
                             dtype=np.float64)
    dg = DGModel(cfg.model, cfg.grid, ldg_kernel="pallas")
    assert dg._ldg_pl
    q, aux = init_ode_state(dg)
    key = jax.random.PRNGKey(3)
    q = q * (1 + 1e-3 * jax.random.normal(key, q.shape))
    t1, _ = jax.jit(lambda a, b: dg(a, b, 0.0))(q, aux)
    t2, _ = DGModel(cfg.model, cfg.grid, ldg_kernel="legacy")(q, aux, 0.0)
    scale = float(jnp.max(jnp.abs(t2)))
    assert float(jnp.max(jnp.abs(t1 - t2))) < 1e-12 * scale


def test_varmajor_ldg_matches_legacy_and_retrace():
    """ldg_kernel='varmajor' (dg/ldg_varmajor.py: 2-D rows + MXU-matmul
    face operators) equals the legacy 4-D chain, on both the horizontal
    HS chain and under double tracing."""
    import jax
    import numpy as np
    from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
    from climatemachine_tpu.experiments.held_suarez import held_suarez_config

    cfg = held_suarez_config(n_horz=2, n_vert=2, poly_order=3,
                             dtype=np.float64)
    dg = DGModel(cfg.model, cfg.grid, ldg_kernel="varmajor")
    assert dg._ldg_vm
    q, aux = init_ode_state(dg)
    key = jax.random.PRNGKey(3)
    q = q * (1 + 1e-3 * jax.random.normal(key, q.shape))
    t1, _ = jax.jit(lambda a, b: dg(a, b, 0.0))(q, aux)
    t1b, _ = jax.jit(lambda a, b, t: dg(a, b, t))(q, aux, 0.0)
    t2, _ = DGModel(cfg.model, cfg.grid, ldg_kernel="legacy")(q, aux, 0.0)
    scale = float(jnp.max(jnp.abs(t2)))
    assert float(jnp.max(jnp.abs(t1 - t2))) < 1e-12 * scale
    assert float(jnp.max(jnp.abs(t1b - t1))) == 0.0
