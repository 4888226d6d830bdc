"""Multi-device shard_map DG vs single-device reference (8 virtual CPU
devices; mirrors the reference's mpi_connect/halo-exchange tests,
test/Numerics/Mesh/mpi_connect*.jl, without a cluster)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climatemachine_tpu.atmos import (AtmosModel, AtmosPhysics, Gravity,
                                      HydrostaticState)
from climatemachine_tpu.atmos.model import AtmosProblem
from climatemachine_tpu.atmos.boundaryconditions import AtmosBC
from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.mesh.grid import make_grid
from climatemachine_tpu.mesh.topology import (stacked_brick_topology,
                                              stacked_cubed_sphere_topology)
from climatemachine_tpu.parallel import ShardedDGModel, make_mesh
from climatemachine_tpu.physics import thermodynamics as td
from climatemachine_tpu.physics.parameters import EARTH
from climatemachine_tpu.physics.temperature_profiles import (
    DecayingTemperatureProfile)


def _atmos(grid, spherical=False):
    ps = EARTH
    from climatemachine_tpu.common.orientations import (FlatOrientation,
                                                        SphericalOrientation)
    physics = AtmosPhysics(
        orientation=SphericalOrientation() if spherical else FlatOrientation(),
        ref_state=HydrostaticState(DecayingTemperatureProfile(290.0, 220.0)))

    def init(m, coords, aux, t):
        # reference state + a smooth non-trivial perturbation with motion
        s = m.aux_spec
        rho = s.get(aux, "ref_state.rho")
        p = s.get(aux, "ref_state.p")
        Phi = s.get(aux, "orientation.Phi")
        x = coords / jnp.max(jnp.abs(coords))
        pert = 0.01 * jnp.sin(3 * x[..., 0]) * jnp.cos(2 * x[..., 1])
        rho = rho * (1 + pert)
        T = p / (ps.R_d * rho)
        u = 10.0 * jnp.stack([jnp.cos(x[..., 2]), jnp.sin(x[..., 0]),
                              0.1 * jnp.ones_like(pert)], axis=-1)
        rhou = rho[..., None] * u
        ke = 0.5 * jnp.sum(u * u, axis=-1)
        rhoe = rho * (td.internal_energy(ps, T) + ke + Phi)
        q = m.prog_spec.pack({"rho": rho, "rhoe": rhoe},
                             batch_shape=rho.shape)
        return m.prog_spec.set(q, "rhou", rhou)

    problem = AtmosProblem(init_state=init,
                           boundary_conditions=(AtmosBC(), AtmosBC()))
    return AtmosModel(physics, problem, sources=(Gravity(),))


@pytest.mark.parametrize("halo", ["ppermute", "allgather"])
@pytest.mark.parametrize("topo_kind", ["brick", "sphere"])
def test_sharded_rhs_matches_single_device(topo_kind, halo):
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    if topo_kind == "brick":
        r = [np.linspace(0, 1e3, 5), np.linspace(0, 1e3, 3),
             np.linspace(0, 1e3, 4)]
        topo = stacked_brick_topology(
            r, periodicity=(True, True, False),
            boundary=np.array([[0, 0], [0, 0], [1, 2]]))
    else:
        radius = EARTH.planet_radius
        topo = stacked_cubed_sphere_topology(
            2, radius + np.linspace(0, 30e3, 3))
    grid = make_grid(topo, 3, dtype=np.float64)
    model = _atmos(grid, spherical=(topo_kind == "sphere"))
    dg = DGModel(model, grid)
    q, aux = init_ode_state(dg)
    tend_ref, aux_ref = dg(q, aux, 0.0)
    assert bool(jnp.all(jnp.isfinite(tend_ref)))

    mesh = make_mesh(jax.devices()[:8])
    sdg = ShardedDGModel(dg, mesh, halo=halo)
    qs, auxs = sdg.shard(q), sdg.shard(aux)
    tend_sh, _ = jax.jit(sdg)(qs, auxs, 0.0)

    err = float(jnp.max(jnp.abs(tend_sh - tend_ref)))
    scale = float(jnp.max(jnp.abs(tend_ref)))
    assert err < 1e-11 * max(scale, 1.0)


def test_sharded_step_matches_single_device():
    """Full LSRK54 steps agree between sharded and single-device paths."""
    from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy

    r = [np.linspace(0, 1e3, 9), np.linspace(0, 1e3, 2),
         np.linspace(0, 1e3, 3)]
    topo = stacked_brick_topology(
        r, periodicity=(True, True, False),
        boundary=np.array([[0, 0], [0, 0], [1, 2]]))
    grid = make_grid(topo, 3, dtype=np.float64)
    model = _atmos(grid)
    dg = DGModel(model, grid)
    q, aux = init_ode_state(dg)

    mesh = make_mesh(jax.devices()[:8])
    sdg = ShardedDGModel(dg, mesh)
    dt = 0.05
    s1 = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
    s2 = LSRK54CarpenterKennedy(lambda a, b, t: sdg(a, b, t), dt)

    q1, aux1 = q, aux
    step1 = jax.jit(s1.step)
    for i in range(3):
        q1, aux1 = step1(q1, aux1, i * dt)

    q2, aux2 = sdg.shard(q), sdg.shard(aux)
    step2 = jax.jit(s2.step)
    for i in range(3):
        q2, aux2 = step2(q2, aux2, i * dt)

    err = float(jnp.max(jnp.abs(q2 - q1)))
    assert err < 1e-10 * float(jnp.max(jnp.abs(q1)))


def test_sharded_multihost_mesh_matches_single_device():
    """2-D ('dcn','ici') mesh: element ring host-major, same answers
    (multi-host layout of SURVEY §2.13; on CPU the 8 virtual devices
    stand in as 2 hosts x 4 chips)."""
    from jax.sharding import Mesh

    r = [np.linspace(0, 1e3, 9), np.linspace(0, 1e3, 2),
         np.linspace(0, 1e3, 3)]
    topo = stacked_brick_topology(
        r, periodicity=(True, True, False),
        boundary=np.array([[0, 0], [0, 0], [1, 2]]))
    grid = make_grid(topo, 3, dtype=np.float64)
    model = _atmos(grid)
    dg = DGModel(model, grid)
    q, aux = init_ode_state(dg)
    tend_ref, _ = dg(q, aux, 0.0)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("dcn", "ici"))
    for halo in ("ppermute", "allgather"):
        sdg = ShardedDGModel(dg, mesh, halo=halo)
        qs, auxs = sdg.shard(q), sdg.shard(aux)
        tend_sh, _ = jax.jit(sdg)(qs, auxs, 0.0)
        err = float(jnp.max(jnp.abs(tend_sh - tend_ref)))
        scale = float(jnp.max(jnp.abs(tend_ref)))
        assert err < 1e-11 * max(scale, 1.0), halo


def test_sharded_checkpoint_roundtrip(tmp_path):
    """Checkpoint of a sharded state saves per-shard data with global
    element offsets and reassembles exactly — the multi-host write path
    (VERDICT #8; reference per-rank JLD2, Checkpoint.jl:46-69) exercised
    on the 2x4 virtual multihost mesh."""
    from jax.sharding import Mesh

    from climatemachine_tpu.driver import checkpoint as cp

    r = [np.linspace(0, 1e3, 9), np.linspace(0, 1e3, 2),
         np.linspace(0, 1e3, 3)]
    topo = stacked_brick_topology(
        r, periodicity=(True, True, False),
        boundary=np.array([[0, 0], [0, 0], [1, 2]]))
    grid = make_grid(topo, 3, dtype=np.float64)
    model = _atmos(grid)
    dg = DGModel(model, grid)
    q, aux = init_ode_state(dg)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("dcn", "ici"))
    sdg = ShardedDGModel(dg, mesh)
    qs, auxs = sdg.shard(q), sdg.shard(aux)

    path = cp.write_checkpoint(str(tmp_path), "mh", 3, qs, auxs,
                               t=12.5, step=7)
    # the sharded array must have been written as shards, not dense
    with np.load(path) as data:
        assert "q__nshards" in data.files and int(data["q__nshards"]) > 1
        assert "q" not in data.files

    q2, aux2, t2, step2 = cp.read_checkpoint(str(tmp_path), "mh", 3)
    np.testing.assert_array_equal(q2, np.asarray(q))
    np.testing.assert_array_equal(aux2, np.asarray(aux))
    assert t2 == 12.5 and step2 == 7

    # restored state re-shards and steps identically to the original
    q3 = sdg.shard(jnp.asarray(q2))
    tend_a, _ = jax.jit(sdg)(qs, auxs, 0.0)
    tend_b, _ = jax.jit(sdg)(q3, sdg.shard(jnp.asarray(aux2)), 0.0)
    assert float(jnp.max(jnp.abs(tend_a - tend_b))) == 0.0


def _hs_small(n_horz=4, n_vert=2, poly=3):
    from climatemachine_tpu.experiments.held_suarez import held_suarez_config
    return held_suarez_config(n_horz=n_horz, n_vert=n_vert,
                              poly_order=poly, dtype=np.float64)


def test_sharded_fast_paths_match_single_device():
    """Var-major fast surface + LDG chain stay ON under shard_map via the
    face-row halo, reproducing the single-device RHS (Held-Suarez
    physics incl. the DryBiharmonic hyperdiffusion chain)."""
    assert len(jax.devices()) >= 8
    cfg = _hs_small()
    dg = DGModel(cfg.model, cfg.grid, surface_kernel="varmajor")
    assert dg._fast_surface and dg._ldg_vm
    q, aux = init_ode_state(dg)
    tend_ref, _ = dg(q, aux, 0.0)

    for halo in ("ppermute", "allgather"):
        mesh = make_mesh(jax.devices()[:8])
        sdg = ShardedDGModel(dg, mesh, halo=halo)
        assert sdg._row_parts, "row halo must be available for this grid"
        qs, auxs = sdg.shard(q), sdg.shard(aux)
        tend_s, _ = jax.jit(lambda a, b: sdg(a, b, 0.0))(qs, auxs)
        err = float(jnp.max(jnp.abs(jnp.asarray(tend_s) - tend_ref)))
        scale = float(jnp.max(jnp.abs(tend_ref)))
        assert err < 1e-11 * scale, (halo, err, scale)


def test_sharded_imex_step_matches_single_device():
    """ARK2GKC + BlockTridiag columnwise solve on 8 virtual devices ==
    the identical single-device assembly (VERDICT r2 gap: ColumnLayout
    reshapes + block-Thomas under GSPMD were unvalidated on >1 dev)."""
    from climatemachine_tpu.driver.solver_types import IMEXSolverType
    from climatemachine_tpu.mesh.grid import min_node_distance
    assert len(jax.devices()) >= 8
    cfg = _hs_small()
    dg = DGModel(cfg.model, cfg.grid, surface_kernel="varmajor")
    q, aux = init_ode_state(dg)
    dt = 6 * 0.3 * float(min_node_distance(cfg.grid)) / 350.0

    imex0 = IMEXSolverType().make(dg, q, aux, dt)
    from climatemachine_tpu.ode.solve import from_internal, to_internal
    qr, auxr = to_internal(imex0, q, aux)
    t = 0.0
    for _ in range(3):
        qr, auxr = imex0.step(qr, auxr, t)
        t += dt
    qr, auxr = from_internal(imex0, qr, auxr)

    mesh = make_mesh(jax.devices()[:8])
    sdg = ShardedDGModel(dg, mesh)
    qs, auxs = sdg.shard(q), sdg.shard(aux)
    imex_s = IMEXSolverType().make(sdg, qs, auxs, dt)
    t = 0.0
    for _ in range(3):
        qs, auxs = imex_s.step(qs, auxs, t)
        t += dt
    err = float(jnp.max(jnp.abs(jnp.asarray(qs) - qr)))
    scale = float(jnp.max(jnp.abs(qr - q))) + 1e-30
    assert err < 1e-9 * scale, (err, scale)


def test_sharded_second_order_flux_matches_single_device():
    """Second-order (gradient-flux) halo round under shard_map: a
    ConstantViscosity LES box RHS == single device (VERDICT r2 gap)."""
    from climatemachine_tpu.common.turbulence import ConstantKinematicViscosity
    r = [np.linspace(0, 1e3, 9), np.linspace(0, 1e3, 3),
         np.linspace(0, 1e3, 4)]
    topo = stacked_brick_topology(
        r, periodicity=(True, True, False),
        boundary=np.array([[0, 0], [0, 0], [1, 2]]))
    grid = make_grid(topo, 3, dtype=np.float64)
    ps = EARTH
    from climatemachine_tpu.common.orientations import FlatOrientation
    physics = AtmosPhysics(
        orientation=FlatOrientation(),
        ref_state=HydrostaticState(DecayingTemperatureProfile(290.0, 220.0)),
        turbulence=ConstantKinematicViscosity(75.0))

    def init(m, coords, aux, t):
        s = m.aux_spec
        rho = s.get(aux, "ref_state.rho")
        p = s.get(aux, "ref_state.p")
        Phi = s.get(aux, "orientation.Phi")
        x = coords / 1e3
        rho = rho * (1 + 0.01 * jnp.sin(2 * x[..., 0]) * jnp.cos(x[..., 2]))
        T = p / (ps.R_d * rho)
        u = 8.0 * jnp.stack([jnp.cos(x[..., 1]), jnp.sin(x[..., 0]),
                             0.1 * jnp.cos(x[..., 2])], axis=-1)
        rhou = rho[..., None] * u
        ke = 0.5 * jnp.sum(u * u, axis=-1)
        rhoe = rho * (td.internal_energy(ps, T) + ke + Phi)
        q = m.prog_spec.pack({"rho": rho, "rhoe": rhoe},
                             batch_shape=rho.shape)
        return m.prog_spec.set(q, "rhou", rhou)

    model = AtmosModel(physics,
                       AtmosProblem(init_state=init,
                                    boundary_conditions=(AtmosBC(), AtmosBC())),
                       sources=(Gravity(),))
    dg = DGModel(model, grid)
    assert dg.n_gradient > 0, "test must exercise the gradient-flux halo"
    q, aux = init_ode_state(dg)
    tend_ref, _ = dg(q, aux, 0.0)

    mesh = make_mesh(jax.devices()[:8])
    sdg = ShardedDGModel(dg, mesh)
    qs, auxs = sdg.shard(q), sdg.shard(aux)
    tend_s, _ = jax.jit(lambda a, b: sdg(a, b, 0.0))(qs, auxs)
    err = float(jnp.max(jnp.abs(jnp.asarray(tend_s) - tend_ref)))
    scale = float(jnp.max(jnp.abs(tend_ref)))
    assert err < 1e-11 * scale, (err, scale)


def test_comm_audit_halo_is_face_rows_only():
    """Compiled-HLO communication accounting (reference analog: the
    explicit per-neighbor send/recv maps of MPIStateArrays.jl:411-514
    make halo traffic enumerable).  The ppermute-halo step must compile
    to per-offset collective-permutes of face exports only: no
    all-gather / all-to-all, no volume-sized permute payloads."""
    from climatemachine_tpu.parallel.comm_audit import (audit_halo_exchange,
                                                        collective_stats)

    assert len(jax.devices()) >= 8
    cfg = _hs_small()
    dg = DGModel(cfg.model, cfg.grid, surface_kernel="varmajor")
    q, aux = init_ode_state(dg)
    mesh = make_mesh(jax.devices()[:8])
    sdg = ShardedDGModel(dg, mesh, halo="ppermute")
    qs, auxs = sdg.shard(q), sdg.shard(aux)

    stats = audit_halo_exchange(sdg, lambda a, b: sdg(a, b, 0.0), qs, auxs)
    assert stats["n_permutes"] > 0, "no collectives found — not sharded?"
    assert stats["total_permute_bytes_per_call_per_device"] > 0

    # the audit must actually FAIL on a widened halo: the allgather rig
    # moves the full send set to every device
    sdg_ag = ShardedDGModel(dg, mesh, halo="allgather")
    qs2, auxs2 = sdg_ag.shard(q), sdg_ag.shard(aux)
    ag = collective_stats(lambda a, b: sdg_ag(a, b, 0.0), qs2, auxs2)
    assert any(ag["all-gather"]), "allgather rig should show all-gathers"
    import pytest as _pt
    with _pt.raises(AssertionError):
        audit_halo_exchange(sdg_ag, lambda a, b: sdg_ag(a, b, 0.0),
                            qs2, auxs2)
