"""I/O + interpolation + diagnostics tests (reference test/InputOutput,
test/Diagnostics)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from climatemachine_tpu.diagnostics import (DiagnosticsGroup,
                                            HorizontalAverage,
                                            PointwiseDiagnostic, StateCheck)
from climatemachine_tpu.diagnostics.machine import (atmos_default_vars,
                                                    atmos_les_profiles,
                                                    horizontal_average)
from climatemachine_tpu.io.vtk import writevtk
from climatemachine_tpu.io.writers import NetCDFWriter
from climatemachine_tpu.mesh.grid import make_grid
from climatemachine_tpu.mesh.interpolation import (InterpolationBrick,
                                                   InterpolationCubedSphere)
from climatemachine_tpu.mesh.topology import (stacked_brick_topology,
                                              stacked_cubed_sphere_topology)
from climatemachine_tpu.physics.parameters import EARTH


def _brick(nx=3, nz=4, poly=4, L=1000.0):
    r = [np.linspace(0, L, nx + 1)] * 2 + [np.linspace(0, L, nz + 1)]
    topo = stacked_brick_topology(r, periodicity=(True, True, False),
                                  boundary=np.array([[0, 0], [0, 0], [1, 2]]))
    return make_grid(topo, poly, dtype=np.float64)


def test_interpolation_brick_exact_for_polynomials():
    grid = _brick()
    x, y, z = (grid.coords[..., i] for i in range(3))
    f = (x ** 2 + 3 * y * z + z ** 3)[..., None]
    itp = InterpolationBrick(grid,
                             np.linspace(10, 990, 7),
                             np.linspace(5, 995, 5),
                             np.linspace(1, 999, 6))
    out = itp(f)[..., 0]
    X, Y, Z = np.meshgrid(np.linspace(10, 990, 7), np.linspace(5, 995, 5),
                          np.linspace(1, 999, 6), indexing="ij")
    expected = X ** 2 + 3 * Y * Z + Z ** 3
    assert float(jnp.max(jnp.abs(out - expected))) < 1e-8 * expected.max()


def test_interpolation_cubed_sphere_recovers_smooth_field():
    a = EARTH.planet_radius
    topo = stacked_cubed_sphere_topology(4, a + np.linspace(0, 30e3, 4))
    grid = make_grid(topo, 4, dtype=np.float64)
    c = grid.coords
    r = jnp.linalg.norm(c, axis=-1)
    lat = jnp.arcsin(jnp.clip(c[..., 2] / r, -1, 1))
    lon = jnp.arctan2(c[..., 1], c[..., 0])
    f = (jnp.sin(lat) ** 2 + jnp.cos(lat) * jnp.cos(lon)
         + (r - a) / 30e3)[..., None]

    lats = np.linspace(-80, 80, 9)
    lons = np.linspace(-170, 170, 12)
    rads = a + np.linspace(2e3, 28e3, 4)
    itp = InterpolationCubedSphere(grid, lats, lons, rads)
    out = itp(f)[..., 0]
    LAT, LON, RAD = np.meshgrid(np.deg2rad(lats), np.deg2rad(lons), rads,
                                indexing="ij")
    expected = (np.sin(LAT) ** 2 + np.cos(LAT) * np.cos(LON)
                + (RAD - a) / 30e3)
    err = float(jnp.max(jnp.abs(out - expected)))
    assert err < 2e-3  # smooth field, p4 resolution


def test_vtk_writer(tmp_path):
    grid = _brick(nx=2, nz=2, poly=2)
    x = np.asarray(grid.coords[..., 0])
    path = writevtk(str(tmp_path / "out"), grid, {"x": x})
    content = open(path).read()
    assert "UnstructuredGrid" in content and "Name=\"x\"" in content
    assert os.path.getsize(path) > 1000


def test_netcdf_writer_roundtrip(tmp_path):
    import h5py
    w = NetCDFWriter()
    path = str(tmp_path / "diag.nc")
    dims = {"z": np.linspace(0, 1, 5)}
    w.init_data(path, dims, {"Tavg": (("z",), np.float64)})
    w.append_data(path, {"Tavg": np.arange(5.0)}, 0.0)
    w.append_data(path, {"Tavg": np.arange(5.0) + 1}, 10.0)
    with h5py.File(path) as f:
        assert f["time"].shape == (2,)
        assert np.allclose(f["Tavg"][1], np.arange(5.0) + 1)
        assert f["Tavg"].dims[1][0].name.endswith("z")


def test_horizontal_average_and_group(tmp_path):
    grid = _brick()
    z = grid.coords[..., 2]
    avg = horizontal_average(grid, z)
    # horizontally averaging z must return each level's z value
    Nq1, Nq2, Nq3 = grid.Nq
    zlvl = np.asarray(z).reshape(grid.n_horz, grid.n_vert, Nq3,
                                 Nq2 * Nq1)[0, :, :, 0].reshape(-1)
    assert avg.shape[0] == grid.n_vert * Nq3
    assert float(jnp.max(jnp.abs(avg - zlvl))) < 1e-9

    # full group write path with an atmos model
    from tests.test_atmos_dry import _box_model
    from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
    model, g2 = _box_model()
    dg = DGModel(model, g2)
    q, aux = init_ode_state(dg)
    group = DiagnosticsGroup("les_profiles", model, g2,
                             atmos_les_profiles(model),
                             writer=NetCDFWriter(),
                             out_path=str(tmp_path / "prof.nc"))
    group.write(q, aux, 0.0)
    group.write(q, aux, 60.0)
    import h5py
    with h5py.File(str(tmp_path / "prof.nc")) as f:
        assert f["time"].shape == (2,)
        assert f["temp_avg"].shape[1] == g2.n_vert * g2.Nq[2]
        assert np.all(np.isfinite(f["temp_avg"][:]))


def test_state_check_refvals():
    from types import SimpleNamespace
    from climatemachine_tpu.utils.variables import VarSpec
    spec = VarSpec(a=1, b=2)
    rng = np.random.RandomState(0)
    arr = rng.randn(10, 5, 3)
    sc = StateCheck(tracked=((lambda s: arr, spec, "Q"),))
    state = SimpleNamespace(q=None, aux=None, t=0.0, step=0)
    snap = sc.snapshot(state)
    assert ("Q", "a") in snap
    # refvals round trip: exact match passes, perturbed fails
    ns = {}
    exec(sc.print_ref(), ns)
    assert sc.do_check(ns["refvals"], 1e-12)
    bad = {k: dict(v, mean=v["mean"] + 1.0) for k, v in ns["refvals"].items()}
    assert not sc.do_check(bad, 1e-12)


def test_vorticity_diagnostic():
    """DG vorticity (reference diagnostic_fields.jl Vorticity): a shear
    flow u = (sin(2πy/L), 0, 0) on a periodic box has ω_z = -2π/L
    cos(2πy/L); the GCM default group includes 'vort'."""
    import jax.numpy as jnp
    from climatemachine_tpu.atmos import (AtmosModel, AtmosPhysics,
                                          HydrostaticState)
    from climatemachine_tpu.atmos.model import AtmosProblem
    from climatemachine_tpu.atmos.boundaryconditions import AtmosBC
    from climatemachine_tpu.diagnostics.fields import (atmos_gcm_default_vars,
                                                       vorticity)
    from climatemachine_tpu.diagnostics.machine import DiagnosticsGroup
    from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
    from climatemachine_tpu.mesh.grid import make_grid
    from climatemachine_tpu.mesh.topology import stacked_brick_topology
    from climatemachine_tpu.physics.temperature_profiles import (
        DryAdiabaticProfile)
    from climatemachine_tpu.physics.parameters import EARTH
    from climatemachine_tpu.physics import thermodynamics as td

    ps = EARTH
    L = 1000.0
    r = [np.linspace(0, L, 5)] * 2 + [np.linspace(0, L, 3)]
    topo = stacked_brick_topology(r, periodicity=(True, True, False),
                                  boundary=np.array([[0, 0], [0, 0],
                                                     [1, 2]]))
    grid = make_grid(topo, 4, dtype=np.float64)
    physics = AtmosPhysics(
        ref_state=HydrostaticState(DryAdiabaticProfile(300.0, 110.0)))

    def init(m, coords, aux, t):
        y = coords[..., 1]
        p = m.aux_spec.get(aux, "ref_state.p")
        Phi = m.aux_spec.get(aux, "orientation.Phi")
        T = 300.0 * (p / ps.MSLP) ** ps.kappa_d
        rho = p / (ps.R_d * T)
        u = jnp.sin(2 * np.pi * y / L)
        q = m.prog_spec.pack(
            {"rho": rho,
             "rhoe": rho * (td.internal_energy(ps, T) + Phi
                            + 0.5 * u ** 2)},
            batch_shape=rho.shape)
        return m.prog_spec.set(q, "rhou",
                               jnp.stack([rho * u, 0 * u, 0 * u], axis=-1))

    model = AtmosModel(physics,
                       AtmosProblem(init_state=init,
                                    boundary_conditions=(AtmosBC(),
                                                         AtmosBC())))
    dg = DGModel(model, grid)
    q0, aux = init_ode_state(dg)

    u = model.prog(q0, "rhou") / model.prog(q0, "rho")[..., None]
    w = np.asarray(vorticity(dg, u))
    y = np.asarray(grid.coords[..., 1])
    expect = -2 * np.pi / L * np.cos(2 * np.pi * y / L)
    np.testing.assert_allclose(w[..., 2], expect, atol=5e-4)
    assert np.abs(w[..., 0]).max() < 1e-8
    assert np.abs(w[..., 1]).max() < 1e-8

    group = DiagnosticsGroup("gcm_default", model, grid,
                             atmos_gcm_default_vars(model, dg))
    vals = group.collect(q0, aux)
    # full reference variable list (atmos_gcm_default.jl
    # vars_atmos_gcm_default_simple_3d, dry case)
    assert set(vals) == {"u", "v", "w", "rho", "temp", "pres", "thd",
                         "et", "ei", "ht", "hi", "vort", "vort2"}
    np.testing.assert_allclose(vals["vort"], expect, atol=5e-4)
    # the element-local strong-form estimate agrees with the
    # face-corrected LDG one on this smooth field
    np.testing.assert_allclose(vals["vort2"], expect, atol=5e-3)
    # thermodynamic identities: ht - et = hi - ei = R_d T
    np.testing.assert_allclose(vals["ht"] - vals["et"],
                               EARTH.R_d * vals["temp"], rtol=1e-12)
    np.testing.assert_allclose(vals["hi"] - vals["ei"],
                               EARTH.R_d * vals["temp"], rtol=1e-10)
    np.testing.assert_allclose(
        vals["thd"], vals["temp"] * (EARTH.MSLP / vals["pres"])
        ** EARTH.kappa_d, rtol=1e-12)
