"""Extra standard diagnostics groups (reference atmos_mass_energy_loss.jl,
atmos_turbulence_stats.jl, atmos_refstate_perturbations.jl,
atmos_les_spectra.jl, atmos_gcm_spectra.jl, dump_state/aux/tendencies)."""

import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.atmos import AtmosModel, AtmosPhysics, HydrostaticState
from climatemachine_tpu.atmos.boundaryconditions import AtmosBC
from climatemachine_tpu.atmos.model import AtmosProblem
from climatemachine_tpu.common.turbulence import ConstantKinematicViscosity
from climatemachine_tpu.diagnostics.groups_extra import (
    AtmosGCMSpectraGroup, AtmosLESSpectraGroup, AtmosMassEnergyLossGroup,
    AtmosRefStatePerturbationsGroup, AtmosTurbulenceStatsGroup, DumpGroup)
from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.experiments.held_suarez import held_suarez_config
from climatemachine_tpu.io.writers import NetCDFWriter
from climatemachine_tpu.mesh.grid import make_grid
from climatemachine_tpu.mesh.interpolation import (InterpolationBrick,
                                                   InterpolationCubedSphere)
from climatemachine_tpu.mesh.topology import stacked_brick_topology
from climatemachine_tpu.physics.parameters import EARTH
from climatemachine_tpu.physics.temperature_profiles import DryAdiabaticProfile

L = 1000.0


def _les_setup(ux=10.0):
    ps = EARTH
    r = [np.linspace(0, L, 4)] * 2 + [np.linspace(0, L, 4)]
    topo = stacked_brick_topology(r, periodicity=(True, True, False),
                                  boundary=np.array([[0, 0], [0, 0], [1, 2]]))
    grid = make_grid(topo, 3, dtype=np.float64)
    physics = AtmosPhysics(
        ref_state=HydrostaticState(DryAdiabaticProfile(300.0, 110.0)),
        turbulence=ConstantKinematicViscosity(0.0))

    def init(m, coords, aux, t):
        x = coords[..., 0]
        p = m.aux_spec.get(aux, "ref_state.p")
        Phi = m.aux_spec.get(aux, "orientation.Phi")
        T = 300.0 * jnp.ones_like(x)     # isothermal: differs from the
        rho = p / (ps.R_d * T)           # adiabatic reference aloft
        u = ux * jnp.ones_like(x) + jnp.sin(2 * jnp.pi * x / L)
        e_int = ps.cv_d * (T - ps.T_0)
        rhou = jnp.stack([rho * u] + [jnp.zeros_like(u)] * 2, axis=-1)
        return m.prog_spec.pack(
            {"rho": rho, "rhou": rhou,
             "rhoe": rho * (e_int + 0.5 * u ** 2 + Phi)},
            batch_shape=rho.shape)

    model = AtmosModel(physics, AtmosProblem(
        init_state=init, boundary_conditions=(AtmosBC(), AtmosBC())))
    dg = DGModel(model, grid)
    q, aux = init_ode_state(dg)
    return dg, q, aux


def test_mass_energy_loss(tmp_path):
    dg, q, aux = _les_setup()
    grp = AtmosMassEnergyLossGroup(dg, writer=NetCDFWriter(),
                                   out_path=str(tmp_path / "mel.nc"))
    v0 = grp.write(q, aux, 0.0)
    assert v0["delta_mass"] == 0.0 and v0["delta_energy"] == 0.0
    # perturb mass by 1%: delta_mass reports exactly 1%
    s = dg.balance_law.prog_spec
    q2 = s.set(q, "rho", s.get(q, "rho") * 1.01)
    v1 = grp.write(q2, aux, 1.0)
    assert np.isclose(float(v1["delta_mass"]), 0.01, rtol=1e-10)
    import h5py
    with h5py.File(str(tmp_path / "mel.nc"), "r") as f:
        assert f["delta_mass"].shape == (2,)


def test_turbulence_stats():
    dg, q, aux = _les_setup(ux=10.0)
    grp = AtmosTurbulenceStatsGroup(dg, nor=10.0, iter_=2.0)
    v0 = grp.write(q, aux, 0.0)
    # <(u/nor)^2>/2 with u = 10 + sin: E_k = (100 + 0.5)/200 approx
    assert np.isclose(float(v0["E_k"]), (100.0 + 0.5) / 200.0, rtol=1e-3)
    assert v0["dE"] == 0.0
    # halve the momentum: dE = (E_k0 - E_k1)/iter
    s = dg.balance_law.prog_spec
    q2 = s.set(q, "rhou", s.get(q, "rhou") * 0.5)
    v1 = grp.write(q2, aux, 1.0)
    assert np.isclose(float(v1["dE"]),
                      (float(v0["E_k"]) - float(v1["E_k"])) / 2.0)
    assert float(v1["dE"]) > 0


def test_refstate_perturbations(tmp_path):
    dg, q, aux = _les_setup()
    pts = np.linspace(50, 950, 5)
    itp = InterpolationBrick(dg.grid, pts, pts, pts)
    grp = AtmosRefStatePerturbationsGroup(
        dg, itp, writer=NetCDFWriter(),
        out_path=str(tmp_path / "pert.nc"))
    vals = grp.write(q, aux, 0.0)
    assert vals["rho"].shape == (5, 5, 5)
    # init T = isothermal 300K vs DryAdiabatic ref: temp perturbation
    # nonzero aloft; rho perturbation small near the surface
    assert np.max(np.abs(vals["temp"])) > 1.0
    import h5py
    with h5py.File(str(tmp_path / "pert.nc"), "r") as f:
        assert f["temp"].shape == (1, 5, 5, 5)
        assert np.allclose(f["x"][:], pts)


def test_les_spectra():
    dg, q, aux = _les_setup(ux=0.0)
    n = 16
    pts = np.linspace(0, L, n, endpoint=False)
    itp = InterpolationBrick(dg.grid, pts, pts, pts + L / (2 * n))
    grp = AtmosLESSpectraGroup(dg, itp, L=L)
    vals = grp.collect(q)
    spec = vals["spectrum"]
    assert spec.shape == (n // 2,)
    # u = sin(2 pi x / L): all energy in the k=1 shell
    assert spec[0] > 100 * spec[1:].sum()


def test_gcm_spectra_and_dumps(tmp_path):
    cfg = held_suarez_config(n_horz=3, n_vert=2, poly_order=3,
                             dtype=np.float64)
    dg = DGModel(cfg.model, cfg.grid)
    q, aux = init_ode_state(dg)
    a = EARTH.planet_radius
    from climatemachine_tpu.common.spectra import gaussian_lats_deg
    lats = gaussian_lats_deg(9)
    lons = np.linspace(-180, 170, 16)
    rads = a + np.linspace(2e3, 28e3, 3)
    itp = InterpolationCubedSphere(cfg.grid, lats, lons, rads)
    grp = AtmosGCMSpectraGroup(dg, itp, writer=NetCDFWriter(),
                               out_path=str(tmp_path / "spec.nc"))
    vals = grp.write(q, aux, 0.0)
    assert vals["spectrum_1d"].shape == (len(lons) // 2, len(rads))
    assert np.all(np.isfinite(vals["spectrum_1d"]))
    # gaussian latitudes -> spherical-harmonic spectrum is emitted too
    assert "spectrum_2d" in vals
    assert vals["spectrum_2d"].shape[2] == len(rads)
    assert np.all(np.isfinite(vals["spectrum_2d"]))

    # dumps: state (raw), aux (raw), tendencies (interpolated)
    ds = DumpGroup(dg, "state", writer=NetCDFWriter(),
                   out_path=str(tmp_path / "state.nc"))
    vs = ds.write(q, aux, 0.0)
    assert "rho" in vs and vs["rho"].shape == (cfg.grid.nelem, cfg.grid.Np)
    da = DumpGroup(dg, "aux")
    va = da.collect(q, aux)
    assert any(k.startswith("ref_state") for k in va)
    dt_ = DumpGroup(dg, "tendencies", interpolator=itp)
    vt = dt_.collect(q, aux)
    assert vt["tend_rho"].shape == (len(lats), len(lons), len(rads))
    assert all(np.all(np.isfinite(v)) for v in vt.values())
    import h5py
    with h5py.File(str(tmp_path / "state.nc"), "r") as f:
        assert f["rho"].shape == (1, cfg.grid.nelem, cfg.grid.Np)


def test_spherical_harmonic_spectrum():
    """Legendre-table orthonormality + exact mode recovery + Parseval
    (reference power_spectrum_gcm.jl:78 power_spectrum_2d and
    spherical_helper.jl compute_legendre!/compute_gaussian!)."""
    from climatemachine_tpu.common.spectra import (
        gaussian_latitudes, legendre_table, power_spectrum_2d,
        spherical_transform)

    nlat, nlon, M, N = 32, 64, 10, 15
    sinlat, w = gaussian_latitudes(nlat)
    P = legendre_table(M, N, sinlat)

    # quadrature orthonormality per m: sum_j w P[m,n,j] P[m,n',j] = I
    for m in (0, 3, 7):
        G = np.einsum("nj,kj->nk", P[m] * w[None, :], P[m])
        sel = np.arange(m, N + 1)
        assert np.allclose(G[np.ix_(sel, sel)], np.eye(len(sel)),
                           atol=1e-12)

    # a single (m0, n0) mode lands in exactly one coefficient
    m0, n0 = 4, 9
    lon = 2 * np.pi * np.arange(nlon) / nlon
    f = (np.cos(m0 * lon)[:, None] * P[m0, n0][None, :])
    coeff = spherical_transform(f, P, w)
    mag = np.abs(coeff)
    assert mag[m0, n0] > 0.49                     # cos → half in +m
    mask = np.ones_like(mag, bool)
    mask[m0, n0] = False
    assert np.max(mag[mask]) < 1e-12

    # Parseval: spectrum sums to the area-weighted mean square
    rng = np.random.default_rng(0)
    coef_in = rng.standard_normal((M + 1, N + 1))
    for m in range(M + 1):
        coef_in[m, :m] = 0.0
    g = np.zeros((nlon, nlat))
    for m in range(M + 1):
        g += np.cos(m * lon)[:, None] * (coef_in[m] @ P[m])
    spec = power_spectrum_2d(g, P, w)
    ms = np.sum(w[None, :] * g ** 2) / nlon
    assert np.isclose(np.sum(spec), ms, rtol=1e-10)
